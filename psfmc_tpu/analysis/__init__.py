"""Posterior analysis: statistics, image products, plotting."""
from .images import default_filetypes, save_posterior_images
from .model_comparison import (
    ELPDResult,
    LOOPITResult,
    compare,
    loo_pit,
    pointwise_loglike,
    psis_loo,
    waic,
)
from .sbc import SBCResult, run_sbc, sbc_ranks_from_chains
from .sensitivity import (
    SensitivityResult,
    cjs_distance,
    power_scale_sensitivity,
)
from .statistics import (
    check_convergence_autocorr,
    check_convergence_psrf,
    num_effective_samples,
    potential_scale_reduction,
    summary,
    rhat_rank,
    ess_bulk,
    ess_tail,
    convergence_summary,
    to_inference_dict,
)

__all__ = [
    "default_filetypes",
    "save_posterior_images",
    "ELPDResult",
    "LOOPITResult",
    "compare",
    "loo_pit",
    "pointwise_loglike",
    "psis_loo",
    "waic",
    "SBCResult",
    "run_sbc",
    "sbc_ranks_from_chains",
    "SensitivityResult",
    "cjs_distance",
    "power_scale_sensitivity",
    "check_convergence_autocorr",
    "check_convergence_psrf",
    "num_effective_samples",
    "potential_scale_reduction",
    "summary",
    "rhat_rank",
    "ess_bulk",
    "ess_tail",
    "convergence_summary",
    "to_inference_dict",
]

try:  # matplotlib is optional at import time
    from .plotting import (
        corner_plot,
        plot_autocorr,
        plot_criticism,
        plot_hist,
        plot_profile,
        plot_trace,
        radial_profile,
    )

    __all__ += [
        "corner_plot",
        "plot_autocorr",
        "plot_criticism",
        "plot_hist",
        "plot_profile",
        "plot_trace",
        "radial_profile",
    ]
except ImportError:  # pragma: no cover
    pass
