"""TPU-native MCMC sampling: jitted ensemble sampler + autocorr analysis."""
from .autocorr import AutocorrError, function, integrated_time
from .ensemble import EnsembleSampler, EnsembleState, run_stretch_move
from .tempered import (
    PTEnsembleSampler,
    default_beta_ladder,
    evidence_beta_ladder,
)
from .ais import AISResult, ais_beta_schedule, ais_evidence

__all__ = [
    "AutocorrError",
    "function",
    "integrated_time",
    "EnsembleSampler",
    "EnsembleState",
    "run_stretch_move",
    "PTEnsembleSampler",
    "default_beta_ladder",
    "evidence_beta_ladder",
    "AISResult",
    "ais_beta_schedule",
    "ais_evidence",
]
