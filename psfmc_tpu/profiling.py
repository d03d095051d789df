"""Tracing and per-phase wall-clock instrumentation.

The reference's only observability is percent-progress prints (reference
utils.py:167-171); here every fitting phase records wall-clock (visible
on the driver's stdout and queryable afterwards), and full device traces
can be captured with ``jax.profiler`` by setting ``PSFMC_TRACE_DIR`` or
using :func:`trace` explicitly — viewable in TensorBoard/Perfetto.
"""
from __future__ import annotations

import contextlib
import os
import time
from collections import OrderedDict

__all__ = ["PhaseTimer", "trace", "device_sync"]


def device_sync(x):
    """Force completion of a jax computation via a real d2h transfer.

    ``jax.block_until_ready`` is unreliable on some PJRT transports
    (e.g. tunneled backends); copying one element back is definitive.
    """
    import numpy as np

    import jax
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(x)
    if leaves:
        np.asarray(jnp.ravel(leaves[0])[0])
    return x


class PhaseTimer:
    """Accumulates named phase durations; prints one line per phase."""

    def __init__(self, verbose=True):
        self.phases = OrderedDict()
        self.verbose = verbose

    @contextlib.contextmanager
    def phase(self, name, sync_result=None):
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self.phases[name] = self.phases.get(name, 0.0) + dt
            if self.verbose:
                print(f"[psfmc] {name}: {dt:.2f}s")

    def summary(self):
        return dict(self.phases)


@contextlib.contextmanager
def trace(label="psfmc", trace_dir=None):
    """Capture a jax.profiler device trace when a trace dir is configured.

    Set ``PSFMC_TRACE_DIR=/path`` (or pass ``trace_dir``) to enable; the
    trace is written under ``<dir>/<label>`` for TensorBoard's profile
    plugin.  No-op when unset.
    """
    trace_dir = trace_dir or os.environ.get("PSFMC_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    path = os.path.join(trace_dir, label)
    with jax.profiler.trace(path):
        yield


# ---------------------------------------------------------------------------
# Analytic FLOP model (for MFU reporting in bench.py)
# ---------------------------------------------------------------------------

# TPU v5e (v5 lite) per-chip peak: 197 TFLOP/s bf16 matmul.  The rdft
# convolution runs at Precision.HIGH = bf16x3 (3 passes), so the
# f32-accurate matmul peak is a third of that.
TPU_V5E_PEAK_BF16_TFLOPS = 197.0


def conv_rdft_flops(shape):
    """Matmul FLOPs of one half-spectrum rdft convolution (ops/fourier.py).

    12 half-width real matmuls: 4 of (H,W)x(W,W2) / (H,W2)x(W2,W) along
    the w axis + 8 of (H,H)x(H,W2) along the h axis (2 FLOPs per MAC).
    """
    h, w = shape
    w2 = w // 2 + 1
    return 4 * (2 * h * w * w2) + 8 * (2 * h * h * w2)


def conv_fft_flops(shape):
    """Approximate FLOPs of one FFT convolution (rfft2 + irfft2 + mul)."""
    h, w = shape
    n = h * w
    import math

    # split-radix real-FFT estimate: ~2.5 N log2 N per transform
    return int(2 * 2.5 * n * math.log2(n) + 6 * n)


def lnpost_flop_model(shape, conv_mode="dft", n_render_components=3,
                      render_flops_per_px=60):
    """Per-posterior-evaluation FLOP estimate, split MXU vs VPU.

    One evaluation = component renders (elementwise VPU work:
    exp/log/polynomial per pixel per Sersic) + TWO convolutions (model
    with PSF, model^2 with PSF-variance — posterior.py) + the masked
    Gaussian likelihood reduction (~10 FLOPs/px).

    Returns ``{"mxu": ..., "vpu": ...}`` FLOPs.  The render constant is
    a calibrated estimate (~60 FLOPs/px/component incl. the software
    exp/log of ops/fastmath.py); it bounds VPU work to ~3% of the MXU
    count, consistent with the measured stage budget (CLAUDE.md: render
    0.32 ms vs convs 0.24 ms — the render is VPU-bound, convs
    MXU-bound).
    """
    h, w = shape
    conv = conv_rdft_flops(shape) if conv_mode == "dft" else conv_fft_flops(shape)
    mxu = 2 * conv
    vpu = n_render_components * render_flops_per_px * h * w + 10 * h * w
    return {"mxu": mxu, "vpu": vpu}
