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
