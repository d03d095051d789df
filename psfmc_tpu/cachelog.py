"""Persistent-compile-cache key recording (prune-policy support).

The repo commits its jax persistent compilation cache (``.jaxcache``)
so driver benches and dryruns hit warm compiles across rounds.  That
cache is machine-specific binary content and grows monotonically as
programs change shape — so it carries an explicit prune policy: only
entries touched by the canonical run set (``dryrun_multichip`` +
``bench.py`` + ``tools/tpu_smoke.py``) are kept.

This module implements the recording half.  When ``PSFMC_CACHE_MANIFEST``
names a file, every persistent-cache key this process touches (hit or
miss — a miss writes the entry, so it is live too) is appended there,
one key per line.  ``tools/prune_jaxcache.py`` consumes the manifests
and deletes unlisted ``<key>-cache`` files.

Keys are captured from the ``jax._src.lru_cache`` DEBUG log ("Cache
hit/miss for key: '<key>'"); the on-disk filename is ``<key>-cache``.
Propagation is cut on that one child logger so recording never spams
stderr or perturbs bench.py's compiler-log parsing (which listens to
``jax._src.compiler`` messages via the parent logger).
"""
from __future__ import annotations

import logging
import os
import re

__all__ = ["maybe_record_cache_keys"]

_KEY_RE = re.compile(r"Cache (?:hit|miss) for key: '([^']+)'")
_installed = False


class _ManifestHandler(logging.Handler):
    def __init__(self, path):
        super().__init__(logging.DEBUG)
        self._path = path

    def emit(self, record):
        try:
            m = _KEY_RE.search(record.getMessage())
        except Exception:
            return
        if m:
            try:
                with open(self._path, "a") as f:
                    f.write(m.group(1) + "\n")
            except OSError:
                pass


def maybe_record_cache_keys():
    """Install the cache-key recorder if PSFMC_CACHE_MANIFEST is set.

    Idempotent; call before the first jax compilation.  No-op (and
    free) when the environment variable is absent.
    """
    global _installed
    path = os.environ.get("PSFMC_CACHE_MANIFEST")
    if not path or _installed:
        return
    _installed = True
    logger = logging.getLogger("jax._src.lru_cache")
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    logger.addHandler(_ManifestHandler(path))
