"""Test harness config: force CPU backend with an 8-device virtual mesh.

Must run before any jax backend initialization.  Note: on this image a
sitecustomize pre-registers a TPU PJRT plugin and shell-level
JAX_PLATFORMS is overridden, so the platform is pinned via jax.config.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Parity tests compare against scipy in double precision; the device
# compute path pins float32 explicitly regardless of this flag.
jax.config.update("jax_enable_x64", True)

# Persistent compile cache for the suite (gitignored — unlike the
# committed bench/dryrun .jaxcache, test programs churn with every
# code change, so this is a local working-set cache, not an artifact).
# The expensive files (hierarchy/sharding NUTS programs compile for
# minutes) hit it on repeat runs; keys hash the optimized HLO, so a
# code change simply misses and recompiles.
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jaxcache_tests"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="session")
def reference_dir():
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference data not available")
    return REFERENCE_DIR


@pytest.fixture()
def rng():
    return np.random.RandomState(1234)


@pytest.fixture(scope="session")
def gaussian_psf():
    yy, xx = np.mgrid[0:32, 0:32].astype(float)
    psf = np.exp(-((xx - 16) ** 2 + (yy - 16) ** 2) / (2 * 1.5**2))
    return psf / psf.sum()


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "quick: fast tier touching every module (< 10 min at -n 8)",
    )
    config.addinivalue_line(
        "markers",
        "slow: excluded from the quick tier (tests/_slow_tests.py)",
    )


def pytest_collection_modifyitems(config, items):
    """Tier markers from the frozen slow list (round-3 verdict item 3).

    Every test is ``quick`` unless its node id (with or without its
    parametrize brackets) appears in ``tests/_slow_tests.py`` — new
    tests land in the quick tier by default, keeping its coverage
    complete; promote them to the slow list when they outgrow ~20 s.
    """
    from _slow_tests import SLOW_TESTS

    for item in items:
        if item.get_closest_marker("slow") is not None:
            continue  # inline @pytest.mark.slow wins
        nid = item.nodeid
        bare = nid.split("[", 1)[0]
        if nid in SLOW_TESTS or bare in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.quick)
