"""Shared builders for the hierarchical test files.

test_hierarchy.py was the full suite's critical path (76 min of its
78-min wall under -n 8 --dist loadfile); the three heaviest tests live
in test_hierarchy_heavy.py so xdist can balance the two files across
workers.  Keep workload builders here so the split files cannot drift.
"""
import numpy as np

from psfmc_tpu import distributions as D
from psfmc_tpu.models.components import Configuration, Sky
from psfmc_tpu.models.multicomponent import MultiComponentModel


def _sky_model(hw, noise):
    psf = np.zeros((8, 8))
    psf[4, 4] = 1.0
    return MultiComponentModel(
        [
            Configuration(
                obs_file=np.zeros((hw, hw)),
                obsivm_file=np.full((hw, hw), 1.0 / noise**2),
                psf_files=psf,
                psfivm_files=np.full_like(psf, 1e12),
                mag_zeropoint=25.0,
            ),
            Sky(adu=D.Uniform(loc=-2.0, scale=6.0)),
        ]
    )


def _sky_stacks(rng, k, hw, noise, mu, sig):
    adus = mu + sig * rng.randn(k)
    obs = adus[:, None, None] + rng.randn(k, hw, hw) * noise
    ivm = np.full((k, hw, hw), 1.0 / noise**2)
    return obs, ivm, adus

