"""Example psfmc_tpu model file: quasar point source + host galaxy.

Run ``python make_example_data.py`` first to generate the FITS inputs.
Components and distributions are auto-injected by the model parser; the
explicit imports below are optional but recommended.  Model files
written for the original psfMC (``from psfMC.ModelComponents import
...``) also run unmodified.
"""
from numpy import array

from psfmc_tpu.models.components import Configuration, PointSource, Sersic, Sky
from psfmc_tpu.distributions import Normal, Uniform, WeibullMinimum

total_mag = 20.7
center = array((64.5, 64.5))
max_shift = array((8, 8))

# The Configuration component is mandatory: it defines the input images
Configuration(
    obs_file="sci_example.fits",
    obsivm_file="ivm_example.fits",
    psf_files="psf_example.fits",
    psfivm_files="ivm_psf_example.fits",
    mask_file="mask_example.reg",
    mag_zeropoint=25.9463,
)

# Treat the sky as an unknown component if the subtraction is uncertain
Sky(adu=Normal(loc=0, scale=0.01))

# The quasar point source
PointSource(
    xy=Uniform(loc=center - max_shift, scale=2 * max_shift),
    mag=Uniform(loc=total_mag - 0.5, scale=2.0),
)

# The host galaxy under the point source
Sersic(
    xy=Uniform(loc=center - max_shift, scale=2 * max_shift),
    mag=Uniform(loc=total_mag, scale=27.5 - total_mag),
    reff=Uniform(loc=2.0, scale=10.0),
    reff_b=Uniform(loc=2.0, scale=10.0),
    index=WeibullMinimum(c=1.5, scale=4),
    angle=Uniform(loc=0, scale=180),
    angle_degrees=True,
)
