"""Numerical core: JAX/TPU forward models, losses and optimizers.

This package replaces the reference's external STARRED dependency
(import sites: reference processes/psf_modelling.py:7,
processes/star_photometry.py:7-12, processes/roi_modelling.py:19-23).
"""

from .conventions import fwhm_to_sigma, sigma_to_fwhm, TARGET_FWHM_FINE_PIX
from .grids import downsample, upsample_transpose, pixel_grid_coords
from .profiles import moffat_fine_grid, gaussian_r_kernel
from .starlet import starlet_transform, starlet_reconstruct, n_starlet_scales
