"""Analytic profiles evaluated on the fine model grid.

All sub-pixel positioning in the numerical core happens here (analytically)
or through Fourier phase ramps (core/convolution.py) — images are never
interpolated.
"""

import jax.numpy as jnp

from .conventions import fwhm_to_sigma, TARGET_FWHM_FINE_PIX
from .grids import pixel_grid_coords


def gaussian_r_kernel(m, s, x0=0.0, y0=0.0, dtype=jnp.float32):
    """The target-resolution kernel ``r``: unit-integral isotropic Gaussian.

    FWHM is ``TARGET_FWHM_FINE_PIX`` fine pixels.  Point sources in the
    deconvolved image are ``r`` profiles (MCS-style two-channel
    deconvolution, as in the STARRED core the reference delegates to —
    reference processes/roi_modelling.py:207-211 model semantics).

    Args:
        m: fine-grid side length.
        s: subsampling factor.
        x0, y0: center in DATA-pixel units, origin at the grid center.

    Returns:
        ``(m, m)`` array summing to ~1 (analytic normalization; truncation
        error < 1e-6 for positions away from the border).
    """
    sigma_data = fwhm_to_sigma(TARGET_FWHM_FINE_PIX) / s  # in data pixels
    x, y = pixel_grid_coords(m, s, dtype=dtype)
    r2 = (x - x0) ** 2 + (y - y0) ** 2
    # each fine pixel has area (1/s)^2 in data-pixel units
    norm = 1.0 / (2.0 * jnp.pi * sigma_data**2 * s**2)
    return norm * jnp.exp(-0.5 * r2 / sigma_data**2)


def moffat_fine_grid(m, s, fwhm_x, fwhm_y, beta, x0=0.0, y0=0.0, phi=0.0,
                     dtype=jnp.float32):
    """Elliptical Moffat profile with unit integral on the fine grid.

    ``M(x, y) ∝ (1 + u)^(-beta)`` with
    ``u = (x'/alpha_x)^2 + (y'/alpha_y)^2`` and ``(x', y')`` the coordinates
    rotated by position angle ``phi``.  ``fwhm_* = 2 * alpha_* *
    sqrt(2^(1/beta) - 1)`` relates the FWHM (in DATA pixels, matching the
    reference's ``fwhm * pixel_scale -> arcsec`` usage at
    processes/psf_modelling.py:178) to the core width.

    Returns:
        ``(m, m)`` array with analytic integral 1 (the analytic
        normalization ``(beta - 1) / (pi * alpha_x * alpha_y)`` is exact
        for the infinite plane; for beta > 1.2 and stamps a few FWHM wide
        the truncation is at the percent level and is absorbed by the
        fitted amplitudes).
    """
    x, y = pixel_grid_coords(m, s, dtype=dtype)
    xr = x - x0
    yr = y - y0
    cphi = jnp.cos(phi)
    sphi = jnp.sin(phi)
    xp = cphi * xr + sphi * yr
    yp = -sphi * xr + cphi * yr
    root = jnp.sqrt(2.0 ** (1.0 / beta) - 1.0)
    alpha_x = fwhm_x / (2.0 * root)
    alpha_y = fwhm_y / (2.0 * root)
    u = (xp / alpha_x) ** 2 + (yp / alpha_y) ** 2
    norm = (beta - 1.0) / (jnp.pi * alpha_x * alpha_y * s**2)
    return norm * (1.0 + u) ** (-beta)
