"""Grid and coordinate conventions shared by the whole numerical core.

Conventions (chosen once, used everywhere):

- A data stamp is an ``(n, n)`` image; the fine (model) grid is ``(m, m)``
  with ``m = n * s`` where ``s`` is the integer subsampling factor.
- Coordinates are expressed in units of DATA pixels with the origin at the
  image center: data pixel ``(row i, col j)`` has coordinates
  ``x = j - (n - 1) / 2``, ``y = i - (n - 1) / 2`` (x along columns,
  y along rows).  This matches the reference convention "starred has
  (0,0) = center of image" (reference processes/roi_modelling.py:207-211).
- Fine-grid pixel ``(I, J)`` has data-pixel coordinates
  ``x = (J - (m - 1) / 2) / s``, ``y = (I - (m - 1) / 2) / s``.
  With this convention the centers of the two grids coincide exactly and
  the flux-conserving sum-pool downsampler maps fine pixels
  ``[s*i, s*i + s)`` onto data pixel ``i``.
- The "target resolution" kernel ``r`` is an isotropic Gaussian of
  FWHM = ``TARGET_FWHM_FINE_PIX`` fine pixels with unit integral.  The
  deconvolved (high-resolution) image represents point sources as ``r``
  profiles, never as deltas, so it can be sampled without aliasing.
"""

import math

# FWHM of the target-resolution Gaussian r, in FINE pixels.
TARGET_FWHM_FINE_PIX = 2.0

# FWHM = 2*sqrt(2*ln 2) * sigma
_FWHM_OVER_SIGMA = 2.0 * math.sqrt(2.0 * math.log(2.0))


def fwhm_to_sigma(fwhm):
    """Convert a Gaussian FWHM to its standard deviation (same units)."""
    return fwhm / _FWHM_OVER_SIGMA


def sigma_to_fwhm(sigma):
    """Convert a Gaussian standard deviation to its FWHM (same units)."""
    return sigma * _FWHM_OVER_SIGMA
