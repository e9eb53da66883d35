"""Spatially-varying PSF: low-order polynomial field distortion.

The narrow PSF fitted from reference stars can vary across the field.
Following the reference's contract (STARRED ``apply_distortion`` called at
processes/star_photometry.py:303 and processes/roi_file_preparation.py:179,
with field positions rescaled to [-1, 1]^2 by
utilities/image_coordinates.py:4-25), the variation is parameterized by
three scalar fields — dilation_x, dilation_y, shear — each a polynomial in
the rescaled field coordinates ``(u, v)`` with basis ``[u, v, u^2, uv,
v^2]`` (no constant term: the PSF at the field center is the reference
PSF itself).

Applying the distortion warps the narrow PSF by the affine map
``A = [[1 + dil_x, shear], [shear, 1 + dil_y]]`` about its center
(bilinear resampling; this is a host-side model-preparation step, not part
of the never-interpolate data path).
"""

import jax
import jax.numpy as jnp
import numpy as np

DISTORTION_BASIS_SIZE = 5  # [u, v, u^2, u*v, v^2]


def zero_distortion_kwargs():
    z = jnp.zeros(DISTORTION_BASIS_SIZE, dtype=jnp.float32)
    return {"dilation_x": z, "dilation_y": z, "shear": z}


def _basis(u, v):
    return jnp.stack([u, v, u * u, u * v, v * v])


def distortion_fields_at(kwargs_distortion, uv):
    """Evaluate (dil_x, dil_y, shear) at field coordinates uv (..., 2)."""
    u = uv[..., 0]
    v = uv[..., 1]
    b = _basis(u, v)  # (5, ...)
    dx = jnp.tensordot(jnp.asarray(kwargs_distortion["dilation_x"]), b, axes=1)
    dy = jnp.tensordot(jnp.asarray(kwargs_distortion["dilation_y"]), b, axes=1)
    sh = jnp.tensordot(jnp.asarray(kwargs_distortion["shear"]), b, axes=1)
    return dx, dy, sh


def warp_psf(psf, dil_x, dil_y, shear):
    """Affine-warp a single (m, m) PSF about its center (flux preserved)."""
    m = psf.shape[-1]
    c = (m - 1) / 2.0
    # inverse of A = [[1+dx, sh], [sh, 1+dy]]
    det = (1.0 + dil_x) * (1.0 + dil_y) - shear * shear
    inv00 = (1.0 + dil_y) / det
    inv01 = -shear / det
    inv10 = -shear / det
    inv11 = (1.0 + dil_x) / det
    rows = jnp.arange(m, dtype=jnp.float32) - c
    yy, xx = jnp.meshgrid(rows, rows, indexing="ij")
    # sample source coords = A^-1 (x - c) + c ; x along columns
    src_x = inv00 * xx + inv01 * yy + c
    src_y = inv10 * xx + inv11 * yy + c
    out = jax.scipy.ndimage.map_coordinates(
        psf, [src_y, src_x], order=1, mode="constant", cval=0.0)
    return out / det  # Jacobian: preserve total flux


def apply_distortion(narrow_psf, kwargs_distortion, star_xy_coordinates):
    """Evaluate the spatially-varying narrow PSF at field position(s).

    Args:
        narrow_psf: (m, m) reference narrow PSF (field center).
        kwargs_distortion: dict of polynomial coefficient arrays.
        star_xy_coordinates: (2,) or (N, 2) rescaled [-1, 1] coords.

    Returns:
        (m, m) or (N, m, m) warped PSF(s).
    """
    narrow_psf = jnp.asarray(narrow_psf, dtype=jnp.float32)
    uv = jnp.asarray(star_xy_coordinates, dtype=jnp.float32)
    single = uv.ndim == 1
    uv = jnp.atleast_2d(uv)
    dx, dy, sh = distortion_fields_at(kwargs_distortion, uv)
    out = jax.vmap(lambda a, b, c: warp_psf(narrow_psf, a, b, c))(dx, dy, sh)
    if single:
        return np.asarray(out[0])
    return np.asarray(out)
