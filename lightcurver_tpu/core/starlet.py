"""Isotropic undecimated wavelet (starlet / a-trous) transform in JAX.

First-generation starlet with the B3-spline kernel [1, 4, 6, 4, 1] / 16 and
mirror boundary handling.  Used for the sparsity regularization of the
pixelated background channel, matching the reference's 'l1_starlet'
regularization (reference processes/star_photometry.py:100,
processes/roi_modelling.py:314 via STARRED's Loss).

The inverse is the plain sum over scales (first-generation starlet),
which is exact by construction: detail_j = c_j - c_{j+1} telescopes.
"""

import math

import jax
import jax.numpy as jnp

_B3 = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def n_starlet_scales(size):
    """Default number of detail scales for an image of side ``size``."""
    return int(math.log2(size))


def _smooth_axis_last(x2d, dilation):
    """1-D a-trous B3 smoothing along the last axis (mirror boundary)."""
    pad = 2 * dilation
    xp = jnp.pad(x2d, ((0, 0), (pad, pad)), mode="symmetric")
    lhs = xp[None, None, :, :]  # NCHW: H = rows, W = padded cols
    kernel = _B3.astype(x2d.dtype).reshape(1, 1, 1, 5)
    out = jax.lax.conv_general_dilated(
        lhs, kernel, window_strides=(1, 1), padding="VALID",
        rhs_dilation=(1, dilation),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,  # photometric accuracy: never bf16 here
    )
    return out[0, 0]


def _smooth_once(img, dilation):
    """Separable a-trous smoothing at a given dilation (mirror boundary)."""
    out = _smooth_axis_last(img, dilation)
    out = _smooth_axis_last(out.T, dilation).T
    return out


def starlet_transform(img, n_scales=None):
    """Starlet decomposition of a 2-D image.

    Args:
        img: ``(m, m)`` array.
        n_scales: number of DETAIL scales (static int); default
            ``n_starlet_scales(m)``.

    Returns:
        ``(n_scales + 1, m, m)``: detail coefficients finest-first, the last
        slice is the coarse (smooth) residual.
    """
    if n_scales is None:
        n_scales = n_starlet_scales(img.shape[-1])
    coeffs = []
    current = img
    for j in range(n_scales):
        smoothed = _smooth_once(current, 2**j)
        coeffs.append(current - smoothed)
        current = smoothed
    coeffs.append(current)
    return jnp.stack(coeffs)


def starlet_reconstruct(coeffs):
    """Exact inverse of :func:`starlet_transform` (sum over scales)."""
    return coeffs.sum(axis=0)
