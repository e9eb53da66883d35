"""Isotropic undecimated wavelet (starlet / a-trous) transform in JAX.

First-generation starlet with the B3-spline kernel [1, 4, 6, 4, 1] / 16
and mirror boundary handling.  Used for the sparsity regularization of the
pixelated background channel, matching the reference's 'l1_starlet'
regularization (reference processes/star_photometry.py:100,
processes/roi_modelling.py:314 via STARRED's Loss).

The inverse is the plain sum over scales (first-generation starlet),
which is exact by construction: detail_j = c_j - c_{j+1} telescopes.

TPU implementation note: the separable a-trous smoothing is expressed as
five shifted-slice adds per axis (pad + slice + weighted sum) instead of
``conv_general_dilated`` — single-channel tiny-kernel convolutions map
terribly onto the TPU convolution path (measured: dominated the joint
deconvolution iteration AND inflated XLA compile times to minutes), while
shifted adds are pure VPU elementwise work that fuses.
"""

import math

import jax.numpy as jnp

_W = (1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0)


def n_starlet_scales(size):
    """Default number of detail scales for an image of side ``size``."""
    return int(math.log2(size))


def _smooth_axis(x, dilation, axis):
    """1-D a-trous B3 smoothing along ``axis`` (mirror boundary)."""
    pad = 2 * dilation
    pad_widths = [(0, 0)] * x.ndim
    pad_widths[axis] = (pad, pad)
    xp = jnp.pad(x, pad_widths, mode="symmetric")
    n = x.shape[axis]

    out = _W[0] * _slice_axis(xp, 0, n, axis)
    for k in range(1, 5):
        out = out + _W[k] * _slice_axis(xp, k * dilation, n, axis)
    return out


def _slice_axis(x, start, length, axis):
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(start, start + length)
    return x[tuple(idx)]


def _smooth_once(img, dilation):
    """Separable a-trous smoothing at a given dilation (mirror boundary)."""
    out = _smooth_axis(img, dilation, axis=-1)
    return _smooth_axis(out, dilation, axis=-2)


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
