"""Flux-conserving resampling between the fine model grid and the data grid.

The reference's core invariant is that the model "never interpolates"
(reference README.md:31): information moves between the subsampled model
grid and the data grid only through exact sum-pooling and its transpose.
"""

import jax.numpy as jnp


def downsample(fine, s):
    """Flux-conserving downsample of a fine-grid image by integer factor ``s``.

    Sums (not averages) over ``s x s`` blocks so total flux is preserved.

    Args:
        fine: array ``(..., m, m)`` with ``m`` divisible by ``s``.
        s: int, subsampling factor (static).

    Returns:
        array ``(..., m // s, m // s)``.
    """
    if s == 1:
        return fine
    *lead, my, mx = fine.shape
    ny, nx = my // s, mx // s
    reshaped = fine.reshape(*lead, ny, s, nx, s)
    return reshaped.sum(axis=(-3, -1))


def upsample_transpose(coarse, s):
    """Transpose of :func:`downsample` — nearest-neighbour block repeat.

    ``<downsample(F), d> == <F, upsample_transpose(d)>`` for all F, d.
    Used to push data-grid quantities (noise realizations, gradients) onto
    the fine grid.

    Args:
        coarse: array ``(..., n, n)``.
        s: int, subsampling factor (static).

    Returns:
        array ``(..., n * s, n * s)``.
    """
    if s == 1:
        return coarse
    out = jnp.repeat(coarse, s, axis=-2)
    return jnp.repeat(out, s, axis=-1)


def pixel_grid_coords(m, s, dtype=jnp.float32):
    """Center-origin coordinates of an ``(m, m)`` grid, in DATA pixel units.

    Args:
        m: int, grid side length (fine grid side if ``s > 1``).
        s: int, subsampling factor; ``s = 1`` gives data-grid coordinates.

    Returns:
        ``(x, y)`` arrays of shape ``(m, m)``: ``x`` varies along columns,
        ``y`` along rows; origin at the grid center, units of data pixels.
    """
    c = (m - 1) / 2.0
    idx = (jnp.arange(m, dtype=dtype) - c) / s
    y, x = jnp.meshgrid(idx, idx, indexing="ij")
    return x, y
