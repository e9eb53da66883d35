"""Differentiable starlet op with selectable backend (XLA / Pallas).

Measured on a TPU v5e chip (tools/bench_starlet_tpu.py, round 2): the
Pallas cascade (starlet_pallas.py) is ~14x faster than the XLA
shift-add version as a STANDALONE transform (155 us vs 2.2 ms at
m=128), but END-TO-END the production losses are unchanged (ROI
300-iteration fit: 0.98x; 16-frame PSF batch: 0.99x) — inside the fused
loss+grad programs the starlet is not the bottleneck.  That is why
auto_select_backends() leaves the backend at 'xla': the kernel is kept
(and parity-tested) for workloads that call the transform directly,
e.g. noise propagation at high sample counts.

pallas_call has no automatic AD; the transform is LINEAR, so a
custom_vjp delegates the backward pass to the vjp of the jnp reference
implementation — the exact adjoint, including the mirror-boundary
handling.
"""

import jax

from . import get_backend
from ..core.starlet import starlet_transform as _starlet_jnp
from ..core.starlet import n_starlet_scales
from .starlet_pallas import starlet_transform_pallas


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _starlet_pallas_ad(img, n_scales):
    return starlet_transform_pallas(img, n_scales=n_scales)


def _fwd(img, n_scales):
    return _starlet_pallas_ad(img, n_scales), None


def _bwd(n_scales, _residuals, g):
    # primal shape/dtype are recoverable from the cotangent stack
    shape = g.shape[-2:]
    transpose = jax.linear_transpose(
        lambda x: _starlet_jnp(x, n_scales=n_scales),
        jax.ShapeDtypeStruct(shape, g.dtype))
    return (transpose(g)[0],)


_starlet_pallas_ad.defvjp(_fwd, _bwd)


def starlet_transform(img, n_scales=None):
    """Backend-dispatching starlet decomposition (see ops.set_backend)."""
    if n_scales is None:
        n_scales = n_starlet_scales(img.shape[-1])
    if get_backend() == "pallas":
        return _starlet_pallas_ad(img, n_scales)
    return _starlet_jnp(img, n_scales=n_scales)
