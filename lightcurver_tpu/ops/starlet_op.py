"""Differentiable starlet op with selectable backend (XLA / Pallas).

Measured on a TPU v5e chip (tools/bench_starlet_tpu.py, round 2, with a
hoisting-proof timing loop — the first naive measurement let XLA hoist
the loop-invariant body and exaggerated the gap): standalone the Pallas
cascade (starlet_pallas.py) is 13.8x faster at m=32 (156 us vs 2.15 ms;
the XLA version is dispatch-bound at small sizes) and 1.23x at m=128
(191 vs 234 us).  END-TO-END the production fits are unchanged or
slightly slower (full 2000-iteration ROI fit: 1.055 s XLA vs 1.111 s
Pallas; 16-frame PSF batch 1.00x), so auto_select_backends() leaves the
backend at 'xla'.  The kernel is kept (and parity-tested on-chip to
1e-4) for workloads dominated by many SMALL standalone transforms.

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
