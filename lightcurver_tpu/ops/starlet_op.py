"""Differentiable starlet op with selectable backend (XLA / Pallas).

DECISION (final, round 4): the XLA backend wins and stays the
production default.  Measured on a TPU v5e chip 2026-08-19 with the
DCE-fixed full-sum timing loop (bench.py run_starlet_micro, 200-rep
compiled loop): standalone at m=128 XLA 142.3 us vs Pallas 188.4 us —
the earlier "Pallas 1.23x faster at m=128" (round 2) came from a
timing loop that kept only one output element live, so XLA dead-code
-eliminated unused scales on ONE side of the A/B.  With all scales
live, XLA's fused shifted-slice cascade wins at the production shape
both standalone AND end-to-end (full 2000-iteration ROI fit: 1.055 s
XLA vs 1.111 s Pallas; 16-frame PSF batch 1.00x), so
auto_select_backends() keeps 'xla' unconditionally.  The kernel is
retained as an on-chip parity-tested (1e-4) reference implementation
and a worked Pallas example — not as a selectable fast path.

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


def starlet_transform(img, n_scales=None, backend=None):
    """Backend-dispatching starlet decomposition.

    ``backend`` None dispatches on the ops global (ops.set_backend); an
    explicit 'pallas'/'xla' wins over the global — a caller constructed
    with a specific backend key (core/deconv/loss._build_loss_fn) must
    run that implementation, not silently fall through to whatever the
    global happens to be.
    """
    if n_scales is None:
        n_scales = n_starlet_scales(img.shape[-1])
    if (backend or get_backend()) == "pallas":
        return _starlet_pallas_ad(img, n_scales)
    return _starlet_jnp(img, n_scales=n_scales)
