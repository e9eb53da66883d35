"""Pallas TPU kernel: the full starlet (a-trous) cascade in VMEM.

The XLA starlet (core/starlet.py) materializes every intermediate scale
in HBM; this kernel keeps the whole cascade resident in VMEM and writes
only the coefficient stack — one HBM read of the image, one write per
coefficient plane.

Boundary handling: the B3 filter is symmetric, and symmetric ('reflect
including edge') extension commutes with symmetric filters, so the image
is symmetric-padded ONCE by the total cascade support and the per-level
mirror padding of the reference implementation is reproduced exactly on
the cropped interior.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.starlet import n_starlet_scales

_W = (1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0)


def _total_margin(n_scales):
    # scale j smooths with dilation 2^j and support +-2*2^j
    return 2 * (2**n_scales - 1)


def _starlet_kernel(pad_ref, out_ref, *, n_scales, m, margin):
    """Cascade on the padded buffer; details cropped to (m, m)."""
    current = pad_ref[:]
    size = current.shape[0]

    def smooth(x, d):
        # shifted adds along both axes, as CIRCULAR rolls: the wrapped
        # lanes are garbage but stay strictly outside the remaining valid
        # margin at every level, and the final crop removes them
        def axis_pass(v, axis):
            out = _W[2] * v
            for k, w in ((1, _W[1]), (2, _W[0])):
                shift = k * d
                out = out + w * pltpu.roll(v, shift, axis)
                out = out + w * pltpu.roll(v, size - shift, axis)
            return out

        return axis_pass(axis_pass(x, 0), 1)

    for j in range(n_scales):
        smoothed = smooth(current, 2**j)
        detail = current - smoothed
        out_ref[j, :, :] = detail[margin:margin + m, margin:margin + m]
        current = smoothed
    out_ref[n_scales, :, :] = current[margin:margin + m,
                                      margin:margin + m]




@functools.partial(jax.jit, static_argnames=("n_scales", "interpret"))
def starlet_transform_pallas(img, n_scales=None, interpret=False):
    """Pallas starlet decomposition of an (m, m) image.

    Drop-in equivalent of core/starlet.starlet_transform on TPU.
    """
    m = img.shape[-1]
    if n_scales is None:
        n_scales = n_starlet_scales(m)
    margin = _total_margin(n_scales)
    padded = jnp.pad(img, margin, mode="symmetric")

    kernel = functools.partial(_starlet_kernel, n_scales=n_scales, m=m,
                               margin=margin)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_scales + 1, m, m), img.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(padded)
