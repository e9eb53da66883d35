"""Fused Pallas render of the multi-epoch deconvolution model.

One optimizer iteration of the joint ROI fit is HBM-bound: the XLA path
materializes the per-epoch model spectrum (N, L, L/2+1) three times over
(point-source GEMM output, the + background product, and the matmul
operand reads) — measured 6.3 GB accessed per value_and_grad at the
1000-epoch flagship configuration (XLA cost analysis, v5e).

This kernel never materializes the spectrum.  Per epoch, IN VMEM:

    spec   = sum_c u[c] (x) v[c]            (point-source phase ramps,
                                             2M stacked rank-1 terms)
    X      = spec * (t_hat * r_hat)         (PSF x target kernel)
           [+ h_hat * (t_hat * center)]     (optional background channel)
    A + iB = (Ayp + i Byp) @ X              (pooled inverse DFT, stage 1)
    out    = Re{(A + iB) @ (Cxp + i Sxp)}   (stage 2, lands on data grid)

HBM traffic per epoch: read t_hat (the only big array; r_hat and the
center phase are shared (L, L/2+1) factors applied in-kernel) + write
the (n, n) stamp.  Only the FORWARD kernel exists — the planned custom
VJP (backward kernels re-reading t_hat once and accumulating the
shared-background cotangent in VMEM across the sequential grid) was
never built because the forward already lost the measurement below.

MEASURED OUTCOME (v5e, round 2): the kernel is numerically exact
(f32 roundoff vs the XLA renderer) but 7x SLOWER at the 1000-epoch
flagship shape — 28-30 ms forward vs 4.2 ms XLA.  Ablations (probe
scripts, round-2 session): per-epoch (64, 256)x(256, 129) dots inside
the kernel cost ~5 us each regardless of precision or epochs-per-
program; 6 dots x 1000 epochs dominates.  XLA's batched einsums over
the whole epoch axis are near-roofline for the same contraction, so
the HBM savings cannot pay for Mosaic's small-dot inefficiency at
these shapes.  The production renderer instead got the same byte
reductions in pure XLA: separable-factor folding + the all-real
(re, im) pipeline (core/deconv/model.py _model_all_real) — 1000-epoch
fit 15.1 -> 12.3 s at identical chi2.  This kernel is kept as a
tested, honest record of the experiment (interpret-mode parity test
in tests/test_ops_pallas.py); revisit if Mosaic grows efficient
batched small-M dots.

Mirrors the model contract of core/deconv/model.py (reference
semantics: STARRED setup_model / Deconv.model, see reference
processes/roi_modelling.py:207-211).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(u_re, u_im, v, t_re, t_im, r_hat, pc, ps_, h_re, h_im,
                ayp, byp, cxp, sxp, out, *, be, include_h):
    """One grid program renders ``be`` epochs."""

    def one_epoch(e, _):
        ure = u_re[e]                      # (2M, L)
        uim = u_im[e]
        ve = v[e]                          # (2M, Lh)
        tre = t_re[e]                      # (L, Lh)
        tim = t_im[e]

        # point-source spectrum: sum of 2M rank-1 terms as one small-
        # contraction dot (gather-free; the 2M axis is contracted).
        # Mosaic supports only DEFAULT/HIGHEST dot precision; HIGHEST
        # keeps the render f32-exact (the FLOPs are not the bottleneck)
        dn = (((0,), (0,)), ((), ()))
        hi = jax.lax.Precision.HIGHEST
        spec_re = jax.lax.dot_general(ure, ve, dn, precision=hi,
                                      preferred_element_type=jnp.float32)
        spec_im = jax.lax.dot_general(uim, ve, dn, precision=hi,
                                      preferred_element_type=jnp.float32)

        # X = spec * (t_hat * r_hat)  [+ h_hat * (t_hat * center_phase)]
        ps_re = tre * r_hat[:]
        ps_im = tim * r_hat[:]
        x_re = spec_re * ps_re - spec_im * ps_im
        x_im = spec_re * ps_im + spec_im * ps_re
        if include_h:
            g_re = tre * pc[:] - tim * ps_[:]
            g_im = tre * ps_[:] + tim * pc[:]
            x_re = x_re + h_re[:] * g_re - h_im[:] * g_im
            x_im = x_im + h_re[:] * g_im + h_im[:] * g_re

        # pooled inverse DFT: out = Re{(Ayp + iByp) @ X @ (Cxp + iSxp)}
        a = jnp.dot(ayp[:], x_re, precision=hi,
                    preferred_element_type=jnp.float32) \
            - jnp.dot(byp[:], x_im, precision=hi,
                      preferred_element_type=jnp.float32)
        b = jnp.dot(ayp[:], x_im, precision=hi,
                    preferred_element_type=jnp.float32) \
            + jnp.dot(byp[:], x_re, precision=hi,
                      preferred_element_type=jnp.float32)
        out[e] = jnp.dot(a, cxp[:], precision=hi,
                         preferred_element_type=jnp.float32) \
            - jnp.dot(b, sxp[:], precision=hi,
                      preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, be, one_epoch, 0)


def _block(shape, index_map):
    return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("include_h", "interpret"))
def _fused_render_fwd_impl(u_re, u_im, v, t_re, t_im, r_hat, pc, ps_,
                           h_re, h_im, ayp, byp, cxp, sxp,
                           include_h=True, interpret=False):
    n_ep, two_m, L = u_re.shape
    Lh = t_re.shape[-1]
    n = ayp.shape[0]
    be = _epochs_per_program(n_ep, L, Lh)
    grid = (n_ep // be,)

    kern = functools.partial(_fwd_kernel, be=be,
                             include_h=include_h)
    ep = lambda i: (i, 0, 0)  # noqa: E731
    shared = lambda i: (0, 0)  # noqa: E731
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            _block((be, two_m, L), ep),
            _block((be, two_m, L), ep),
            _block((be, two_m, Lh), ep),
            _block((be, L, Lh), ep),
            _block((be, L, Lh), ep),
            _block((L, Lh), shared),
            _block((L, Lh), shared),
            _block((L, Lh), shared),
            _block((L, Lh), shared),
            _block((L, Lh), shared),
            _block((n, L), shared),
            _block((n, L), shared),
            _block((Lh, n), shared),
            _block((Lh, n), shared),
        ],
        out_specs=_block((be, n, n), ep),
        out_shape=jax.ShapeDtypeStruct((n_ep, n, n), jnp.float32),
        interpret=interpret,
    )(u_re, u_im, v, t_re, t_im, r_hat, pc, ps_, h_re, h_im,
      ayp, byp, cxp, sxp)


def _epochs_per_program(n_ep, L, Lh):
    """Largest of {8, 4, 2, 1} dividing the epoch count that fits VMEM.

    Per epoch the double-buffered t_hat blocks cost 2 (re, im) x 2
    (pipeline buffers) x L x Lh_padded x 4 bytes; the in-kernel
    temporaries and the shared (L, Lh) factors need a few MB more, so
    the epoch blocks are capped at ~4.5 MB (VMEM is ~16 MB).
    """
    lh_pad = -(-Lh // 128) * 128
    per_epoch = 16 * L * lh_pad
    for be in (8, 4, 2, 1):
        if n_ep % be == 0 and be * per_epoch <= 4_500_000:
            return be
    return 1
