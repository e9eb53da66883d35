"""EXPERIMENT: widening the PSF pixel-phase matmuls on the MXU.

VERDICT r3 #3: the PSF fit is MXU-shape-bound — the modulated pooled
inverse-DFT dots at the bench shape are (K=129, N=64), a sliver of the
256x256 systolic array, and the round-3 stacked-K merge measured
neutral.  This probe times NEW rewrites of the rank-1 modulated render
(ops/dft.irfft2_pool_shift_matmul) at the PSF bench shape
(16 frames x 8 stars, n=64, m=128, L=256) without touching production:

  base   : shipped implementation (4 stage-1 + 2 stage-2 einsums)
  fullw  : stage 2 as ONE full-width GEMM — [U; V] stacked on the row
           axis against [Cxp | Sxp] (Lh, 2n=128): N fills the MXU lane
           dimension at the cost of 2x stage-2 FLOPs (the cross blocks
           are discarded).  Wins only if stage 2 is occupancy- not
           FLOP-bound.
  flat2d : every dot reshaped to an explicit 2-D GEMM (batch folded
           into M) — tests whether XLA's batched-dot lowering leaves
           tiling on the table.
  transp : stage 2 emitted transposed (x-major) — moves the narrow
           axis from N (lanes) to M (sublanes).
  lowpad : reduced zero-padding L = m + 2*pad for pad in {8, 16}.  The
           PSF fit pins star positions near the stamp centre
           (|shift| <~ 1 px), so the wrap-free support argument needs
           far less than the general L = 2m (core/convolution.py:6 —
           sized for arbitrary in-stamp placement).  This CHANGES the
           model definition (periodic-sinc shift at different L), so
           alongside timing it reports the semantic render delta and
           flux-sum delta of a realistic Moffat PSF against the L = 2m
           render.  Only landable if the delta is far below the
           sub-mmag parity bar.

Prints one JSON line per variant, incrementally.

Run: timeout 590 python tools/exp_psf_mxu.py
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

BATCH = 16
N_STARS = 8
N_PIX = 64
S = 2


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from lightcurver_tpu import ops
    from lightcurver_tpu.core import convolution as conv
    from lightcurver_tpu.ops.dft import (_precision, make_irfft2_pool_mats,
                                         make_rfft2_pad_mats,
                                         rfft2_pad_matmul_parts)
    from lightcurver_tpu.utilities.benchmarking import time_vg_loop
    from lightcurver_tpu.utilities.synthetic import moffat_np

    ops.auto_select_backends()
    m = N_PIX * S
    n = m // S
    prec = _precision(None)
    rng = np.random.default_rng(0)

    free0 = {
        "a": jnp.asarray(rng.normal(1, 0.1, (BATCH, N_STARS)),
                         jnp.float32),
        "px": jnp.asarray(rng.normal(0, 0.4, (BATCH, N_STARS)),
                          jnp.float32),
        "py": jnp.asarray(rng.normal(0, 0.4, (BATCH, N_STARS)),
                          jnp.float32),
    }

    def build_consts(L):
        """Pooled matrices + per-frame spectra of realistic PSFs at L."""
        Lh = L // 2 + 1
        mats = make_irfft2_pool_mats(L, m, S)
        fwd = make_rfft2_pad_mats(L, m)
        # realistic per-frame narrow-PSF spectra (Moffat, varied seeing)
        ts = np.stack([moffat_np(m, S, 2.4 + 0.1 * i, 2.4 + 0.1 * i,
                                 beta=2.8) for i in range(BATCH)])
        t_re, t_im = rfft2_pad_matmul_parts(jnp.asarray(ts, jnp.float32),
                                            fwd, precision=prec)
        # production ramps only exist at L = 2m; the lowpad variants use
        # the inline bare-ramp builder below, so ry/rx are only read by
        # the L = 2m variants
        ry, rx = conv.r_kernel_fft_1d(m, S)
        del Lh
        return {
            "Ayp": mats["Ayp"], "Byp": mats["Byp"],
            "Cxp": mats["Cxp"], "Sxp": mats["Sxp"],
            "CS2": jnp.concatenate([mats["Cxp"], mats["Sxp"]], axis=1),
            "t_re": jnp.asarray(t_re), "t_im": jnp.asarray(t_im),
            "ry": ry, "rx": rx,
        }

    def ramps(free, c):
        # ramp length follows the mats' L only when conv supports it;
        # at the default L=2m the production helper applies unchanged
        return conv.point_source_ramps(m, S, free["a"], free["px"],
                                       free["py"], ry=c["ry"], rx=c["rx"])

    def stage1(free, c):
        u_re, u_im, v_re, v_im = ramps(free, c)
        R1 = c["Ayp"] * u_re[..., None, :] - c["Byp"] * u_im[..., None, :]
        I1 = c["Ayp"] * u_im[..., None, :] + c["Byp"] * u_re[..., None, :]
        S_re = c["t_re"][:, None]
        S_im = c["t_im"][:, None]
        Tr = jnp.einsum("...yk,...kj->...yj", R1, S_re, precision=prec) \
            - jnp.einsum("...yk,...kj->...yj", I1, S_im, precision=prec)
        Ti = jnp.einsum("...yk,...kj->...yj", R1, S_im, precision=prec) \
            + jnp.einsum("...yk,...kj->...yj", I1, S_re, precision=prec)
        U = Tr * v_re[..., None, :] - Ti * v_im[..., None, :]
        V = Tr * v_im[..., None, :] + Ti * v_re[..., None, :]
        return U, V

    def render_base(free, c):
        U, V = stage1(free, c)
        return jnp.einsum("...yj,jx->...yx", U, c["Cxp"],
                          precision=prec) \
            - jnp.einsum("...yj,jx->...yx", V, c["Sxp"], precision=prec)

    def render_fullw(free, c):
        U, V = stage1(free, c)
        UV = jnp.concatenate([U, V], axis=-2)        # (..., 2n, Lh)
        P = jnp.einsum("...yj,jx->...yx", UV, c["CS2"],
                       precision=prec)               # (..., 2n, 2n)
        return P[..., :n, :n] - P[..., n:, n:]

    def render_flat2d(free, c):
        u_re, u_im, v_re, v_im = ramps(free, c)
        R1 = c["Ayp"] * u_re[..., None, :] - c["Byp"] * u_im[..., None, :]
        I1 = c["Ayp"] * u_im[..., None, :] + c["Byp"] * u_re[..., None, :]
        # static shapes derived from the matrices (ints in the traced
        # consts dict would become tracers and break reshape)
        L = c["Ayp"].shape[-1]
        Lh = c["Cxp"].shape[0]
        # per-frame spectra block against flattened per-star rows:
        # fold (stars, n) into M via one 2-D GEMM per part through a
        # batched reshape (B stays: spectra differ per frame)
        R1f = R1.reshape(BATCH, N_STARS * n, L)
        I1f = I1.reshape(BATCH, N_STARS * n, L)
        Tr = (jnp.einsum("bmk,bkj->bmj", R1f, c["t_re"], precision=prec)
              - jnp.einsum("bmk,bkj->bmj", I1f, c["t_im"],
                           precision=prec)).reshape(BATCH, N_STARS, n, Lh)
        Ti = (jnp.einsum("bmk,bkj->bmj", R1f, c["t_im"], precision=prec)
              + jnp.einsum("bmk,bkj->bmj", I1f, c["t_re"],
                           precision=prec)).reshape(BATCH, N_STARS, n, Lh)
        U = Tr * v_re[..., None, :] - Ti * v_im[..., None, :]
        V = Tr * v_im[..., None, :] + Ti * v_re[..., None, :]
        Uf = U.reshape(BATCH * N_STARS * n, Lh)
        Vf = V.reshape(BATCH * N_STARS * n, Lh)
        out = (jnp.einsum("mj,jx->mx", Uf, c["Cxp"], precision=prec)
               - jnp.einsum("mj,jx->mx", Vf, c["Sxp"], precision=prec))
        return out.reshape(BATCH, N_STARS, n, n)

    def render_transp(free, c):
        U, V = stage1(free, c)
        outT = jnp.einsum("jx,...yj->...xy", c["Cxp"], U,
                          precision=prec) \
            - jnp.einsum("jx,...yj->...xy", c["Sxp"], V, precision=prec)
        return jnp.swapaxes(outT, -1, -2)

    consts = build_consts(2 * m)
    variants = [("base", render_base, consts),
                ("fullw", render_fullw, consts),
                ("flat2d", render_flat2d, consts),
                ("transp", render_transp, consts)]

    ref = None
    for name, fn, c in variants:
        def loss(free, cc, fn=fn):
            out = fn(free, cc)
            return jnp.sum(out * out)

        out = np.asarray(jax.jit(lambda f, cc, fn=fn: fn(f, cc))(free0, c))
        if ref is None:
            ref = out
        delta = float(np.max(np.abs(out - ref)))
        ms = 1e3 * time_vg_loop(jax.value_and_grad(loss), free0, c,
                                n_rep=200)
        print(json.dumps({"variant": name, "vg_ms": round(ms, 4),
                          "max_abs_delta_vs_base": delta}), flush=True)

    # reduced padding: timing at the smaller shapes + SEMANTIC delta of
    # a realistic render vs the L=2m definition
    for pad in (8, 16):
        L2 = m + 2 * pad
        c2 = build_consts(L2)
        # ramps must be built at the reduced L: inline ramp builder
        def ramps_l(free, c=c2, L=L2):
            del c
            # bare separable shift ramps at padding L, matching
            # conv.point_source_ramps' fftfreq/rfftfreq convention
            fy = jnp.fft.fftfreq(L).astype(jnp.float32)
            fx = jnp.fft.rfftfreq(L).astype(jnp.float32)
            ay = -2 * jnp.pi * fy * (S * free["py"])[..., None]
            ax = -2 * jnp.pi * fx * (S * free["px"])[..., None]
            amps = free["a"][..., None]
            return (amps * jnp.cos(ay), amps * jnp.sin(ay),
                    jnp.cos(ax), jnp.sin(ax))

        # ONE parameterized stage-1 body (modulate + k-contraction):
        # every variant below (timed lowpad render, the L=2m semantic
        # reference, the composed scheduling rewrites) derives from it,
        # so a fix to the sign-sensitive stacking lands once
        def stage1_bare(free, c, L):
            u_re, u_im, v_re, v_im = ramps_l(free, c, L)
            R1 = c["Ayp"] * u_re[..., None, :] \
                - c["Byp"] * u_im[..., None, :]
            I1 = c["Ayp"] * u_im[..., None, :] \
                + c["Byp"] * u_re[..., None, :]
            S_re = c["t_re"][:, None]
            S_im = c["t_im"][:, None]
            Tr = jnp.einsum("...yk,...kj->...yj", R1, S_re,
                            precision=prec) \
                - jnp.einsum("...yk,...kj->...yj", I1, S_im,
                             precision=prec)
            Ti = jnp.einsum("...yk,...kj->...yj", R1, S_im,
                            precision=prec) \
                + jnp.einsum("...yk,...kj->...yj", I1, S_re,
                             precision=prec)
            U = Tr * v_re[..., None, :] - Ti * v_im[..., None, :]
            V = Tr * v_im[..., None, :] + Ti * v_re[..., None, :]
            return U, V

        def render_bare(free, c, L):
            U, V = stage1_bare(free, c, L)
            return jnp.einsum("...yj,jx->...yx", U, c["Cxp"],
                              precision=prec) \
                - jnp.einsum("...yj,jx->...yx", V, c["Sxp"],
                             precision=prec)

        def render_low(free, c=c2):
            return render_bare(free, c, L2)

        def loss_low(free, c=c2):
            out = render_low(free, c)
            return jnp.sum(out * out)

        ms = 1e3 * time_vg_loop(jax.value_and_grad(loss_low), free0, c2,
                                n_rep=200)
        # semantic delta: this inline ramp builder has no r-kernel /
        # centre-phase folding, so compare LIKE against LIKE by
        # rendering the SAME bare-ramp model at L = 2m — pooled renders
        # of the same Moffat PSFs shifted by the same sub-pixel offsets
        cb = build_consts(2 * m)
        out_low = np.asarray(jax.jit(render_low)(free0, c2))

        def render_ref_bare(free, cb=cb):
            return render_bare(free, cb, 2 * m)

        out_ref = np.asarray(jax.jit(render_ref_bare)(free0))
        delta = float(np.max(np.abs(out_low - out_ref)))
        flux_rel = float(np.max(np.abs(
            out_low.sum((-1, -2)) / out_ref.sum((-1, -2)) - 1.0)))
        print(json.dumps({"variant": f"lowpad{pad}",
                          "vg_ms": round(ms, 4),
                          "semantic_max_abs_delta": delta,
                          "flux_rel_delta_max": flux_rel}), flush=True)

        # composed variants: reduced padding + the stage-2 rewrites that
        # measured ~6% faster on-chip at full padding (fullw, transp) —
        # do the scheduling wins survive the smaller (K=81, N=64) shape?
        def stage1_low(free, c=c2):
            return stage1_bare(free, c, L2)

        def render_low_fullw(free, c=c2):
            U, V = stage1_low(free, c)
            UV = jnp.concatenate([U, V], axis=-2)
            P = jnp.einsum("...yj,jx->...yx", UV, c["CS2"],
                           precision=prec)
            return P[..., :n, :n] - P[..., n:, n:]

        def render_low_transp(free, c=c2):
            U, V = stage1_low(free, c)
            outT = jnp.einsum("jx,...yj->...xy", c["Cxp"], U,
                              precision=prec) \
                - jnp.einsum("jx,...yj->...xy", c["Sxp"], V,
                             precision=prec)
            return jnp.swapaxes(outT, -1, -2)

        for cname, cfn in (("fullw", render_low_fullw),
                           ("transp", render_low_transp)):
            out_c = np.asarray(jax.jit(cfn)(free0, c2))
            cdelta = float(np.max(np.abs(out_c - out_low)))

            def loss_c(free, c=c2, cfn=cfn):
                out = cfn(free, c)
                return jnp.sum(out * out)

            cms = 1e3 * time_vg_loop(jax.value_and_grad(loss_c), free0,
                                     c2, n_rep=200)
            print(json.dumps({"variant": f"lowpad{pad}+{cname}",
                              "vg_ms": round(cms, 4),
                              "max_abs_delta_vs_lowpad": cdelta}),
                  flush=True)


if __name__ == "__main__":
    main()
