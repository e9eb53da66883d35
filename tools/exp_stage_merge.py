"""EXPERIMENT: stacked-K merging of the modulated inverse-DFT matmuls.

The PSF pixel phase is MXU-shape-bound (BASELINE.md): stage 1 runs four
(n, L) x (L, Lh) einsums and stage 2 two (n, Lh) x (Lh, n) einsums per
frame/star, all too narrow to fill the systolic array.  This probe times
three rewrites of ops/dft.irfft2_pool_shift_matmul at the PSF bench
shape (16 frames x 8 stars, m=128) WITHOUT touching production code:

  base : current implementation (4 + 2 einsums)
  s2   : stage 2 merged — [U | V] @ [Cxp; -Sxp], K doubled, 1 einsum
  s1   : stage 1 merged — [R1 | I1] @ [S_re; -S_im] and
         [R1 | I1] @ [S_im;  S_re] with PRE-STACKED spectra (consts), 2 einsums
  both : s1 + s2

Prints per-variant forward+grad ms and max |delta| vs base.

Run: timeout 590 python tools/exp_stage_merge.py
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
    from lightcurver_tpu.ops.dft import make_irfft2_pool_mats, _precision
    from lightcurver_tpu.utilities.benchmarking import time_vg_loop

    ops.auto_select_backends()
    m = N_PIX * S
    L = 2 * m
    Lh = L // 2 + 1
    n = m // S

    rng = np.random.default_rng(0)
    mats = make_irfft2_pool_mats(L, m, S)
    consts = {
        "t_re": jnp.asarray(rng.normal(0, 1, (BATCH, L, Lh)),
                            jnp.float32),
        "t_im": jnp.asarray(rng.normal(0, 1, (BATCH, L, Lh)),
                            jnp.float32),
        "Ayp": mats["Ayp"], "Byp": mats["Byp"],
        "Cxp": mats["Cxp"], "Sxp": mats["Sxp"],
        # pre-stacked variants (consts: built once, never per-iteration)
        "CSxp": jnp.concatenate([mats["Cxp"], -mats["Sxp"]], axis=0),
    }
    # pre-stacked spectra for the s1 variant: [S_re; -S_im], [S_im; S_re]
    consts["t_s1a"] = jnp.concatenate(
        [consts["t_re"], -consts["t_im"]], axis=-2)
    consts["t_s1b"] = jnp.concatenate(
        [consts["t_im"], consts["t_re"]], axis=-2)

    free0 = {
        "a": jnp.asarray(rng.normal(1, 0.1, (BATCH, N_STARS)), jnp.float32),
        "px": jnp.asarray(rng.normal(0, 1, (BATCH, N_STARS)), jnp.float32),
        "py": jnp.asarray(rng.normal(0, 1, (BATCH, N_STARS)), jnp.float32),
    }

    prec = _precision(None)

    def ramps(free):
        from lightcurver_tpu.core import convolution as conv

        ry, rx = conv.r_kernel_fft_1d(m, S)
        return conv.point_source_ramps(m, S, free["a"], free["px"],
                                       free["py"], ry=ry, rx=rx)

    def render_base(free, c):
        u_re, u_im, v_re, v_im = ramps(free)
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
        return jnp.einsum("...yj,jx->...yx", U, c["Cxp"],
                          precision=prec) \
            - jnp.einsum("...yj,jx->...yx", V, c["Sxp"], precision=prec)

    def stage2_merged(U, V, c):
        UV = jnp.concatenate([U, V], axis=-1)          # (..., n, 2Lh)
        return jnp.einsum("...yj,jx->...yx", UV, c["CSxp"],
                          precision=prec)

    def render_s2(free, c):
        u_re, u_im, v_re, v_im = ramps(free)
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
        return stage2_merged(U, V, c)

    def render_s1(free, c, merge2=False):
        u_re, u_im, v_re, v_im = ramps(free)
        R1 = c["Ayp"] * u_re[..., None, :] - c["Byp"] * u_im[..., None, :]
        I1 = c["Ayp"] * u_im[..., None, :] + c["Byp"] * u_re[..., None, :]
        RI = jnp.concatenate([R1, I1], axis=-1)        # (..., n, 2L)
        Sa = c["t_s1a"][:, None]                       # (..., 2L, Lh)
        Sb = c["t_s1b"][:, None]
        Tr = jnp.einsum("...yk,...kj->...yj", RI, Sa, precision=prec)
        Ti = jnp.einsum("...yk,...kj->...yj", RI, Sb, precision=prec)
        U = Tr * v_re[..., None, :] - Ti * v_im[..., None, :]
        V = Tr * v_im[..., None, :] + Ti * v_re[..., None, :]
        if merge2:
            return stage2_merged(U, V, c)
        return jnp.einsum("...yj,jx->...yx", U, c["Cxp"],
                          precision=prec) \
            - jnp.einsum("...yj,jx->...yx", V, c["Sxp"], precision=prec)

    variants = {
        "base": render_base,
        "s2": render_s2,
        "s1": lambda f, c: render_s1(f, c, merge2=False),
        "both": lambda f, c: render_s1(f, c, merge2=True),
    }

    ref = None
    for name, fn in variants.items():
        def loss(free, c, fn=fn):
            out = fn(free, c)
            return jnp.sum(out * out)

        vg = jax.value_and_grad(loss)
        out = np.asarray(jax.jit(lambda f, c, fn=fn: fn(f, c))(free0,
                                                               consts))
        if ref is None:
            ref = out
        delta = float(np.max(np.abs(out - ref)))
        ms = 1e3 * time_vg_loop(vg, free0, consts, n_rep=200)
        print(json.dumps({"variant": name, "vg_ms": round(ms, 4),
                          "max_abs_delta_vs_base": delta}), flush=True)


if __name__ == "__main__":
    main()
