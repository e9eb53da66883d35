"""EXPERIMENT: rank-M modulated render for the multi-source ROI fit.

The production 1000-epoch ROI loss (the headline metric) is HBM-bound
(BASELINE.md).  Its all-real render for M > 1 sources materializes the
per-epoch point-source spectrum pair ``s_re/s_im`` and the product pair
``x_re/x_im`` — four (N, L, L/2+1) arrays written + read per iteration
(core/deconv/model._model_all_real).  This probe compares, at the
production pixel shape:

  base  : the shipped all-real render (spectra materialized)
  rankM : M rank-1 modulated-matrix renders summed — each source
          modulates the pooled inverse matrices with its own separable
          ramp (ops/dft.irfft2_pool_shift_matmul, batched_spectrum), so
          the only (N, ..) per-iteration arrays are the (N, n, L)
          modulated matrices; the (N, L, L/2+1) spectra are never built.
          The shared background h joins as a fixed full-padding render
          (h enters linearly; here h = 0 like stage 1 / star fits) —
          for the h-FREE stage 2 the h channel would keep its own
          spectrum path.

Reports XLA cost analysis (bytes accessed / flops — meaningful on any
backend) and a wall-time loop (meaningful on the TPU; FLOP-indicative
on CPU), plus max |delta| parity.  Prints JSON lines incrementally.

Run: timeout 590 python tools/exp_roi_rankm.py [n_epochs n_pix]
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

N_SOURCES = 4


def main(n_epochs=128, n_pix=64):
    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from lightcurver_tpu import ops
    from lightcurver_tpu.core import convolution as conv
    from lightcurver_tpu.ops.dft import (_precision,
                                         irfft2_pool_matmul_parts,
                                         irfft2_pool_shift_matmul,
                                         make_dft_mats,
                                         rfft2_pad_matmul_parts)
    from lightcurver_tpu.utilities.benchmarking import (compiled_cost,
                                                        time_vg_loop)
    from lightcurver_tpu.utilities.synthetic import make_roi_scene

    ops.auto_select_backends()
    s = 2
    m = n_pix * s
    prec = _precision(None)
    scene = make_roi_scene(n_epochs=n_epochs, n_pix=n_pix, s=s,
                           n_sources=N_SOURCES)
    mats = make_dft_mats(2 * m, m, pool=s)
    t_re, t_im = rfft2_pad_matmul_parts(
        jnp.asarray(scene["psf"], jnp.float32), mats, precision=prec)
    consts = {"t_re": jnp.asarray(t_re), "t_im": jnp.asarray(t_im),
              **{k: mats[k] for k in ("Ayp", "Byp", "Cxp", "Sxp",
                                      "AByp")}}
    rng = np.random.default_rng(0)
    free0 = {
        "a": jnp.asarray(rng.uniform(40, 120, (n_epochs, N_SOURCES)),
                         jnp.float32),
        "px": jnp.asarray(scene["xs"][None, :]
                          + 0.3 * rng.normal(0, 1, (n_epochs, N_SOURCES)),
                          jnp.float32),
        "py": jnp.asarray(scene["ys"][None, :]
                          + 0.3 * rng.normal(0, 1, (n_epochs, N_SOURCES)),
                          jnp.float32),
    }
    data = jnp.asarray(scene["data"])

    ry, rx = conv.r_kernel_fft_1d(m, s)

    def render_base(free, c):
        # the shipped _model_all_real M>1 path, h fixed at zero
        s_re, s_im = conv.point_source_spectrum_parts(
            m, s, free["a"], free["px"], free["py"], ry=ry, rx=rx)
        x_re = s_re * c["t_re"] - s_im * c["t_im"]
        x_im = s_re * c["t_im"] + s_im * c["t_re"]
        return irfft2_pool_matmul_parts(x_re, x_im, c, precision=prec)

    def render_rankm(free, c):
        out = None
        for j in range(N_SOURCES):
            u_re, u_im, v_re, v_im = conv.point_source_ramps(
                m, s, free["a"][:, j], free["px"][:, j],
                free["py"][:, j], ry=ry, rx=rx)
            term = irfft2_pool_shift_matmul(
                c["t_re"], c["t_im"], u_re, u_im, v_re, v_im, c,
                precision=prec, batched_spectrum=True)
            out = term if out is None else out + term
        return out

    results = {}
    ref = None
    for name, fn in (("base", render_base), ("rankM", render_rankm)):
        def loss(free, c, fn=fn):
            r = fn(free, c)
            return jnp.sum((r - data) ** 2)

        out = np.asarray(jax.jit(lambda f, c, fn=fn: fn(f, c))(free0,
                                                               consts))
        if ref is None:
            ref = out
        delta = float(np.max(np.abs(out - ref)))
        vg = jax.value_and_grad(loss)
        vg_bytes, vg_flops = compiled_cost(vg, free0, consts)
        ms = 1e3 * time_vg_loop(vg, free0, consts, n_rep=30)
        rec = {"variant": name, "vg_ms": round(ms, 3),
               "vg_bytes": vg_bytes, "vg_gflops": round(vg_flops / 1e9, 2),
               "max_abs_delta_vs_base": delta}
        results[name] = rec
        print(json.dumps(rec), flush=True)
    if results["base"]["vg_bytes"]:
        print(json.dumps({
            "bytes_ratio_rankM_over_base": round(
                results["rankM"]["vg_bytes"]
                / results["base"]["vg_bytes"], 3),
            "flops_ratio": round(results["rankM"]["vg_gflops"]
                                 / results["base"]["vg_gflops"], 3),
        }), flush=True)


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
