"""Measure the Pallas starlet vs the XLA shift-add starlet ON THE CHIP.

Round-1 verdict: the "~4.6x faster" claim on the Pallas cascade was never
demonstrated on hardware and auto_select_backends() never enabled it.
This script times, on the live backend:

1. the standalone starlet forward (jitted, batched), XLA vs Pallas,
2. the REAL consumers — one AdaBelief step of the ROI joint loss and of
   the PSF pixel-phase loss (value_and_grad), with ops backend xla vs
   pallas — which is the metric auto_select_backends should act on.

Prints one JSON line per measurement.  Timing fetches a value to the
host (block_until_ready returns early on the tunneled backend).

Run: timeout 590 python tools/bench_starlet_tpu.py
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def _setup():
    import jax

    cache = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def bench_standalone(jax, m, n_rep=200):
    import jax.numpy as jnp
    from lightcurver_tpu.core.starlet import (starlet_transform,
                                              n_starlet_scales)
    from lightcurver_tpu.ops.starlet_pallas import starlet_transform_pallas
    from lightcurver_tpu.utilities.benchmarking import time_compiled_loop

    n_sc = n_starlet_scales(m)
    img = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (m, m)).astype(np.float32))

    t_xla = time_compiled_loop(
        lambda x: starlet_transform(x, n_scales=n_sc), img, n_rep)
    t_pal = time_compiled_loop(
        lambda x: starlet_transform_pallas(x, n_scales=n_sc), img, n_rep)
    print(json.dumps({"bench": "starlet_forward", "m": m,
                      "xla_us": round(t_xla * 1e6, 1),
                      "pallas_us": round(t_pal * 1e6, 1),
                      "pallas_speedup": round(t_xla / t_pal, 2)}),
          flush=True)
    # parity while we're here
    a = np.asarray(starlet_transform(img, n_scales=n_sc))
    b = np.asarray(starlet_transform_pallas(img, n_scales=n_sc))
    err = float(np.abs(a - b).max())
    assert err < 1e-4, f"pallas/xla starlet mismatch: {err}"


def bench_roi_step(jax, backend, n_iter=300):
    """Wall time of n_iter compiled AdaBelief iterations of the ROI loss."""
    from lightcurver_tpu import ops
    from lightcurver_tpu.utilities.synthetic import make_roi_scene
    from lightcurver_tpu.core.deconv.model import setup_model
    from lightcurver_tpu.core.deconv.loss import Loss
    from lightcurver_tpu.core.params import Params
    from lightcurver_tpu.core.optimize import run_adabelief

    ops.set_backend(backend)
    scene = make_roi_scene(n_epochs=100, n_pix=64, s=2, n_sources=4)
    model, ki, ku, kd, _ = setup_model(
        scene["data"], scene["sigma_2"], scene["psf"], scene["xs"],
        scene["ys"], scene["s"])
    params = Params(ki, {"kwargs_sersic": {}}, ku, kd)
    loss = Loss(scene["data"], model, params, scene["sigma_2"],
                regularization_terms="l1_starlet",
                regularization_strength_scales=1.0,
                regularization_strength_hf=1.0,
                regularization_strength_positivity=100.0)

    def fit(free0):
        _, _, hist = run_adabelief(loss.loss_fn, free0, params.lower,
                                   params.upper, n_iter,
                                   init_learning_rate=1e-2,
                                   consts=loss.consts)
        float(hist[-1])
        return hist

    fit(params.free0)
    # best-of-3: a single sample can be off by an order of magnitude
    # from transient tenant contention (measured: the same program
    # 15.5 then 0.28 ms/iter minutes apart), and this wall is the
    # decision metric behind auto_select_backends
    wall = float("inf")
    for rep in range(1, 4):
        free1 = jax.tree_util.tree_map(
            lambda x: x * (1 + 1e-6 * rep), params.free0)
        t0 = time.perf_counter()
        fit(free1)
        wall = min(wall, time.perf_counter() - t0)
    ops.set_backend("xla")
    return wall


def bench_psf_step(jax, backend):
    """Wall time of a 16-frame batched PSF fit (pixel phase dominated)."""
    from lightcurver_tpu import ops
    from lightcurver_tpu.core.psf.batched import build_psf_batched
    from lightcurver_tpu.utilities.synthetic import make_star_stamps

    ops.set_backend(backend)
    frames = [make_star_stamps(n_stars=8, n_pix=64, s=2, seed=i,
                               fwhm_x=2.5, fwhm_y=2.5) for i in range(16)]
    data = np.stack([f["data"] for f in frames])
    sigma = np.stack([f["sigma"] for f in frames])
    build_psf_batched(data, sigma, 2, n_iter_analytic=100,
                      n_iter_adabelief=1000)
    wall = float("inf")  # best-of-3 (see bench_roi_step)
    for rep in range(1, 4):
        t0 = time.perf_counter()
        build_psf_batched(data * np.float32(1 + 1e-6 * rep), sigma, 2,
                          n_iter_analytic=100, n_iter_adabelief=1000)
        wall = min(wall, time.perf_counter() - t0)
    ops.set_backend("xla")
    return wall


def main():
    jax = _setup()
    from lightcurver_tpu import ops

    ops.auto_select_backends()  # MXU DFT on TPU, as in production
    for m in (32, 128):
        bench_standalone(jax, m)

    t_xla = bench_roi_step(jax, "xla")
    t_pal = bench_roi_step(jax, "pallas")
    print(json.dumps({"bench": "roi_300iter_wall_s",
                      "xla_s": round(t_xla, 3),
                      "pallas_s": round(t_pal, 3),
                      "pallas_speedup": round(t_xla / t_pal, 3)}),
          flush=True)

    t_xla = bench_psf_step(jax, "xla")
    t_pal = bench_psf_step(jax, "pallas")
    print(json.dumps({"bench": "psf_batch16_wall_s",
                      "xla_s": round(t_xla, 3),
                      "pallas_s": round(t_pal, 3),
                      "pallas_speedup": round(t_xla / t_pal, 3),
                      "backend": jax.default_backend()}), flush=True)


if __name__ == "__main__":
    main()
