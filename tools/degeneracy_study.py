"""Blind-fit flux error vs SNR x starlet regularization strength.

The joint deconvolution's intrinsic flux<->background degeneracy (a
point source can trade flux with the free pixelated background under
the starlet prior) is SNR- and regularization-dependent — identical in
kind to the reference/STARRED method's.  This tool quantifies it: a
grid of BLIND 100-epoch joint fits (AdaBelief + exact GLS flux polish,
the production recipe) on synthetic scenes of known truth, sweeping the
per-pixel noise level and the l1-starlet strength, reporting the median
absolute flux error over sources and epochs.

The committed output table lives in PARITY.md; the high-SNR full-
pipeline bound is tests/test_e2e_high_snr.py, the low-SNR bound is
tests/test_e2e_pipeline.py (15%), and the zero-noise model-chain
systematic is 0.0014 mmag (BASELINE.md).

Run: timeout 590 python tools/degeneracy_study.py
"""

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

N_EPOCHS = 100
N_PIX = 64
S = 2
N_SOURCES = 4

NOISE_LEVELS = [0.03, 0.1, 0.3, 1.0, 3.0]
REG_STRENGTHS = [0.3, 1.0, 3.0, 10.0]


def _snr(scene, noise_sigma):
    """Matched-filter point-source SNR at the mean flux and seeing.

    scene["fwhm"] is the per-epoch seeing make_roi_scene actually drew
    (it was absent before round 3, so the committed PARITY.md table's
    SNR labels were computed from an assumed 3.0 px — ~3% off the true
    ~3.1 px mean; the error-vs-SNR conclusions are unaffected at the
    table's own precision)."""
    fwhm = float(np.mean(scene["fwhm"]))
    n_eff = 4.0 * np.pi * (fwhm / 2.355) ** 2
    return float(np.mean(scene["a_true"]) / (noise_sigma * np.sqrt(n_eff)))


def run_fit(scene, lam, n_iter=2000):
    import jax
    import jax.numpy as jnp
    from lightcurver_tpu.core.deconv.loss import Loss
    from lightcurver_tpu.core.deconv.model import setup_model
    from lightcurver_tpu.core.fisher import linear_flux_solve
    from lightcurver_tpu.core.optimize import run_adabelief
    from lightcurver_tpu.core.params import Params

    model, ki, ku, kd, _ = setup_model(
        scene["data"], scene["sigma_2"], scene["psf"], scene["xs"],
        scene["ys"], scene["s"])
    params = Params(ki, {"kwargs_sersic": {}}, ku, kd)
    loss = Loss(scene["data"], model, params, scene["sigma_2"],
                regularization_terms="l1_starlet",
                regularization_strength_scales=lam,
                regularization_strength_hf=lam,
                regularization_strength_positivity=100.0)
    best, _, _ = run_adabelief(
        loss.loss_fn, params.free0, params.lower, params.upper, n_iter,
        init_learning_rate=1e-2, consts=loss.consts)
    params.set_best(best)
    kwargs = params.best_fit_values(as_kwargs=True)
    kwargs = jax.jit(lambda kw, d, s2, c: linear_flux_solve(
        kw, d, s2, model, c))(kwargs, jnp.asarray(scene["data"]),
                              jnp.asarray(scene["sigma_2"]),
                              model.consts())
    a = np.asarray(kwargs["kwargs_analytic"]["a"]).reshape(
        N_EPOCHS, N_SOURCES)
    return a


def main():
    import jax

    cache = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from lightcurver_tpu import ops
    from lightcurver_tpu.utilities.synthetic import make_roi_scene

    ops.auto_select_backends()

    rows = []
    for sigma in NOISE_LEVELS:
        scene = make_roi_scene(n_epochs=N_EPOCHS, n_pix=N_PIX, s=S,
                               n_sources=N_SOURCES, noise_sigma=sigma,
                               seed=11)
        snr = _snr(scene, sigma)
        for lam in REG_STRENGTHS:
            a = run_fit(scene, lam)
            rel = np.abs(a / scene["a_true"] - 1.0)
            row = {"noise_sigma": sigma, "snr": round(snr, 1),
                   "lambda": lam,
                   "median_abs_rel_err_pct": round(
                       100 * float(np.median(rel)), 3),
                   "p90_abs_rel_err_pct": round(
                       100 * float(np.quantile(rel, 0.9)), 3)}
            rows.append(row)
            print(json.dumps(row), flush=True)

    # markdown table for PARITY.md
    print("\n| SNR (matched-filter) | lambda | median "
          "abs err | p90 abs err |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['snr']} | {r['lambda']} | "
              f"{r['median_abs_rel_err_pct']}% | "
              f"{r['p90_abs_rel_err_pct']}% |")


if __name__ == "__main__":
    main()
