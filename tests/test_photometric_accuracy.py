"""Sub-mmag photometric accuracy (the BASELINE.json parity criterion).

The systematic error budget of the full model chain — separable phase
ramps, FFT convolution, flux-conserving downsampling, exact GLS flux
solve — is validated against a float64 numpy oracle at (near-)zero
noise.  1 mmag = 9.2e-4 relative flux.
"""

import numpy as np
import jax.numpy as jnp


def test_forward_model_matches_float64_oracle():
    from lightcurver_tpu.utilities.synthetic import (make_roi_scene,
                                                     render_epochs_np)
    from lightcurver_tpu.core.deconv.model import setup_model

    scene = make_roi_scene(n_epochs=6, n_pix=32, s=2, n_sources=2,
                           noise_sigma=1e-6, seed=11)
    clean = render_epochs_np(scene["psf"], scene["a_true"],
                             scene["xs"][None, :], scene["ys"][None, :], 2)
    model, ki, *_ = setup_model(scene["data"], scene["sigma_2"],
                                scene["psf"], scene["xs"], scene["ys"],
                                scene["s"])
    kt = {**ki, "kwargs_analytic": {
        **ki["kwargs_analytic"], "a": jnp.asarray(scene["a_true"].ravel())}}
    out = np.asarray(model.model(kt))
    assert np.abs(out - clean).max() < 1e-4 * clean.max()


def test_sub_mmag_flux_recovery_at_high_snr():
    from lightcurver_tpu.utilities.synthetic import make_roi_scene
    from lightcurver_tpu.core.deconv.model import setup_model
    from lightcurver_tpu.core.fisher import linear_flux_solve

    scene = make_roi_scene(n_epochs=6, n_pix=32, s=2, n_sources=2,
                           noise_sigma=1e-6, seed=11)
    model, ki, *_ = setup_model(scene["data"], scene["sigma_2"],
                                scene["psf"], scene["xs"], scene["ys"],
                                scene["s"])
    polished = linear_flux_solve(ki, jnp.asarray(scene["data"]),
                                 jnp.asarray(scene["sigma_2"]), model)
    a = np.asarray(polished["kwargs_analytic"]["a"]).reshape(6, 2)
    rel = np.abs(a / scene["a_true"] - 1)
    # < 0.1 mmag systematic
    assert float(rel.max()) < 1e-4


def test_short_fit_plus_polish_reaches_full_budget_chi2():
    """The accelerated recipe claim of bench.py, pinned at small scale.

    The model is linear in the fluxes: a SHORT AdaBelief run (positions
    + background) followed by the exact GLS flux polish must reach the
    chi2 of a 8x longer run without the polish.  Measured at the
    1000-epoch flagship on hardware (250+polish: 1.0041 vs 2000 plain:
    1.0056); this guards the structure of the claim hermetically.
    """
    from lightcurver_tpu.utilities.synthetic import make_roi_scene
    from lightcurver_tpu.core.deconv.model import setup_model
    from lightcurver_tpu.core.deconv.loss import Loss
    from lightcurver_tpu.core.params import Params
    from lightcurver_tpu.core.optimize import run_adabelief
    from lightcurver_tpu.core.fisher import linear_flux_solve

    scene = make_roi_scene(n_epochs=12, n_pix=32, s=2, n_sources=2,
                           seed=5)
    data = jnp.asarray(scene["data"])
    sigma_2 = jnp.asarray(scene["sigma_2"])

    def fit(n_iter, polish):
        model, ki, ku, kd, _ = setup_model(
            scene["data"], scene["sigma_2"], scene["psf"], scene["xs"],
            scene["ys"], scene["s"])
        params = Params(ki, {"kwargs_sersic": {}}, ku, kd)
        loss = Loss(data, model, params, sigma_2,
                    regularization_terms="l1_starlet",
                    regularization_strength_scales=1.0,
                    regularization_strength_hf=1.0,
                    regularization_strength_positivity=100.0)
        best, _, _ = run_adabelief(loss.loss_fn, params.free0,
                                   params.lower, params.upper, n_iter,
                                   init_learning_rate=1e-2,
                                   consts=loss.consts)
        params.set_best(best)
        kwargs = params.best_fit_values(as_kwargs=True)
        if polish:
            kwargs = linear_flux_solve(kwargs, data, sigma_2, model)
        modelled = np.asarray(model.model(kwargs))
        return float(np.nansum(
            (scene["data"] - modelled) ** 2 / scene["sigma_2"])
            / modelled.size)

    chi2_long_plain = fit(800, polish=False)
    chi2_short_polished = fit(100, polish=True)
    assert chi2_short_polished <= chi2_long_plain * 1.02, \
        (chi2_short_polished, chi2_long_plain)
    assert chi2_short_polished < 1.6
