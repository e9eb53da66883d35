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
