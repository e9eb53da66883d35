"""Numerical-core contract tests.

Mirrors the reference's tests/test_starred_calls/test_starred_calls.py:
pins the result-dict keys, dtypes/shapes, and the exact loss-history
length (no early stopping) of the in-repo core that replaces STARRED.
"""

import numpy as np
import pytest

from lightcurver_tpu.core.psf import build_psf
from lightcurver_tpu.core.deconv import setup_model, Loss, Prior
from lightcurver_tpu.core.params import Params
from lightcurver_tpu.core.optimize import Optimizer
from lightcurver_tpu.core.noise import propagate_noise
from lightcurver_tpu.core.fisher import get_flux_uncertainties


@pytest.fixture(scope="module")
def blob_stack():
    rng = np.random.default_rng(42)
    x, y = np.meshgrid(np.arange(-8, 8), np.arange(-8, 8))
    gauss = np.exp(-0.1 * (x**2 + y**2)).astype(np.float32)
    data = 0.1 * rng.random((5, 16, 16)).astype(np.float32) + gauss[None]
    noisemap = 0.1 * np.ones((5, 16, 16), dtype=np.float32)
    psf = np.repeat(gauss[None], 5, axis=0)
    return data, noisemap, psf


class TestBuildPSF:
    def test_contract(self, blob_stack):
        data, noisemap, _ = blob_stack
        result = build_psf(data, noisemap, subsampling_factor=1,
                           n_iter_analytic=5, n_iter_adabelief=10,
                           masks=np.ones_like(data, dtype=bool),
                           guess_method_star_position="center")
        assert isinstance(result, dict)
        for key in ("full_psf", "adabelief_extra_fields", "narrow_psf",
                    "chi2", "residuals"):
            assert key in result
        assert "loss_history" in result["adabelief_extra_fields"]
        assert len(result["adabelief_extra_fields"]["loss_history"]) == 10
        assert len(result["lbfgs_extra_fields"]["loss_history"]) == 5
        assert result["residuals"].shape == data.shape
        assert isinstance(result["chi2"], float)
        assert result["narrow_psf"].shape == (16, 16)
        km = result["kwargs_psf"]["kwargs_moffat"]
        assert "fwhm_x" in km and "fwhm_y" in km
        assert "kwargs_distortion" in result["kwargs_psf"]
        # narrow psf is normalized
        np.testing.assert_allclose(result["narrow_psf"].sum(), 1.0, atol=1e-5)

    def test_recovers_moffat_psf(self):
        """Fit synthetic stars drawn from a known PSF; chi2 must be ~1."""
        from lightcurver_tpu.core.psf.model import PSFModel
        import jax.numpy as jnp

        n, s, n_stars = 24, 2, 4
        m = n * s
        rng = np.random.default_rng(7)
        truth = PSFModel(n_stars, n, s)
        kwargs_true = {
            "kwargs_moffat": {"fwhm_x": jnp.asarray(4.0),
                              "fwhm_y": jnp.asarray(3.2),
                              "beta": jnp.asarray(2.8)},
            "kwargs_gaussian": {
                "a": jnp.asarray([100.0, 220.0, 80.0, 150.0]),
                "x0": jnp.asarray([0.0, 0.3, -0.45, 0.1]),
                "y0": jnp.asarray([0.0, -0.2, 0.25, 0.4]),
            },
            "kwargs_background": {"background": jnp.zeros(m * m)},
            "kwargs_distortion": {"dilation_x": jnp.zeros(5),
                                  "dilation_y": jnp.zeros(5),
                                  "shear": jnp.zeros(5)},
        }
        clean = np.asarray(truth.model(kwargs_true))
        sigma = 0.05 + 0.02 * np.sqrt(np.abs(clean))
        data = clean + sigma * rng.normal(size=clean.shape)
        result = build_psf(data, sigma, subsampling_factor=s,
                           n_iter_analytic=60, n_iter_adabelief=300,
                           guess_fwhm_pixels=3.5)
        assert result["chi2"] < 1.5, result["chi2"]
        fwhm_x = float(result["kwargs_psf"]["kwargs_moffat"]["fwhm_x"])
        assert abs(fwhm_x - 4.0) < 0.4, fwhm_x


class TestDeconvContract:
    def test_setup_and_optimize(self, blob_stack):
        data, noisemap, psf = blob_stack
        n_iter = 50
        model, kw_init, kw_up, kw_down, kw_fixed = setup_model(
            data, noisemap**2, psf, np.array([0.0]), np.array([0.0]), 1,
            list(np.nansum(data, axis=(1, 2))))
        # structure parity with the reference's expectations
        assert set(kw_init) == {"kwargs_analytic", "kwargs_background",
                                "kwargs_sersic"}
        ka = kw_init["kwargs_analytic"]
        assert ka["a"].shape == (5,)
        assert ka["c_x"].shape == (1,)
        assert ka["dx"].shape == (5,)
        assert model.image_size == 16

        params = Params(kw_init, kw_fixed, kw_up, kw_down)
        loss = Loss(data, model, params, noisemap**2,
                    regularization_terms="l1_starlet")
        optim = Optimizer(loss, params, method="adabelief")
        best, logL, extra, runtime = optim.minimize(
            max_iterations=n_iter, init_learning_rate=1e-2,
            schedule_learning_rate=True, restart_from_init=True)
        assert len(optim.loss_history) == n_iter
        kwargs_final = params.best_fit_values(as_kwargs=True)
        assert kwargs_final["kwargs_analytic"]["a"].shape == (5,)
        # flux estimates should be near the stamp sums (bright blob)
        modelled = np.asarray(model.model(kwargs_final))
        assert modelled.shape == data.shape
        chi2 = np.nansum((data - modelled) ** 2 / noisemap**2,
                         axis=(1, 2)) / model.image_size**2
        assert chi2.mean() < 2.0, chi2

        errs = get_flux_uncertainties(
            kwargs=kwargs_final, kwargs_up=kw_up, kwargs_down=kw_down,
            data=data, noisemap=noisemap, model=model)
        assert errs.shape == (5,)
        assert np.all(errs > 0)

    def test_optimizer_options_honored(self, blob_stack):
        """The reference passes stop_at_loss_increase / min_iterations /
        return_param_history (star_photometry.py:113-122); round 1
        silently dropped them — now they must do something."""
        data, noisemap, psf = blob_stack
        model, kw_init, kw_up, kw_down, kw_fixed = setup_model(
            data, noisemap**2, psf, np.array([0.0]), np.array([0.0]), 1,
            list(np.nansum(data, axis=(1, 2))))

        # return_param_history: subsampled snapshots with iterations
        params = Params(kw_init, kw_fixed, kw_up, kw_down)
        loss = Loss(data, model, params, noisemap**2)
        optim = Optimizer(loss, params, method="adabelief")
        best, logL, extra, runtime = optim.minimize(
            max_iterations=100, init_learning_rate=1e-2,
            restart_from_init=True, return_param_history=True)
        ph = extra["param_history"]
        assert ph is not None
        a_hist = np.asarray(ph["kwargs_analytic"]["a"])
        assert a_hist.ndim == 2 and a_hist.shape[1] == 5
        iters = extra["param_history_iterations"]
        assert iters[0] == 0 and (np.diff(iters) > 0).all()
        # snapshots actually evolve
        assert not np.allclose(a_hist[0], a_hist[-1])
        assert len(extra["loss_history"]) == 100

        # stop_at_loss_increase freezes the trajectory once the loss
        # ticks up (with a big lr it will), after min_iterations
        params2 = Params(kw_init, kw_fixed, kw_up, kw_down)
        loss2 = Loss(data, model, params2, noisemap**2)
        optim2 = Optimizer(loss2, params2, method="adabelief")
        _, _, extra2, _ = optim2.minimize(
            max_iterations=200, init_learning_rate=0.5,
            schedule_learning_rate=False, restart_from_init=True,
            stop_at_loss_increase=True, min_iterations=5)
        stopped_at = extra2["stopped_at"]
        assert 5 <= stopped_at < 200
        hist = np.asarray(extra2["loss_history"])
        # frozen tail: constant after the stop
        tail = hist[stopped_at + 1:]
        if tail.size:
            assert float(np.ptp(tail)) == 0.0

        # options on l-bfgs-b are rejected loudly, never dropped
        optim3 = Optimizer(loss2, params2, method="l-bfgs-b")
        with pytest.raises(ValueError, match="adabelief"):
            optim3.minimize(max_iterations=10, return_param_history=True)

    def test_propagate_noise_shapes(self, blob_stack):
        data, noisemap, psf = blob_stack
        model, kw_init, *_ = setup_model(
            data, noisemap**2, psf, [0.0], [0.0], 1)
        W = propagate_noise(model, noisemap, kw_init,
                            wavelet_type_list=["starlet"], method="SLIT",
                            num_samples=50, seed=1, upsampling_factor=1)[0]
        m = model.m
        assert W.shape[1:] == (m, m)
        assert np.all(np.asarray(W) > 0)

    def test_prior_pulls_parameters(self, blob_stack):
        data, noisemap, psf = blob_stack
        model, kw_init, kw_up, kw_down, kw_fixed = setup_model(
            data, noisemap**2, psf, [0.0], [0.0], 1)
        prior = Prior(prior_analytic=[["c_x", np.array([0.5]),
                                      np.array([0.01])]])
        params = Params(kw_init, kw_fixed, kw_up, kw_down)
        loss = Loss(data, model, params, noisemap**2, prior=prior)
        optim = Optimizer(loss, params, method="adabelief")
        optim.minimize(max_iterations=200, init_learning_rate=1e-2,
                       restart_from_init=True)
        c_x = float(params.best_fit_values()["kwargs_analytic"]["c_x"][0])
        assert abs(c_x - 0.5) < 0.2  # dragged toward the prior mean
