"""Regression tests for the round-3 core-robustness review findings.

Each test pins one failure mode found by review: bad-pixel conventions
(NaN data / zero noise) silently corrupting fits, degenerate fits
crashing instead of flagging, a fully-masked pin star, and checkpoint
resume against a flipped fit flag.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def frame():
    from lightcurver_tpu.utilities.synthetic import make_star_stamps

    return make_star_stamps(n_stars=4, n_pix=24, s=2, seed=3,
                            fwhm_x=2.6, fwhm_y=2.6)


def test_build_psf_zero_noise_masked_pixel_does_not_nan_grads(frame):
    """A zero-noise pixel under masks=False must not NaN every gradient
    (the where-VJP 0*inf pitfall): the fit must still converge."""
    from lightcurver_tpu.core.psf.build import build_psf

    noise = frame["sigma"].copy()
    masks = np.ones_like(frame["data"], dtype=bool)
    noise[0, 10, 10] = 0.0          # dead-pixel convention
    masks[0, 10, 10] = False
    out = build_psf(frame["data"], noise, 2, n_iter_analytic=30,
                    n_iter_adabelief=120, masks=masks)
    assert np.isfinite(out["chi2"])
    assert out["chi2"] < 2.0
    # the loss must actually move (a NaN'd fit returns its init with
    # the loss history flat)
    hist = out["adabelief_extra_fields"]["loss_history"]
    assert np.isfinite(hist).all()
    assert hist[-1] < hist[0]


def test_build_psf_default_masks_exclude_nan_data(frame):
    """masks=None must default to isfinite(data) (like the batched
    path), not all-True: a NaN datum with finite noise would otherwise
    enter as a zero-flux full-weight measurement."""
    from lightcurver_tpu.core.psf.build import build_psf

    clean = build_psf(frame["data"], frame["sigma"], 2,
                      n_iter_analytic=30, n_iter_adabelief=120)
    data = frame["data"].copy()
    data[1, 11, 12] = np.nan
    poked = build_psf(data, frame["sigma"], 2, n_iter_analytic=30,
                      n_iter_adabelief=120)
    assert np.isfinite(poked["chi2"])
    # one excluded pixel moves the PSF by noise-level amounts only
    np.testing.assert_allclose(
        poked["kwargs_psf"]["kwargs_moffat"]["fwhm_x"],
        clean["kwargs_psf"]["kwargs_moffat"]["fwhm_x"], rtol=0.02)


def test_fit_stars_batched_nan_data_with_finite_noise_is_excluded():
    """A NaN datum with finite noise must be noise-inflated out of the
    fit, not zeroed into it at full weight (review finding: the core
    API half-sanitized what the pipeline caller guards)."""
    from lightcurver_tpu.core.deconv.batched import fit_stars_batched
    from lightcurver_tpu.utilities.synthetic import make_star_stamps

    st = make_star_stamps(n_stars=8, n_pix=16, s=2, seed=7,
                          fwhm_x=2.6, fwhm_y=2.6)
    m = st["psf_true"].shape[-1]
    psf = np.broadcast_to(st["psf_true"], (8, m, m))
    clean = fit_stars_batched(st["data"][None], st["sigma"][None],
                              psf[None], 2, n_iter=300, mesh=None)

    poked = st["data"].copy()
    poked[2, 8, 8] = np.nan         # epoch 2, central (bright) pixel
    out = fit_stars_batched(poked[None], st["sigma"][None], psf[None],
                            2, n_iter=300, mesh=None)
    assert np.isfinite(out["fluxes"]).all()
    # the poked epoch's flux must stay consistent with the clean fit
    # (zero-at-full-weight would drag it down by far more than 5%)
    np.testing.assert_allclose(out["fluxes"][0, 2],
                               clean["fluxes"][0, 2], rtol=0.05)


def test_all_nan_loss_history_reports_nan_loglikelihood():
    """A degenerate fit (all-NaN loss) must return logL=nan for
    flagging, not crash on np.nanargmin."""
    import jax.numpy as jnp

    from lightcurver_tpu.core.optimize import Optimizer
    from lightcurver_tpu.core.params import Params

    class NanLoss:
        consts = ()

        @staticmethod
        def loss_fn(free, consts):
            del consts
            return jnp.float32(np.nan) * free["kwargs_analytic"]["a"].sum()

    kwargs_init = {"kwargs_analytic": {"a": jnp.ones(3, jnp.float32)}}
    params = Params(kwargs_init, {}, None, None)
    opt = Optimizer(NanLoss(), params, method="adabelief")
    best, logL, extra, _ = opt.minimize(max_iterations=10)
    assert np.isnan(logL)
    assert np.isnan(extra["loss_history"]).all()
    assert np.isfinite(np.asarray(best["kwargs_analytic"]["a"])).all()


def test_psf_pin_star_skips_fully_masked_first_star(frame):
    """The position pin must land on the first star with unmasked data:
    a fully-masked star 0 would otherwise leave the global-shift
    degeneracy unbroken."""
    from lightcurver_tpu.core.psf.build import build_psf

    masks = np.ones_like(frame["data"], dtype=bool)
    masks[0] = False                # star 0: satellite trail
    out = build_psf(frame["data"], frame["sigma"], 2, n_iter_analytic=30,
                    n_iter_adabelief=120, masks=masks)
    # per-star chi2 over the REAL stars stays sane ...
    assert (out["chi2_per_star"][1:] < 2.0).all()
    # ... and the pin held star 1 (the first valid star) at the origin
    kg = out["kwargs_psf"]["kwargs_gaussian"]
    assert abs(float(kg["x0"][1])) < 0.01
    assert abs(float(kg["y0"][1])) < 0.01


def test_batched_checkpoint_refuses_flipped_fit_flag(tmp_path):
    """Resuming a batched-star checkpoint after a fit flag flipped must
    be a friendly refusal (digest covers the flags), recoverable by the
    task-level stale-checkpoint wrapper."""
    import logging

    from lightcurver_tpu.core.deconv.batched import fit_stars_batched
    from lightcurver_tpu.utilities.checkpoints import \
        run_discarding_stale_checkpoint
    from lightcurver_tpu.utilities.synthetic import make_star_stamps

    st = make_star_stamps(n_stars=6, n_pix=16, s=2, seed=11,
                          fwhm_x=2.6, fwhm_y=2.6)
    m = st["psf_true"].shape[-1]
    data = st["data"][None]
    noise = st["sigma"][None]
    psf = np.broadcast_to(st["psf_true"], (6, m, m))[None]
    ckpt = tmp_path / "flag_flip.ckpt"
    fit_stars_batched(data, noise, psf, 2, n_iter=100, mesh=None,
                      starlet_global_background=False,
                      checkpoint_path=str(ckpt), checkpoint_every=50)
    assert ckpt.exists()
    with pytest.raises(ValueError, match="delete the checkpoint"):
        fit_stars_batched(data, noise, psf, 2, n_iter=100, mesh=None,
                          starlet_global_background=True,
                          checkpoint_path=str(ckpt), checkpoint_every=50)
    # the task-level wrapper recovers by discarding and restarting
    out = run_discarding_stale_checkpoint(
        lambda: fit_stars_batched(
            data, noise, psf, 2, n_iter=100, mesh=None,
            starlet_global_background=True,
            checkpoint_path=str(ckpt), checkpoint_every=50),
        ckpt, logging.getLogger("test.flagflip"))
    assert np.isfinite(out["fluxes"]).all()


def test_fit_stars_batched_nan_psf_pixel_does_not_poison_fit():
    """A single NaN PSF pixel must not NaN the spectra: the nansum VJP
    would emit NaN cotangents into the SHARED parameters and the whole
    star would silently return its init (round-4 core review)."""
    from lightcurver_tpu.core.deconv.batched import fit_stars_batched
    from lightcurver_tpu.utilities.synthetic import make_star_stamps

    st = make_star_stamps(n_stars=8, n_pix=16, s=2, seed=9,
                          fwhm_x=2.6, fwhm_y=2.6)
    m = st["psf_true"].shape[-1]
    psf = np.broadcast_to(st["psf_true"], (8, m, m)).copy()
    clean = fit_stars_batched(st["data"][None], st["sigma"][None],
                              psf[None], 2, n_iter=300, mesh=None)

    poked = psf.copy()
    poked[3, 0, 0] = np.nan            # epoch 3, corner PSF pixel
    out = fit_stars_batched(st["data"][None], st["sigma"][None],
                            poked[None], 2, n_iter=300, mesh=None)
    assert np.isfinite(out["fluxes"]).all()
    assert np.isfinite(out["fluxes_uncertainties"]).all()
    # a corner pixel of a normalized PSF carries ~no flux: the fit must
    # land where the clean one does, not at its init
    np.testing.assert_allclose(out["fluxes"], clean["fluxes"], rtol=0.02)


def test_build_psf_user_mask_composes_with_finite_guard():
    """A user mask marking a NaN pixel good must not convert it into a
    zero-flux measurement at full weight — the finite guard composes
    with (never gets replaced by) the supplied mask.  Discriminator:
    the NaN pixel gets a tiny noise sigma, so the pre-fix behavior
    (nan_to_num -> data 0 at weight 1/1e-12) would explode the chi2 by
    many orders of magnitude, while the composed mask excludes the
    pixel and the fit stays ordinary."""
    from lightcurver_tpu.core.psf.build import build_psf
    from lightcurver_tpu.utilities.synthetic import make_star_stamps

    st = make_star_stamps(n_stars=4, n_pix=16, s=2, seed=13,
                          fwhm_x=2.6, fwhm_y=2.6)
    masks = np.ones_like(st["data"], dtype=bool)   # everything "good"
    poked = st["data"].copy()
    sigma = st["sigma"].copy()
    poked[1, 8, 8] = np.nan            # bright central pixel, star 1
    sigma[1, 8, 8] = 1e-6
    out = build_psf(poked, sigma, 2, masks=masks.copy(),
                    n_iter_analytic=60, n_iter_adabelief=120)
    assert np.isfinite(out["chi2"])
    assert out["chi2"] < 10.0
    assert np.isfinite(np.asarray(out["narrow_psf"])).all()
