"""Batched PSF fitting: parity with the single-frame path + padding."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def frames():
    from lightcurver_tpu.utilities.synthetic import make_star_stamps

    return [make_star_stamps(n_stars=4, n_pix=24, s=2, seed=i,
                             fwhm_x=2.5 + 0.3 * i, fwhm_y=2.5 + 0.3 * i)
            for i in range(3)]


# one shared budget and ONE shared batched reference fit for the whole
# module (each distinct iteration count is a separate compiled program)
N_ANALYTIC, N_PIXELS = 20, 80


@pytest.fixture(scope="module")
def batched_fit(frames):
    from lightcurver_tpu.core.psf.batched import build_psf_batched

    data = np.stack([f["data"] for f in frames])
    sigma = np.stack([f["sigma"] for f in frames])
    return build_psf_batched(data, sigma, 2, n_iter_analytic=N_ANALYTIC,
                             n_iter_adabelief=N_PIXELS)


def test_batched_matches_single(frames, batched_fit):
    from lightcurver_tpu.core.psf.build import build_psf

    batched = batched_fit
    assert batched["narrow_psf"].shape == (3, 48, 48)
    assert (batched["chi2"] < 2.0).all()

    single = build_psf(frames[0]["data"], frames[0]["sigma"], 2,
                       n_iter_analytic=N_ANALYTIC,
                       n_iter_adabelief=N_PIXELS)
    # same data, same budgets -> same minimum; trajectories differ by
    # float-fusion order under vmap and by the MC weight seeds, so the
    # comparison is at convergence level, not bitwise
    np.testing.assert_allclose(
        batched["kwargs_moffat"]["fwhm_x"][0],
        single["kwargs_psf"]["kwargs_moffat"]["fwhm_x"], rtol=8e-2)
    # the FULL PSF (Moffat-dominated) agrees between the two paths at the
    # few-percent-of-peak level; the narrow grid is noise-regularized and
    # not comparable pointwise at these short iteration budgets
    peak = single["full_psf"].max()
    np.testing.assert_allclose(batched["full_psf"][0] / peak,
                               single["full_psf"] / peak, atol=6e-2)
    assert batched["chi2"][0] == pytest.approx(single["chi2"], abs=0.3)


def test_padded_dummy_stars_are_ignored(frames, batched_fit):
    from lightcurver_tpu.core.psf.batched import build_psf_batched

    data = np.stack([f["data"] for f in frames])
    sigma = np.stack([f["sigma"] for f in frames])
    # pad a 5th, fully-masked dummy star on every frame
    pad_shape = (data.shape[0], 1) + data.shape[2:]
    data_p = np.concatenate([data, np.zeros(pad_shape, np.float32)],
                            axis=1)
    sigma_p = np.concatenate([sigma, np.ones(pad_shape, np.float32)],
                             axis=1)
    masks = np.ones_like(data_p, dtype=bool)
    masks[:, -1] = False

    ref = batched_fit
    padded = build_psf_batched(data_p, sigma_p, 2, masks=masks,
                               n_iter_analytic=N_ANALYTIC,
                               n_iter_adabelief=N_PIXELS)
    np.testing.assert_allclose(padded["narrow_psf"],
                               ref["narrow_psf"], atol=3e-4)
    assert (padded["chi2_per_star"][:, -1] == 0.0).all()


def test_reduced_dft_padding_matches_full(frames):
    """dft_pad: the PSF fit at L = m + 2*pad reproduces the L = 2m fit.

    Star positions are centre-pinned (|x0| <= 3 data px by bound), so
    the reduced padding changes the model only by periodic-shift
    leakage measured <= ~1e-5 relative flux (tools/exp_psf_mxu.py) —
    the fitted PSF, chi2 and Moffat parameters must agree far inside
    the fit's own noise.
    """
    from lightcurver_tpu import ops
    from lightcurver_tpu.core.psf.batched import build_psf_batched

    data = np.stack([f["data"] for f in frames])
    sigma = np.stack([f["sigma"] for f in frames])
    prev = ops.get_irfft_backend()
    ops.set_irfft_backend("mxu")
    try:
        full = build_psf_batched(data, sigma, 2,
                                 n_iter_analytic=N_ANALYTIC,
                                 n_iter_adabelief=N_PIXELS)
        red = build_psf_batched(data, sigma, 2,
                                n_iter_analytic=N_ANALYTIC,
                                n_iter_adabelief=N_PIXELS, dft_pad=16)
    finally:
        ops.set_irfft_backend(prev)
    # convergence-level agreement: at this short budget the two programs
    # are on slightly different optimization TRAJECTORIES (noise
    # weights at different L, different f32 fusion orders), same class
    # of difference as batched-vs-single above — the model change
    # itself is ~1e-5, pinned tightly by
    # test_reduced_dft_padding_model_operator_exact below
    np.testing.assert_allclose(red["chi2"], full["chi2"], rtol=2e-2)
    np.testing.assert_allclose(red["kwargs_moffat"]["fwhm_x"],
                               full["kwargs_moffat"]["fwhm_x"], rtol=4e-2)
    # fit outputs agree at trajectory level (same caveat and scale as
    # test_batched_matches_single: two different f32 programs after 120
    # unconverged iterations)
    peak = np.abs(full["full_psf"]).max(axis=(1, 2), keepdims=True)
    np.testing.assert_allclose(red["full_psf"] / peak,
                               full["full_psf"] / peak, atol=3e-2)
    np.testing.assert_allclose(red["chi2_per_star"],
                               full["chi2_per_star"], rtol=8e-2)


def test_reduced_dft_padding_rejects_unsafe_margin():
    from lightcurver_tpu.core.psf.build import psf_fft_length

    with pytest.raises(ValueError, match="safe minimum"):
        psf_fft_length(64, 2, dft_pad=4)
    assert psf_fft_length(64, 2, dft_pad=8) == 80
    assert psf_fft_length(64, 2) == 128


def test_reduced_dft_padding_model_operator_exact():
    """SAME kwargs, both paddings: the model OPERATOR itself agrees to
    ~f32 noise even with positions at the +-3 px bound — the tight pin
    behind the loose fit-trajectory comparison above."""
    import jax.numpy as jnp

    from lightcurver_tpu.core.psf.build import psf_fft_length
    from lightcurver_tpu.core.psf.model import PSFModel
    from lightcurver_tpu.ops.dft import make_dft_mats

    n_pix, s, n_stars = 24, 2, 4
    m = n_pix * s
    model = PSFModel(n_stars, n_pix, s)
    rng = np.random.default_rng(5)
    g = 1e-3 * rng.normal(0, 1, (m * m,)).astype(np.float32)
    kwargs = {
        "kwargs_moffat": {"fwhm_x": jnp.float32(5.0),
                          "fwhm_y": jnp.float32(4.4),
                          "beta": jnp.float32(2.6)},
        "kwargs_gaussian": {
            "a": jnp.asarray([1.0, 2.0, 0.5, 1.5], jnp.float32),
            "x0": jnp.asarray([3.0, -2.937, 0.251, -0.5], jnp.float32),
            "y0": jnp.asarray([-3.0, 2.713, -0.117, 0.5], jnp.float32)},
        "kwargs_background": {"background": jnp.asarray(g)},
        "kwargs_distortion": {"dilation_x": jnp.zeros(3, jnp.float32),
                              "dilation_y": jnp.zeros(3, jnp.float32),
                              "shear": jnp.zeros(3, jnp.float32)},
    }
    mats_full = make_dft_mats(2 * m, m, pool=s)
    mats_red = make_dft_mats(psf_fft_length(m, s, 8), m, pool=s)
    out_full = np.asarray(model.model(kwargs, dft_mats=mats_full))
    out_red = np.asarray(model.model(kwargs, dft_mats=mats_red))
    peak = np.abs(out_full).max()
    assert np.abs(out_red - out_full).max() < 3e-5 * peak
    # flux conservation per star render
    np.testing.assert_allclose(out_red.sum((-1, -2)),
                               out_full.sum((-1, -2)), rtol=3e-5)
    # the full_psf product too
    fp_full = np.asarray(model.full_psf(kwargs, dft_mats=mats_full))
    fp_red = np.asarray(model.full_psf(kwargs, dft_mats=mats_red))
    # the unit-sum PSF peaks near 6e-3, so scale the f32-noise bound
    # by the peak with a 1e-4 factor (absolute delta measured ~3e-7)
    assert np.abs(fp_red - fp_full).max() < 1e-4 * np.abs(fp_full).max()


def test_user_mask_composes_with_finite_guard(frames):
    """Same contract as build_psf (tests/test_nan_robustness.py): a
    user mask marking a NaN pixel good must compose with the finite
    guard, not replace it — the tiny-sigma NaN pixel would otherwise
    enter as a zero-flux measurement at weight 1/1e-12 and explode the
    frame's chi2."""
    from lightcurver_tpu.core.psf.batched import build_psf_batched

    data = np.stack([f["data"] for f in frames])
    sigma = np.stack([f["sigma"] for f in frames])
    masks = np.ones_like(data, dtype=bool)
    data = data.copy()
    sigma = sigma.copy()
    data[1, 2, 12, 12] = np.nan        # frame 1, star 2, central pixel
    sigma[1, 2, 12, 12] = 1e-6
    out = build_psf_batched(data, sigma, 2, masks=masks,
                            n_iter_analytic=20, n_iter_adabelief=60)
    assert np.isfinite(out["chi2"]).all()
    assert (out["chi2"] < 10.0).all()
