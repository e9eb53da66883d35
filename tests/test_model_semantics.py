"""Model semantics: rotations + translations against a float64 numpy
oracle (golden-value style; the reference's model contract at
processes/roi_modelling.py:207-222)."""

import numpy as np
import jax.numpy as jnp


def test_rotated_translated_sources_match_numpy_render():
    from lightcurver_tpu.core.deconv.model import DeconvModel
    from lightcurver_tpu.utilities.synthetic import (moffat_np,
                                                     render_epochs_np)

    n, s, N, M = 16, 2, 3, 2
    m = n * s
    psf = np.broadcast_to(moffat_np(m, s, 3.0, 3.0, 2.5), (N, m, m))
    cx = np.array([2.0, -1.5])
    cy = np.array([1.0, 2.5])
    alpha = np.array([0.0, 30.0, -45.0])
    dx = np.array([0.3, -0.2, 0.1])
    dy = np.array([-0.1, 0.4, 0.0])
    a = np.array([[10.0, 5.0]] * N)

    model = DeconvModel(psf, s, n, N, M)
    kwargs = {
        "kwargs_analytic": {
            "a": jnp.asarray(a.ravel()), "c_x": jnp.asarray(cx),
            "c_y": jnp.asarray(cy), "dx": jnp.asarray(dx),
            "dy": jnp.asarray(dy), "alpha": jnp.asarray(alpha)},
        "kwargs_background": {"h": jnp.zeros(m * m),
                              "mean": jnp.zeros(N)},
        "kwargs_sersic": {},
    }
    out = np.asarray(model.model(kwargs))

    # positions p = R(alpha) c + d, rendered in float64 numpy
    th = np.deg2rad(alpha)[:, None]
    px = np.cos(th) * cx - np.sin(th) * cy + dx[:, None]
    py = np.sin(th) * cx + np.cos(th) * cy + dy[:, None]
    ref = render_epochs_np(psf, a, px, py, s)
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_mean_pedestal_and_background_channel():
    from lightcurver_tpu.core.deconv.model import DeconvModel
    from lightcurver_tpu.utilities.synthetic import moffat_np

    n, s, N = 16, 2, 2
    m = n * s
    psf = np.broadcast_to(moffat_np(m, s, 3.0, 3.0, 2.5), (N, m, m))
    model = DeconvModel(psf, s, n, N, 1)
    h = np.zeros((m, m), np.float32)
    h[m // 2, m // 2] = 4.0  # single fine-pixel spike
    kwargs = {
        "kwargs_analytic": {
            "a": jnp.zeros(N), "c_x": jnp.zeros(1), "c_y": jnp.zeros(1),
            "dx": jnp.zeros(N), "dy": jnp.zeros(N),
            "alpha": jnp.zeros(N)},
        "kwargs_background": {"h": jnp.asarray(h.ravel()),
                              "mean": jnp.asarray([1.0, -2.0])},
        "kwargs_sersic": {},
    }
    out = np.asarray(model.model(kwargs))
    # pedestal: per-epoch constant offsets
    # background: spike convolved with unit-sum PSF -> total flux 4
    np.testing.assert_allclose((out[0] - 1.0).sum(), 4.0, rtol=1e-3)
    np.testing.assert_allclose((out[1] + 2.0).sum(), 4.0, rtol=1e-3)
    # pedestal difference is exactly 3 everywhere
    np.testing.assert_allclose(out[0] - out[1], 3.0, atol=1e-5)


def test_background_only_equals_model_at_zero_flux():
    """background_only must equal model() with all amplitudes zeroed on
    EVERY dispatch path (FFT, matmul-crop, pooled, all-real,
    fixed_h_render) — it is the GLS polish baseline
    (core/fisher.linear_flux_solve) and a divergence would bias every
    polished flux."""
    from lightcurver_tpu.core.deconv.model import DeconvModel
    from lightcurver_tpu.ops.dft import make_dft_mats
    from lightcurver_tpu.utilities.synthetic import moffat_np

    n, s, N, M = 16, 2, 3, 2
    m = n * s
    rng = np.random.default_rng(21)
    psf = np.stack([moffat_np(m, s, 2.6 + 0.2 * i, 2.9, 2.5)
                    for i in range(N)])
    model = DeconvModel(psf, s, n, N, M)
    h = rng.normal(0, 0.3, (m * m,)).astype(np.float32)
    kwargs = {
        "kwargs_analytic": {
            "a": jnp.asarray(rng.uniform(1, 5, N * M), jnp.float32),
            "c_x": jnp.asarray([1.0, -2.0], jnp.float32),
            "c_y": jnp.asarray([0.5, 1.5], jnp.float32),
            "dx": jnp.asarray(rng.uniform(-1, 1, N), jnp.float32),
            "dy": jnp.asarray(rng.uniform(-1, 1, N), jnp.float32),
            "alpha": jnp.asarray([0.0, 15.0, -30.0], jnp.float32)},
        "kwargs_background": {"h": jnp.asarray(h),
                              "mean": jnp.asarray([1.0, -2.0, 0.5],
                                                  jnp.float32)},
        "kwargs_sersic": {},
    }
    zero_flux = {
        **kwargs,
        "kwargs_analytic": {**kwargs["kwargs_analytic"],
                            "a": jnp.zeros(N * M, jnp.float32)},
    }

    mats_crop = make_dft_mats(2 * m, m)
    mats_pool = make_dft_mats(2 * m, m, pool=s)
    variants = {
        "fft": model.consts(),
        "matmul_crop": {**model.spectra(dft_mats=mats_crop),
                        "dft_mats": mats_crop},
        "pooled": {**model.spectra(dft_mats=mats_pool),
                   "dft_mats": mats_pool},
        "all_real": {**model.spectra(dft_mats=mats_pool),
                     **model.spectra_real(dft_mats=mats_pool),
                     "dft_mats": mats_pool},
    }
    fixed = dict(variants["pooled"])
    fixed["fixed_h_render"] = model._h_render(kwargs["kwargs_background"]
                                              ["h"], fixed)
    variants["fixed_h"] = fixed

    for name, consts in variants.items():
        ref = np.asarray(model.model(zero_flux, consts))
        got = np.asarray(model.background_only(kwargs, consts))
        np.testing.assert_array_equal(got, ref, err_msg=name)
        # sanity: the baseline is not trivially zero
        assert np.abs(ref).max() > 0.1, name
