"""MXU DFT ops: parity with the FFT reference (CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest


@pytest.fixture()
def spectrum():
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (5, 64, 64)).astype(np.float32)
    return jnp.fft.rfft2(jnp.asarray(x))


def test_irfft2_crop_matmul_matches_fft(spectrum):
    from lightcurver_tpu.ops.dft import (make_irfft2_crop_mats,
                                         irfft2_crop_matmul)

    L, m = 64, 32
    ref = jnp.fft.irfft2(spectrum, s=(L, L))[..., :m, :m]
    mats = make_irfft2_crop_mats(L, m)
    out = irfft2_crop_matmul(spectrum, mats)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5)


@pytest.mark.parametrize("L,m", [(15, 6), (21, 8)])
def test_irfft2_crop_matmul_odd_length(L, m):
    """Odd L has no unique Nyquist bin: all non-DC half-spectrum columns
    double (advisor round-1 finding — w[1:-1]=2 was even-L-only)."""
    from lightcurver_tpu.ops.dft import (make_irfft2_crop_mats,
                                         irfft2_crop_matmul)

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (L, L)).astype(np.float32))
    spec = jnp.fft.rfft2(x)
    ref = jnp.fft.irfft2(spec, s=(L, L))[:m, :m]
    out = irfft2_crop_matmul(spec, make_irfft2_crop_mats(L, m))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5)


def test_rfft2_pad_matmul_matches_fft():
    from lightcurver_tpu.ops.dft import (make_rfft2_pad_mats,
                                         rfft2_pad_matmul)

    rng = np.random.default_rng(1)
    m, L = 24, 48
    x = jnp.asarray(rng.normal(0, 1, (3, m, m)).astype(np.float32))
    ref = jnp.fft.rfft2(x, s=(L, L))
    out = rfft2_pad_matmul(x, make_rfft2_pad_mats(L, m))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4)


@pytest.mark.parametrize("s", [2, 4])
def test_irfft2_pool_matmul_matches_fft_plus_sumpool(spectrum, s):
    """The folded crop+sum-pool equals irfft2 -> crop -> block sum."""
    from lightcurver_tpu.ops.dft import (make_irfft2_pool_mats,
                                         irfft2_pool_matmul)

    L, m = 64, 32
    n = m // s
    fine = np.asarray(jnp.fft.irfft2(spectrum, s=(L, L))[..., :m, :m])
    ref = fine.reshape(fine.shape[0], n, s, n, s).sum(axis=(2, 4))
    out = irfft2_pool_matmul(spectrum, make_irfft2_pool_mats(L, m, s))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_roundtrip_through_both():
    """rfft2_pad -> multiply -> irfft2_crop equals the FFT convolution."""
    from lightcurver_tpu.ops.dft import (make_dft_mats, rfft2_pad_matmul,
                                         irfft2_crop_matmul)

    rng = np.random.default_rng(2)
    m, L = 32, 64
    h = jnp.asarray(rng.normal(0, 1, (m, m)).astype(np.float32))
    k_hat = jnp.fft.rfft2(
        jnp.asarray(rng.normal(0, 0.1, (m, m)).astype(np.float32)),
        s=(L, L))
    ref = jnp.fft.irfft2(jnp.fft.rfft2(h, s=(L, L)) * k_hat,
                         s=(L, L))[:m, :m]
    mats = make_dft_mats(L, m)
    out = irfft2_crop_matmul(rfft2_pad_matmul(h, mats) * k_hat, mats)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4)


def test_irfft2_pool_shift_matmul_shared_spectrum():
    """Rank-1 modulated render == spectrum-materializing render (PSF path)."""
    from lightcurver_tpu.core import convolution as conv
    from lightcurver_tpu.ops.dft import (make_irfft2_pool_mats,
                                         irfft2_pool_matmul,
                                         irfft2_pool_shift_matmul)

    rng = np.random.default_rng(3)
    m, s, N = 32, 2, 4
    L = conv.pad_len(m)
    t = jnp.asarray(rng.normal(0, 1, (m, m)).astype(np.float32))
    S = jnp.fft.rfft2(t, s=(L, L))
    a = jnp.asarray(rng.uniform(0.5, 2.0, N).astype(np.float32))
    px = jnp.asarray(rng.uniform(-2, 2, N).astype(np.float32))
    py = jnp.asarray(rng.uniform(-2, 2, N).astype(np.float32))

    spec = conv.point_source_spectrum(m, s, a[:, None], px[:, None],
                                      py[:, None])
    mats = make_irfft2_pool_mats(L, m, s)
    ref = irfft2_pool_matmul(spec * S, mats)

    u_re, u_im, v_re, v_im = conv.point_source_ramps(m, s, a, px, py)
    out = irfft2_pool_shift_matmul(jnp.real(S), jnp.imag(S),
                                   u_re, u_im, v_re, v_im, mats)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=2e-5)


def test_irfft2_pool_shift_matmul_batched_spectrum():
    """Per-epoch spectra (star-photometry path): batched_spectrum=True."""
    from lightcurver_tpu.core import convolution as conv
    from lightcurver_tpu.ops.dft import (make_irfft2_pool_mats,
                                         irfft2_pool_matmul,
                                         irfft2_pool_shift_matmul)

    rng = np.random.default_rng(4)
    m, s, N = 32, 2, 3
    L = conv.pad_len(m)
    t = jnp.asarray(rng.normal(0, 1, (N, m, m)).astype(np.float32))
    S = jnp.fft.rfft2(t, s=(L, L))
    a = jnp.asarray(rng.uniform(0.5, 2.0, N).astype(np.float32))
    px = jnp.asarray(rng.uniform(-2, 2, N).astype(np.float32))
    py = jnp.asarray(rng.uniform(-2, 2, N).astype(np.float32))

    spec = conv.point_source_spectrum(m, s, a[:, None], px[:, None],
                                      py[:, None])
    mats = make_irfft2_pool_mats(L, m, s)
    ref = irfft2_pool_matmul(spec * S, mats)

    u_re, u_im, v_re, v_im = conv.point_source_ramps(m, s, a, px, py)
    out = irfft2_pool_shift_matmul(jnp.real(S), jnp.imag(S),
                                   u_re, u_im, v_re, v_im, mats,
                                   batched_spectrum=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=2e-5)


def test_deconv_model_fast_paths_match_fft_reference():
    """M=1 modulated render + fixed_h_render == the plain FFT model."""
    from lightcurver_tpu.core.deconv.model import setup_model
    from lightcurver_tpu.ops.dft import make_dft_mats

    rng = np.random.default_rng(5)
    N, n, s = 6, 16, 2
    m = n * s
    data = rng.normal(10, 1, (N, n, n)).astype(np.float32)
    yy, xx = np.mgrid[:m, :m] - (m - 1) / 2.0
    psf = np.exp(-(xx**2 + yy**2) / 6.0).astype(np.float32)
    psf = np.broadcast_to(psf, (N, m, m)).copy()
    model, kwargs, *_ = setup_model(data, data, psf, [0.4], [-0.3], s)
    kwargs["kwargs_analytic"]["dx"] = jnp.asarray(
        rng.uniform(-1, 1, N), jnp.float32)
    kwargs["kwargs_analytic"]["dy"] = jnp.asarray(
        rng.uniform(-1, 1, N), jnp.float32)
    kwargs["kwargs_background"]["h"] = jnp.asarray(
        rng.normal(0, 0.1, m * m), jnp.float32)

    ref = np.asarray(model.model(kwargs, model.consts()))
    mats = make_dft_mats(2 * m, m, pool=s)
    c = {**model.consts(), "dft_mats": mats}
    out_fast = np.asarray(model.model(kwargs, c))
    np.testing.assert_allclose(out_fast, ref, rtol=1e-4, atol=1e-4)

    hr = model._h_render(kwargs["kwargs_background"]["h"], c)
    out_fixed = np.asarray(model.model(kwargs, {**c,
                                                "fixed_h_render": hr}))
    np.testing.assert_allclose(out_fixed, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("n_sources", [1, 3])
@pytest.mark.parametrize("fixed_h", [False, True])
def test_deconv_all_real_t_layout_matches_fft(n_sources, fixed_h):
    """The all-real raw-spectrum hot path == the complex FFT model.

    Separable r-kernel / center-phase folding (core/deconv/model.py
    _model_all_real) must be exact for any source count, with the
    background channel free or fixed.
    """
    from lightcurver_tpu.core.deconv.model import setup_model
    from lightcurver_tpu.ops.dft import make_dft_mats

    rng = np.random.default_rng(11)
    N, n, s = 7, 24, 2
    m = n * s
    data = rng.normal(10, 1, (N, n, n)).astype(np.float32)
    yy, xx = np.mgrid[:m, :m] - (m - 1) / 2.0
    psf = np.exp(-(xx**2 + yy**2) / 6.0).astype(np.float32)
    psf = np.broadcast_to(psf, (N, m, m)).copy()
    xs = [0.3, -1.1, 0.7][:n_sources]
    ys = [-0.2, 0.8, 1.4][:n_sources]
    model, kwargs, *_ = setup_model(data, data, psf, xs, ys, s)
    kwargs["kwargs_analytic"]["dx"] = jnp.asarray(
        rng.uniform(-1, 1, N), jnp.float32)
    kwargs["kwargs_analytic"]["dy"] = jnp.asarray(
        rng.uniform(-1, 1, N), jnp.float32)
    kwargs["kwargs_analytic"]["alpha"] = jnp.asarray(
        rng.uniform(-5, 5, N), jnp.float32)
    kwargs["kwargs_background"]["h"] = jnp.asarray(
        rng.normal(0, 0.1, m * m), jnp.float32)
    kwargs["kwargs_background"]["mean"] = jnp.asarray(
        rng.normal(0, 0.1, N), jnp.float32)

    ref = np.asarray(model.model(kwargs, model.consts()))
    mats = make_dft_mats(2 * m, m, pool=s)
    c = {**model.consts(), **model.spectra_real(), "dft_mats": mats}
    if fixed_h:
        c["fixed_h_render"] = model._h_render(
            kwargs["kwargs_background"]["h"], c)
    out = np.asarray(model.model(kwargs, c))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
