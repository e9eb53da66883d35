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
