"""Pallas ops: parity with jnp references (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


@pytest.fixture()
def image():
    rng = np.random.default_rng(3)
    return jnp.asarray(rng.normal(0, 1, (64, 64)).astype(np.float32))


def test_starlet_pallas_matches_reference(image):
    from lightcurver_tpu.core.starlet import starlet_transform
    from lightcurver_tpu.ops.starlet_pallas import starlet_transform_pallas

    ref = starlet_transform(image)
    pal = starlet_transform_pallas(image, interpret=True)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref),
                               atol=1e-6)
    # reconstruction stays exact
    np.testing.assert_allclose(np.asarray(pal.sum(0)), np.asarray(image),
                               atol=1e-6)


def test_starlet_op_gradient_matches(image, monkeypatch):
    """The custom VJP of the Pallas path equals AD of the jnp path."""
    from lightcurver_tpu.core.starlet import starlet_transform
    from lightcurver_tpu.ops import starlet_op

    # force the interpret-mode pallas forward inside the AD wrapper
    monkeypatch.setattr(
        starlet_op, "starlet_transform_pallas",
        lambda img, n_scales=None: __import__(
            "lightcurver_tpu.ops.starlet_pallas",
            fromlist=["starlet_transform_pallas"]
        ).starlet_transform_pallas(img, n_scales=n_scales,
                                   interpret=True))

    # 16x16 / 3 scales: interpret-mode pallas is Python-slow, and the
    # VJP-parity property is size-independent
    rng = np.random.default_rng(5)
    small = image[:16, :16]
    W = jnp.asarray(rng.uniform(0.5, 2.0, (4, 16, 16)).astype(np.float32))

    def loss_ref(x):
        return (W * jnp.abs(starlet_transform(x, n_scales=3))).sum()

    def loss_pal(x):
        return (W * jnp.abs(starlet_op._starlet_pallas_ad(x, 3))).sum()

    g_ref = jax.grad(loss_ref)(small)
    g_pal = jax.grad(loss_pal)(small)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               atol=1e-5)


def test_backend_flag_roundtrip():
    from lightcurver_tpu import ops

    assert ops.get_backend() == "xla"
    ops.set_backend("pallas")
    assert ops.get_backend() == "pallas"
    ops.set_backend("xla")


def test_fused_render_interpret_matches_xla():
    """The (parked) fused Pallas renderer is exact vs the XLA render.

    See ops/experimental/fused_render.py: measured slower on hardware, kept as a
    tested experiment.  Runs in interpret mode (CPU backend).
    """
    from lightcurver_tpu.core import convolution as conv
    from lightcurver_tpu.ops.dft import make_dft_mats, irfft2_pool_matmul
    from lightcurver_tpu.ops.experimental.fused_render import _fused_render_fwd_impl

    rng = np.random.default_rng(7)
    N, n, s, M = 8, 16, 2, 3
    m = n * s
    L = 2 * m
    t = jnp.asarray(rng.normal(0, 1, (N, m, m)).astype(np.float32))
    t_hat = jnp.fft.rfft2(t, s=(L, L))
    a = jnp.asarray(rng.uniform(0.5, 2, (N, M)).astype(np.float32))
    px = jnp.asarray(rng.uniform(-2, 2, (N, M)).astype(np.float32))
    py = jnp.asarray(rng.uniform(-2, 2, (N, M)).astype(np.float32))
    h_hat = jnp.fft.rfft2(
        jnp.asarray(rng.normal(0, 0.1, (m, m)).astype(np.float32)),
        s=(L, L))

    r_hat = conv.r_kernel_fft(m, s)
    cp = conv.grid_center_phase(m)
    mats = make_dft_mats(L, m, pool=s)

    spec = conv.point_source_spectrum(m, s, a, px, py)
    total = spec * (t_hat * r_hat) + h_hat * (t_hat * cp)
    ref = np.asarray(irfft2_pool_matmul(total, mats))

    u_re, u_im, v = conv.point_source_ramp_stacks(m, s, a, px, py)
    out = np.asarray(_fused_render_fwd_impl(
        u_re, u_im, v, jnp.real(t_hat), jnp.imag(t_hat), r_hat,
        jnp.real(cp), jnp.imag(cp), jnp.real(h_hat), jnp.imag(h_hat),
        mats["Ayp"], mats["Byp"], mats["Cxp"], mats["Sxp"],
        include_h=True, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_explicit_backend_overrides_global(image, monkeypatch):
    """starlet_transform(backend='pallas') must run the kernel even when
    the ops GLOBAL says 'xla': a Loss cache-keyed 'pallas'
    (core/deconv/loss._build_loss_fn) would otherwise silently compare
    xla against xla in any A/B (round-4 core review)."""
    from lightcurver_tpu import ops
    from lightcurver_tpu.ops import starlet_op
    from lightcurver_tpu.ops.starlet_pallas import starlet_transform_pallas

    calls = []

    def spy(img, n_scales=None):
        calls.append(n_scales)
        return starlet_transform_pallas(img, n_scales=n_scales,
                                        interpret=True)

    monkeypatch.setattr(starlet_op, "starlet_transform_pallas", spy)
    assert ops.get_backend() == "xla"
    out = starlet_op.starlet_transform(image, backend="pallas")
    assert calls == [6]
    assert out.shape[0] == 7
    # and without the override the global still rules (xla -> no call)
    starlet_op.starlet_transform(image)
    assert calls == [6]
