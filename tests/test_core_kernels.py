"""Unit tests of the core math kernels against numpy/scipy oracles.

Mirrors the reference's test strategy of pinning the numerical-core
contract (reference tests/test_starred_calls/test_starred_calls.py), but
at the kernel level since the core is in-repo here.
"""

import numpy as np
import pytest
import scipy.ndimage
import scipy.signal

import jax
import jax.numpy as jnp

from lightcurver_tpu.core.grids import downsample, upsample_transpose, pixel_grid_coords
from lightcurver_tpu.core.profiles import gaussian_r_kernel, moffat_fine_grid
from lightcurver_tpu.core.starlet import starlet_transform, starlet_reconstruct
from lightcurver_tpu.core import convolution as conv
from lightcurver_tpu.core.conventions import fwhm_to_sigma


class TestGrids:
    def test_downsample_flux_conserving(self):
        rng = np.random.default_rng(0)
        fine = rng.normal(size=(48, 48)).astype(np.float32)
        coarse = downsample(jnp.asarray(fine), 2)
        assert coarse.shape == (24, 24)
        np.testing.assert_allclose(float(coarse.sum()), float(fine.sum()), rtol=1e-5)
        # block sums
        np.testing.assert_allclose(
            np.asarray(coarse),
            fine.reshape(24, 2, 24, 2).sum(axis=(1, 3)),
            rtol=1e-4,
        )

    def test_downsample_batched(self):
        fine = jnp.ones((3, 48, 48))
        assert downsample(fine, 4).shape == (3, 12, 12)

    def test_upsample_is_transpose(self):
        rng = np.random.default_rng(1)
        fine = jnp.asarray(rng.normal(size=(16, 16)).astype(np.float32))
        coarse = jnp.asarray(rng.normal(size=(8, 8)).astype(np.float32))
        lhs = float((downsample(fine, 2) * coarse).sum())
        rhs = float((fine * upsample_transpose(coarse, 2)).sum())
        np.testing.assert_allclose(lhs, rhs, rtol=1e-5)

    def test_grid_coords_center(self):
        x, y = pixel_grid_coords(48, 2)
        # center of the fine grid is the origin, in data-pixel units
        assert abs(float(x[0, 0]) - (-(48 - 1) / 2 / 2)) < 1e-6
        np.testing.assert_allclose(float(x.mean()), 0.0, atol=1e-6)
        np.testing.assert_allclose(float(y.mean()), 0.0, atol=1e-6)


class TestProfiles:
    def test_gaussian_unit_flux(self):
        r = gaussian_r_kernel(64, 2)
        np.testing.assert_allclose(float(r.sum()), 1.0, atol=1e-5)

    def test_gaussian_shift_moves_centroid(self):
        m, s = 64, 2
        r = gaussian_r_kernel(m, s, x0=1.25, y0=-0.5)
        x, y = pixel_grid_coords(m, s)
        cx = float((r * x).sum() / r.sum())
        cy = float((r * y).sum() / r.sum())
        np.testing.assert_allclose(cx, 1.25, atol=1e-4)
        np.testing.assert_allclose(cy, -0.5, atol=1e-4)

    def test_moffat_flux_and_fwhm(self):
        m, s = 256, 2  # large stamp so truncation is negligible
        beta = 3.0
        # place the peak exactly on fine pixel (128, 128): coord 0.25 data px
        prof = moffat_fine_grid(m, s, fwhm_x=3.0, fwhm_y=3.0, beta=beta,
                                x0=0.25, y0=0.25)
        np.testing.assert_allclose(float(prof.sum()), 1.0, atol=2e-2)
        center_val = float(prof[128, 128])
        assert center_val == float(prof.max())
        # half max at radius fwhm / 2 = 1.5 data px = 3 fine px along x
        half_val = float(prof[128, 128 + int(1.5 * s)])
        np.testing.assert_allclose(half_val / center_val, 0.5, atol=0.01)


class TestStarlet:
    def test_exact_reconstruction(self):
        rng = np.random.default_rng(2)
        img = jnp.asarray(rng.normal(size=(64, 64)).astype(np.float32))
        coeffs = starlet_transform(img, n_scales=5)
        assert coeffs.shape == (6, 64, 64)
        rec = starlet_reconstruct(coeffs)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(img), atol=1e-4)

    def test_first_scale_matches_oracle(self):
        """Finest detail scale = img - B3-smoothed img (mirror boundary)."""
        rng = np.random.default_rng(3)
        img = rng.normal(size=(32, 32)).astype(np.float32)
        k = np.array([1, 4, 6, 4, 1], dtype=np.float32) / 16.0
        # jnp 'symmetric' padding == scipy 'reflect' (edge-including)
        sm = scipy.ndimage.correlate1d(img, k, axis=0, mode="reflect")
        sm = scipy.ndimage.correlate1d(sm, k, axis=1, mode="reflect")
        coeffs = starlet_transform(jnp.asarray(img), n_scales=2)
        np.testing.assert_allclose(np.asarray(coeffs[0]), img - sm, atol=1e-4)

    def test_smooth_image_energy_in_coarse(self):
        x, y = np.meshgrid(np.arange(32), np.arange(32))
        img = jnp.asarray(np.exp(-((x - 16.0) ** 2 + (y - 16.0) ** 2) / 200.0))
        coeffs = starlet_transform(img, n_scales=4)
        # most energy in coarse for a very smooth image
        assert float(jnp.abs(coeffs[-1]).sum()) > float(jnp.abs(coeffs[0]).sum())


class TestConvolution:
    def test_convolve_grid_matches_fourier_shift_delta(self):
        """A delta at pixel (i0, j0) spawns a peak-aligned PSF copy.

        Even m: the center c = (m-1)/2 is FRACTIONAL, so the expected
        output is a half-pixel-shifted PSF copy that has no exact
        integer-lattice counterpart — the oracle is an explicit Fourier
        phase ramp (the independent scipy crop comparison lives in
        test_convolve_grid_matches_scipy_odd_support below)."""
        m = 32
        rng = np.random.default_rng(4)
        t = np.zeros((m, m), dtype=np.float32)
        t[14:19, 14:19] = rng.random((5, 5)).astype(np.float32)
        img = np.zeros((m, m), dtype=np.float32)
        img[20, 9] = 1.0
        t_hat = conv.psf_fft_for_grid(jnp.asarray(t))
        out = conv.convolve_grid(jnp.asarray(img), t_hat)
        c = (m - 1) / 2.0
        full = np.fft.rfft2(t, s=(2 * m, 2 * m))
        fy = np.fft.fftfreq(2 * m).reshape(-1, 1)
        fx = np.fft.rfftfreq(2 * m).reshape(1, -1)
        shift = np.exp(-2j * np.pi * (fy * (20 - c) + fx * (9 - c)))
        oracle = np.fft.irfft2(full * shift, s=(2 * m, 2 * m))[:m, :m]
        np.testing.assert_allclose(np.asarray(out), oracle, atol=1e-4)

    def test_convolve_grid_matches_scipy_odd_support(self):
        """Fully INDEPENDENT scipy cross-check on an odd grid.

        With m odd the center c = (m-1)/2 is an integer, so the
        peak-aligned convention maps exactly onto a crop of
        scipy.signal.fftconvolve's full output:
        out[y, x] = full[y + c, x + c].  This catches any convention
        error shared between convolve_grid and a hand-built Fourier
        ramp oracle (the two use the same rfft machinery)."""
        m = 33
        c = (m - 1) // 2
        rng = np.random.default_rng(7)
        t = np.zeros((m, m), dtype=np.float32)
        t[c - 2:c + 3, c - 2:c + 3] = rng.random((5, 5)).astype(np.float32)
        img = rng.random((m, m)).astype(np.float32)  # arbitrary image
        t_hat = conv.psf_fft_for_grid(jnp.asarray(t))
        out = conv.convolve_grid(jnp.asarray(img), t_hat)
        full = scipy.signal.fftconvolve(img, t, mode="full")
        np.testing.assert_allclose(np.asarray(out),
                                   full[c:c + m, c:c + m], atol=1e-4)

    def test_convolution_linearity_and_flux(self):
        m = 32
        rng = np.random.default_rng(5)
        t = rng.random((m, m)).astype(np.float32)
        t /= t.sum()
        img = np.zeros((m, m), dtype=np.float32)
        img[10:22, 10:22] = rng.random((12, 12)).astype(np.float32)
        t_hat = conv.psf_fft_for_grid(jnp.asarray(t))
        out = conv.convolve_grid(jnp.asarray(img), t_hat)
        # flux not conserved exactly (psf tails leave the crop) but close
        assert abs(float(out.sum()) - img.sum()) / img.sum() < 0.35

    def test_point_source_rendering_position_and_flux(self):
        """a * (t * r)(. - p) rendered via phase ramps: centroid and flux."""
        m, s = 64, 2
        n = m // s
        # narrow psf: centered Gaussian
        t = np.asarray(gaussian_r_kernel(m, s))  # unit flux, centered
        t_hat = conv.psf_fft(jnp.asarray(t))
        r_hat = conv.r_kernel_fft(m, s)
        a = jnp.asarray([2.5])
        px = jnp.asarray([1.5])
        py = jnp.asarray([-2.25])
        spec = conv.point_source_spectrum(m, s, a, px, py)
        fine = conv.render_from_fft(spec * t_hat * r_hat, m)
        np.testing.assert_allclose(float(fine.sum()), 2.5, rtol=1e-4)
        x, y = pixel_grid_coords(m, s)
        cx = float((fine * x).sum() / fine.sum())
        cy = float((fine * y).sum() / fine.sum())
        np.testing.assert_allclose(cx, 1.5, atol=1e-3)
        np.testing.assert_allclose(cy, -2.25, atol=1e-3)
        # downsampled flux also conserved
        data = downsample(fine, s)
        np.testing.assert_allclose(float(data.sum()), 2.5, rtol=1e-4)

    def test_grid_channel_alignment_matches_point_channel(self):
        """h = delta at the fine pixel nearest a point source position must
        render (almost) the same image as the r-convolved point source,
        modulo the r smoothing."""
        m, s = 64, 2
        t = np.asarray(gaussian_r_kernel(m, s))
        t_hat_grid = conv.psf_fft_for_grid(jnp.asarray(t))
        h = np.zeros((m, m), dtype=np.float32)
        h[40, 24] = 1.0
        out = conv.convolve_grid(jnp.asarray(h), t_hat_grid)
        x, y = pixel_grid_coords(m, s)
        cx = float((out * x).sum() / out.sum())
        cy = float((out * y).sum() / out.sum())
        c = (m - 1) / 2.0
        np.testing.assert_allclose(cx, (24 - c) / s, atol=1e-3)
        np.testing.assert_allclose(cy, (40 - c) / s, atol=1e-3)
