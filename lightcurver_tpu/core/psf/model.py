"""Narrow-PSF forward model: analytic Moffat + free pixel grid.

The PSF of a frame is fitted jointly on N star stamps:

    model_i = a_i * down( conv(t_i, r(. - (x0_i, y0_i))) )

with ``t = normalize(Moffat(fwhm_x, fwhm_y, beta) + g)`` the NARROW PSF on
the fine grid (normalized to unit sum inside the evaluation, which removes
the amplitude/normalization degeneracy), ``g`` a free pixel grid
("background" channel in the parameter naming, for contract parity), and
``r`` the target-resolution Gaussian carrying the per-star sub-pixel
shifts analytically.  When field distortion is enabled, ``t_i`` is the
reference ``t`` warped by the polynomial affine field at the star's
position (core/psf/distortion.py).

The FULL PSF (what a star looks like on the fine grid) is ``conv(t, r)``.

Parameter pytree:
    kwargs_moffat:     fwhm_x, fwhm_y, beta            (scalars)
    kwargs_gaussian:   a (N), x0 (N), y0 (N)
    kwargs_background: background (m*m)                 (the grid g)
    kwargs_distortion: dilation_x, dilation_y, shear    (poly coeffs)
"""

import jax.numpy as jnp

from ..grids import downsample
from ..profiles import moffat_fine_grid
from .. import convolution as conv
from .distortion import distortion_fields_at, warp_psf


def _forward_fft(t, dft_mats):
    if dft_mats is not None:
        from ...ops.dft import rfft2_pad_matmul

        return rfft2_pad_matmul(t, dft_mats)
    return conv.psf_fft(t)


class PSFModel:
    """Static configuration for a joint N-star narrow-PSF fit."""

    def __init__(self, n_stars, image_size, subsampling_factor,
                 field_distortion=False, stamp_coordinates=None):
        self.n_stars = int(n_stars)
        self.image_size = int(image_size)
        self.s = int(subsampling_factor)
        self.m = self.image_size * self.s
        self.field_distortion = bool(field_distortion)
        self.stamp_coordinates = (
            jnp.asarray(stamp_coordinates, dtype=jnp.float32)
            if stamp_coordinates is not None else None)

    def _r_hat(self, L=None):
        # computed IN-GRAPH on every call: cheap (elementwise exp over the
        # half-spectrum) and keeps large constants out of traced programs
        # (see core/deconv/model.py module docstring)
        return conv.r_kernel_fft(self.m, self.s, L=L)

    @staticmethod
    def _mats_L(dft_mats):
        """FFT length of a dft_mats dict (None -> default 2m padding).

        The PSF fit may run at REDUCED zero-padding (star positions are
        centre-pinned, |x0| <= 3 data px by bound — build_psf(dft_pad)),
        so every frequency-domain helper must follow the matrices'
        actual L instead of assuming pad_len(m).
        """
        return None if dft_mats is None else dft_mats["Ay"].shape[-1]

    def narrow_psf(self, kwargs):
        """The normalized narrow PSF t on the fine grid (field center)."""
        km = kwargs["kwargs_moffat"]
        g = kwargs["kwargs_background"]["background"].reshape(self.m, self.m)
        t = moffat_fine_grid(self.m, self.s, km["fwhm_x"], km["fwhm_y"],
                             km["beta"]) + g
        return t / t.sum()

    def full_psf(self, kwargs, dft_mats=None):
        """conv(t, r): the PSF as seen by a perfectly centered star."""
        t = self.narrow_psf(kwargs)
        if dft_mats is not None:
            from ...ops.dft import irfft2_crop_matmul

            t_hat = _forward_fft(t, dft_mats) \
                * self._r_hat(L=self._mats_L(dft_mats))
            return irfft2_crop_matmul(t_hat, dft_mats)
        t_hat = conv.psf_fft(t) * self._r_hat()
        L = conv.pad_len(self.m)
        full = jnp.fft.irfft2(t_hat, s=(L, L))[: self.m, : self.m]
        return full

    def _per_star_psfs(self, kwargs, stamp_coordinates=None):
        """(N, m, m) narrow PSFs, distorted per star if enabled."""
        t = self.narrow_psf(kwargs)
        if stamp_coordinates is None:
            stamp_coordinates = self.stamp_coordinates
        if not self.field_distortion or stamp_coordinates is None:
            return jnp.broadcast_to(t, (self.n_stars, self.m, self.m))
        dx, dy, sh = distortion_fields_at(
            kwargs["kwargs_distortion"], stamp_coordinates)
        import jax

        return jax.vmap(lambda a, b, c: warp_psf(t, a, b, c))(dx, dy, sh)

    def model(self, kwargs, stamp_coordinates=None, dft_mats=None):
        """Modelled star stamps, (N, n, n).

        ``stamp_coordinates`` / ``dft_mats`` may be passed as runtime
        arguments so jitted callers keep them out of closure constants.
        """
        kg = kwargs["kwargs_gaussian"]
        if self.field_distortion:
            t_stack = self._per_star_psfs(kwargs, stamp_coordinates)
            t_hat = _forward_fft(t_stack, dft_mats)    # (N, L, L/2+1)
        else:
            if dft_mats is not None and "Ayp" in dft_mats:
                # rank-1 fast path: each star is ONE shifted copy of the
                # shared spectrum, so the per-star phase ramps (with the
                # separable r-kernel folded in) modulate the pooled
                # inverse matrices directly — the (N, L, L/2+1) per-star
                # spectrum is never materialized, and the RAW narrow-PSF
                # spectrum is used as an explicit (re, im) pair (no
                # complex extraction copies)
                from ...ops.dft import (irfft2_pool_shift_matmul,
                                        rfft2_pad_matmul_parts)

                t_re, t_im = rfft2_pad_matmul_parts(
                    self.narrow_psf(kwargs), dft_mats)
                L = self._mats_L(dft_mats)
                ry, rx = conv.r_kernel_fft_1d(self.m, self.s, L=L)
                u_re, u_im, v_re, v_im = conv.point_source_ramps(
                    self.m, self.s, kg["a"], kg["x0"], kg["y0"],
                    ry=ry, rx=rx, L=L)
                return irfft2_pool_shift_matmul(
                    t_re, t_im, u_re, u_im, v_re, v_im, dft_mats)
            # one shared PSF: one forward FFT instead of N identical ones
            t_hat = _forward_fft(self.narrow_psf(kwargs), dft_mats)
        spec = conv.point_source_spectrum(
            self.m, self.s, kg["a"][:, None], kg["x0"][:, None],
            kg["y0"][:, None], L=self._mats_L(dft_mats))
        total_hat = spec * t_hat * self._r_hat(L=self._mats_L(dft_mats))
        if dft_mats is not None and "Ayp" in dft_mats:
            # crop + sum-pool folded into the inverse matmuls: stamps
            # land directly on the data grid (ops/dft.py)
            from ...ops.dft import irfft2_pool_matmul

            return irfft2_pool_matmul(total_hat, dft_mats)
        if dft_mats is not None:
            from ...ops.dft import irfft2_crop_matmul

            fine = irfft2_crop_matmul(total_hat, dft_mats)
        else:
            fine = conv.render_from_fft(total_hat, self.m)
        return downsample(fine, self.s)
