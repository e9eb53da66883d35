"""Multi-epoch forward model ("deconvolution") of a blended region.

Replaces the STARRED ``setup_model`` / ``Deconv`` contract the reference
exercises at processes/star_photometry.py:66-69 and
processes/roi_modelling.py:213-222:

Per epoch ``e`` the data stamp is modelled as

    D_e = down( conv(t_e, h) + sum_j a_{e,j} (t_e * r)(. - p_{e,j}) ) + mean_e

with
    - ``t_e`` the (narrow) PSF of epoch ``e`` on the fine grid,
    - ``h`` the pixelated background channel, common to all epochs,
    - ``r`` the target-resolution Gaussian (analytic, FWHM 2 fine px),
    - ``p_{e,j} = R(alpha_e) c_j + (dx_e, dy_e)`` the source positions:
      common sky positions ``c`` rotated per epoch by the frame's position
      angle and shifted by the per-epoch pointing offset,
    - ``down`` flux-conserving sum-pooling.

Parameter pytree (kwargs), shapes for N epochs / M point sources and an
``m x m`` fine grid:
    kwargs_analytic: a (N*M), c_x (M), c_y (M), dx (N), dy (N), alpha (N)
    kwargs_background: h (m*m), mean (N)
    kwargs_sersic: {}                       (API parity; unused)

``a`` is ordered ``a[e * M + j]`` so per-source light curves are
``a[j::M]``, matching the reference's extraction at
processes/roi_modelling.py:462.

TPU design notes:
- one optimizer iteration costs a single rfft2 of ``h`` (shared across
  epochs) plus one batched irfft2 over epochs; everything else is
  elementwise and fuses.  The epoch axis is the sharding axis (parallel/).
- every large array (data, noise, PSF spectra) is threaded through traced
  code as an ARGUMENT, never a closure: the TPU backend in this
  environment compiles embedded array constants pathologically (hours or
  UNIMPLEMENTED).  Evaluation methods therefore take a ``consts`` dict;
  the eager convenience path (``model.model(kwargs)``) builds it on the
  fly for diagnostics/parity use.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..grids import downsample
from ..profiles import gaussian_r_kernel
from .. import convolution as conv


def pad_psf_to(narrow_psf, m):
    """Center-pad per-epoch narrow PSFs (..., mp, mp) to the fine grid (m, m).

    Both grids share the center-origin convention; mp and m have the same
    parity (both are n * s with even products in practice), so the offset
    is integer and no resampling happens.
    """
    mp = narrow_psf.shape[-1]
    if mp == m:
        return narrow_psf
    if mp > m:
        lo = (mp - m) // 2
        return narrow_psf[..., lo:lo + m, lo:lo + m]
    off = (m - mp) // 2
    pad = [(0, 0)] * (narrow_psf.ndim - 2) + [(off, m - mp - off)] * 2
    return jnp.pad(narrow_psf, pad)


class DeconvModel:
    """Static model configuration + the PSF stack (normalized, fine grid).

    All evaluation methods are pure functions of ``(kwargs, consts)`` so
    they can be jitted / vmapped / shard_mapped with the arrays passed as
    arguments (see module docstring).  ``consts`` needs keys ``ps_hat``
    (point-source channel spectra) and ``grid_hat`` (pixel-channel
    spectra), produced by :meth:`spectra`.
    """

    def __init__(self, psf, subsampling_factor, image_size, n_epochs,
                 n_sources):
        """
        Args:
            psf: (N, mp, mp) per-epoch narrow PSFs (fine grid).
            subsampling_factor: int s.
            image_size: int n, data stamp side.
            n_epochs: N.
            n_sources: M.
        """
        self.s = int(subsampling_factor)
        self.image_size = int(image_size)
        self.n_epochs = int(n_epochs)
        self.n_sources = int(n_sources)
        self.m = self.image_size * self.s

        if psf is not None:
            psf = jnp.asarray(psf, dtype=jnp.float32)
            psf = pad_psf_to(psf, self.m)
            # normalize each epoch's PSF to unit flux so `a` is total flux
            self.psf_pad = psf / psf.sum(axis=(-2, -1), keepdims=True)
        else:
            self.psf_pad = None
        self._consts_cache = None

    @classmethod
    def for_eval(cls, subsampling_factor, image_size, n_epochs, n_sources):
        """PSF-less instance for pure evaluation with explicit consts.

        All evaluation methods only need the static configuration when
        the spectra arrive via ``consts``; this enables sharing one
        traced loss function across problems of identical geometry.
        """
        return cls(None, subsampling_factor, image_size, n_epochs,
                   n_sources)

    def config(self):
        """Hashable static configuration (for loss-function caching)."""
        return (self.s, self.image_size, self.n_epochs, self.n_sources)

    # ---- array preparation ---------------------------------------------

    def spectra(self, psf_pad=None, dft_mats=None):
        """Per-epoch channel spectra: ``{'ps_hat', 'grid_hat'}``.

        ``ps_hat`` multiplies point-source phase ramps (includes the target
        Gaussian r); ``grid_hat`` convolves the gridded ``h`` channel
        (includes the center-alignment phase).  Computable in-graph.

        With ``dft_mats`` the forward transform runs as MXU matmuls
        instead of the FFT op — faster on TPU, and (unlike FFT, which
        XLA SPMD cannot partition and all-gathers around) it keeps a
        batch-sharded program collective-free.
        """
        if psf_pad is None:
            psf_pad = self.psf_pad
        t_hat = self._psf_fft(psf_pad, dft_mats)
        return {
            "ps_hat": t_hat * conv.r_kernel_fft(self.m, self.s),
            "grid_hat": t_hat * conv.grid_center_phase(self.m),
        }

    @staticmethod
    def _psf_fft(psf_pad, dft_mats=None):
        if dft_mats is None:
            return conv.psf_fft(psf_pad)
        from ...ops.dft import rfft2_pad_matmul

        return rfft2_pad_matmul(psf_pad, dft_mats)

    def consts(self):
        """Cached eager spectra for the convenience (non-jit) API."""
        if self._consts_cache is None:
            self._consts_cache = self.spectra()
        return self._consts_cache

    def spectra_real(self, psf_pad=None, dft_mats=None):
        """RAW per-epoch PSF spectra as explicit (re, im) f32 arrays.

        The all-real hot path: the separable r-kernel and center phase
        fold into the 1-D ramps / the small shared background spectrum
        (see :meth:`model`), so one optimizer iteration touches only
        these raw spectra — no premultiplied ps_hat/grid_hat reads and
        no complex extraction copies (measured on the 1000-epoch fit).
        ``dft_mats``: see :meth:`spectra`.
        """
        if psf_pad is None:
            psf_pad = self.psf_pad
        if dft_mats is not None:
            from ...ops.dft import rfft2_pad_matmul_parts

            t_re, t_im = rfft2_pad_matmul_parts(psf_pad, dft_mats)
            return {"t_re": t_re, "t_im": t_im}
        t_hat = conv.psf_fft(psf_pad)
        return {"t_re": jnp.real(t_hat), "t_im": jnp.imag(t_hat)}

    # ---- geometry -----------------------------------------------------

    def source_positions(self, kwargs):
        """Per-epoch source positions p_{e,j} in data pixels (center origin).

        Returns (px, py), each (N, M).
        """
        ka = kwargs["kwargs_analytic"]
        cx = ka["c_x"]
        cy = ka["c_y"]
        th = jnp.deg2rad(ka["alpha"])[:, None]
        px = jnp.cos(th) * cx - jnp.sin(th) * cy + ka["dx"][:, None]
        py = jnp.sin(th) * cx + jnp.cos(th) * cy + ka["dy"][:, None]
        return px, py

    # ---- evaluation ---------------------------------------------------

    def _h_render(self, h_flat, consts):
        """Pooled data-grid render of the gridded channel: down(conv(t_e, h))."""
        m, s = self.m, self.s
        h = h_flat.reshape(m, m)
        mats = consts.get("dft_mats")
        if mats is not None:
            from ...ops.dft import rfft2_pad_matmul

            h_hat = rfft2_pad_matmul(h, mats)
        else:
            L = conv.pad_len(m)
            h_hat = jnp.fft.rfft2(h, s=(L, L))              # one FFT, shared
        prod = h_hat * consts["grid_hat"]
        if mats is not None and "Ayp" in mats:
            from ...ops.dft import irfft2_pool_matmul

            return irfft2_pool_matmul(prod, mats)
        if mats is not None:
            from ...ops.dft import irfft2_crop_matmul

            return downsample(irfft2_crop_matmul(prod, mats), s)
        return downsample(conv.render_from_fft(prod, m), s)

    def model(self, kwargs, consts=None):
        """Modelled data stamps, (N, n, n).

        When ``consts`` carries ``fixed_h_render`` (the loop-invariant
        render of a FIXED background channel, precomputed by
        deconv.Loss), the whole per-iteration ``h`` convolution chain is
        skipped.  Single-source problems (star photometry) additionally
        render through the rank-1 modulated inverse matrices
        (ops/dft.irfft2_pool_shift_matmul) so the per-epoch point-source
        spectrum is never materialized.
        """
        if consts is None:
            consts = self.consts()
        m, s, M = self.m, self.s, self.n_sources
        ka = kwargs["kwargs_analytic"]
        kb = kwargs["kwargs_background"]
        a = ka["a"].reshape(self.n_epochs, M)
        px, py = self.source_positions(kwargs)
        mats = consts.get("dft_mats")
        pooled = mats is not None and "Ayp" in mats
        fixed_h = consts.get("fixed_h_render")

        if pooled and "t_re" in consts:
            return self._model_all_real(a, px, py, kb, consts, mats,
                                        fixed_h)
        if pooled and M == 1:
            # rank-1 fast path: one shifted copy of the per-epoch PSF
            # spectrum per epoch — the ramps modulate the pooled inverse
            # matrices; no (N, L, L/2+1) spectrum is built this iteration
            from ...ops.dft import irfft2_pool_shift_matmul

            u_re, u_im, v_re, v_im = conv.point_source_ramps(
                m, s, a[:, 0], px[:, 0], py[:, 0])
            S = consts["ps_hat"]
            data = irfft2_pool_shift_matmul(
                jnp.real(S), jnp.imag(S), u_re, u_im, v_re, v_im, mats,
                batched_spectrum=True)
            h_part = fixed_h if fixed_h is not None \
                else self._h_render(kb["h"], consts)
            return data + h_part + kb["mean"][:, None, None]

        total_hat = conv.point_source_spectrum(m, s, a, px, py)
        total_hat = total_hat * consts["ps_hat"]

        if fixed_h is None:
            h = kb["h"].reshape(m, m)
            L = conv.pad_len(m)
            if mats is not None:
                from ...ops.dft import rfft2_pad_matmul

                h_hat = rfft2_pad_matmul(h, mats)
            else:
                h_hat = jnp.fft.rfft2(h, s=(L, L))          # one FFT, shared
            total_hat = total_hat + h_hat * consts["grid_hat"]

        if pooled:
            # inverse transform + crop + SUM-POOL folded into one matmul
            # chain (ops/dft.py): the fine grid is never materialized
            from ...ops.dft import irfft2_pool_matmul

            data = irfft2_pool_matmul(total_hat, consts["dft_mats"])
        elif mats is not None:
            # inverse transform + crop as MXU matmuls (ops/dft.py):
            # measurably faster than this backend's FFT
            from ...ops.dft import irfft2_crop_matmul

            fine = irfft2_crop_matmul(total_hat, consts["dft_mats"])
            data = downsample(fine, s)
        else:
            fine = conv.render_from_fft(total_hat, m)       # (N, m, m)
            data = downsample(fine, s)
        if fixed_h is not None:
            data = data + fixed_h
        return data + kb["mean"][:, None, None]

    def _model_all_real(self, a, px, py, kb, consts, mats, fixed_h):
        """All-real render on raw PSF spectra (the HBM-minimal hot path).

        The spectrum algebra, with rr = ry (x) rx the separable r-kernel
        transform and cp the (separable) center phase:

            X = [spec * rr + h_hat * cp] * t_hat

        ``spec * rr`` folds into the 1-D ramps; ``h_hat * cp`` is one
        small shared (L, L/2+1) array.  The only big per-epoch reads are
        the raw ``t_re``/``t_im``.
        """
        m, s, M = self.m, self.s, self.n_sources
        t_re, t_im = consts["t_re"], consts["t_im"]
        ry, rx = conv.r_kernel_fft_1d(m, s)

        if M == 1 and fixed_h is not None:
            from ...ops.dft import irfft2_pool_shift_matmul

            u_re, u_im, v_re, v_im = conv.point_source_ramps(
                m, s, a[:, 0], px[:, 0], py[:, 0], ry=ry, rx=rx)
            data = irfft2_pool_shift_matmul(
                t_re, t_im, u_re, u_im, v_re, v_im, mats,
                batched_spectrum=True)
            return data + fixed_h + kb["mean"][:, None, None]

        from ...ops.dft import (irfft2_pool_matmul_parts,
                                rfft2_pad_matmul_parts)

        s_re, s_im = conv.point_source_spectrum_parts(
            m, s, a, px, py, ry=ry, rx=rx)
        if fixed_h is None:
            h = kb["h"].reshape(m, m)
            h_re, h_im = rfft2_pad_matmul_parts(h, mats)
            gy_re, gy_im, gx_re, gx_im = conv.grid_center_phase_1d(m)
            cp_re = gy_re[:, None] * gx_re - gy_im[:, None] * gx_im
            cp_im = gy_re[:, None] * gx_im + gy_im[:, None] * gx_re
            hp_re = h_re * cp_re - h_im * cp_im
            hp_im = h_re * cp_im + h_im * cp_re
            s_re = s_re + hp_re
            s_im = s_im + hp_im
        x_re = s_re * t_re - s_im * t_im
        x_im = s_re * t_im + s_im * t_re
        data = irfft2_pool_matmul_parts(x_re, x_im, mats)
        if fixed_h is not None:
            data = data + fixed_h
        return data + kb["mean"][:, None, None]

    def background_only(self, kwargs, consts=None):
        """The flux-independent channels: h render + per-epoch mean.

        Numerically identical (up to the sign of exact zeros) to
        ``model(kwargs)`` with every amplitude zeroed — the
        zero-amplitude point-source terms are exact IEEE zeros
        (0 × finite spectra through linear matmuls/FFTs) — at none of
        the point-source render cost.  Each dispatch branch reproduces
        the corresponding ``model()`` branch's h expression with the
        same association order, so the GLS polish baseline
        (core/fisher.linear_flux_solve) stays value-compatible with the
        previous model-at-zero-flux formulation.
        """
        if consts is None:
            consts = self.consts()
        kb = kwargs["kwargs_background"]
        fixed_h = consts.get("fixed_h_render")
        mats = consts.get("dft_mats")
        pooled = mats is not None and "Ayp" in mats
        if fixed_h is not None:
            h_part = fixed_h
        elif pooled and "t_re" in consts:
            # all-real path: h rides the raw t_re/t_im product — same
            # expression as _model_all_real with s_re = 0 + hp_re
            from ...ops.dft import (irfft2_pool_matmul_parts,
                                    rfft2_pad_matmul_parts)

            m = self.m
            t_re, t_im = consts["t_re"], consts["t_im"]
            h = kb["h"].reshape(m, m)
            h_re, h_im = rfft2_pad_matmul_parts(h, mats)
            gy_re, gy_im, gx_re, gx_im = conv.grid_center_phase_1d(m)
            cp_re = gy_re[:, None] * gx_re - gy_im[:, None] * gx_im
            cp_im = gy_re[:, None] * gx_im + gy_im[:, None] * gx_re
            hp_re = h_re * cp_re - h_im * cp_im
            hp_im = h_re * cp_im + h_im * cp_re
            x_re = hp_re * t_re - hp_im * t_im
            x_im = hp_re * t_im + hp_im * t_re
            h_part = irfft2_pool_matmul_parts(x_re, x_im, mats)
        else:
            h_part = self._h_render(kb["h"], consts)
        return h_part + kb["mean"][:, None, None]

    def point_source_basis(self, kwargs, consts=None):
        """Unit-flux data-grid images of each source: (N, M, n, n).

        The model is linear in ``a``; these are the corresponding columns,
        used for exact Fisher flux uncertainties (core/fisher.py) and
        linear flux refits.
        """
        if consts is None:
            consts = self.consts()
        m, s, M = self.m, self.s, self.n_sources
        px, py = self.source_positions(kwargs)
        ones = jnp.ones_like(px[:, :1])
        mats = consts.get("dft_mats")

        def one_source(pxj, pyj):
            prod = conv.point_source_spectrum(
                m, s, ones, pxj[:, None], pyj[:, None]) * consts["ps_hat"]
            # same inverse-backend dispatch as model(): matmul on TPU
            # (faster, and partitionable when the batch axis is sharded
            # — the FFT op would force an all-gather), FFT fallback
            if mats is not None and "Ayp" in mats:
                from ...ops.dft import irfft2_pool_matmul

                return irfft2_pool_matmul(prod, mats)
            if mats is not None:
                from ...ops.dft import irfft2_crop_matmul

                return downsample(irfft2_crop_matmul(prod, mats), s)
            return downsample(conv.render_from_fft(prod, m), s)

        basis = [one_source(px[:, j], py[:, j]) for j in range(M)]
        return jnp.stack(basis, axis=1)

    def getDeconvolved(self, kwargs, epoch=0):
        """High-resolution two-channel output for a given epoch.

        Returns (deconvolved, background_only): the background channel ``h``
        plus the point sources rendered as target-resolution ``r``
        profiles at their epoch positions; both (m, m), in data-flux units
        per fine pixel.  Mirrors STARRED's ``Deconv.getDeconvolved`` as
        used at reference processes/roi_modelling.py:387 and
        processes/star_photometry.py:137.
        """
        m, s, M = self.m, self.s, self.n_sources
        kb = kwargs["kwargs_background"]
        h = kb["h"].reshape(m, m)
        a = kwargs["kwargs_analytic"]["a"].reshape(self.n_epochs, M)
        px, py = self.source_positions(kwargs)
        img = h
        for j in range(M):
            img = img + a[epoch, j] * gaussian_r_kernel(
                m, s, x0=px[epoch, j], y0=py[epoch, j])
        return img, h


def setup_model(data, sigma_2, s, xs, ys, subsampling_factor, initial_a=None,
                astrometric_bound=5.0, translation_bound=5.0):
    """Build a DeconvModel + parameter pytrees from data.

    Mirrors the STARRED ``setup_model`` signature the reference calls at
    processes/star_photometry.py:66 and processes/roi_modelling.py:213.

    Args:
        data: (N, n, n) stamps.
        sigma_2: (N, n, n) noise variance (unused for setup; kept for
            signature parity).
        s: (N, mp, mp) narrow PSFs (fine grid).
        xs, ys: (M,) initial source positions, data px, center origin.
        subsampling_factor: int.
        initial_a: length N*M (or M, tiled) initial fluxes; default:
            aperture-less sum of each stamp divided by M.
        astrometric_bound: box half-width for c_x/c_y around init (data px).
        translation_bound: box half-width for dx/dy (data px).

    Returns:
        (model, kwargs_init, kwargs_up, kwargs_down, kwargs_fixed)
    """
    del sigma_2
    data = np.asarray(data)
    n_epochs, image_size = data.shape[0], data.shape[-1]
    xs = np.atleast_1d(np.asarray(xs, dtype=np.float32))
    ys = np.atleast_1d(np.asarray(ys, dtype=np.float32))
    n_sources = xs.size
    model = DeconvModel(s, subsampling_factor, image_size, n_epochs, n_sources)

    if initial_a is None:
        initial_a = np.tile(
            np.nansum(data, axis=(1, 2)) / n_sources, (n_sources, 1)
        ).T.ravel()
    initial_a = np.asarray(initial_a, dtype=np.float32).ravel()
    if initial_a.size == n_sources:
        initial_a = np.tile(initial_a, n_epochs)
    assert initial_a.size == n_epochs * n_sources

    m = model.m
    kwargs_init = {
        "kwargs_analytic": {
            "a": jnp.asarray(initial_a),
            "c_x": jnp.asarray(xs),
            "c_y": jnp.asarray(ys),
            "dx": jnp.zeros(n_epochs, jnp.float32),
            "dy": jnp.zeros(n_epochs, jnp.float32),
            "alpha": jnp.zeros(n_epochs, jnp.float32),
        },
        "kwargs_background": {
            "h": jnp.zeros(m * m, jnp.float32),
            "mean": jnp.zeros(n_epochs, jnp.float32),
        },
        "kwargs_sersic": {},
    }
    big = np.inf
    kwargs_up = {
        "kwargs_analytic": {
            "a": big, "c_x": xs + astrometric_bound,
            "c_y": ys + astrometric_bound,
            "dx": translation_bound, "dy": translation_bound, "alpha": big,
        },
        "kwargs_background": {"h": big, "mean": big},
        "kwargs_sersic": {},
    }
    kwargs_down = {
        "kwargs_analytic": {
            "a": -big, "c_x": xs - astrometric_bound,
            "c_y": ys - astrometric_bound,
            "dx": -translation_bound, "dy": -translation_bound, "alpha": -big,
        },
        "kwargs_background": {"h": -big, "mean": -big},
        "kwargs_sersic": {},
    }
    # default: everything except fluxes and translations fixed — the
    # reference always overrides this explicitly
    # (processes/star_photometry.py:74-87, processes/roi_modelling.py:260).
    kwargs_fixed = {
        "kwargs_analytic": {
            "alpha": jnp.zeros(n_epochs, jnp.float32),
        },
        "kwargs_background": {
            "h": jnp.zeros(m * m, jnp.float32),
            "mean": jnp.zeros(n_epochs, jnp.float32),
        },
        "kwargs_sersic": {},
    }
    return model, kwargs_init, kwargs_up, kwargs_down, kwargs_fixed
