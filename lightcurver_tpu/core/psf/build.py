"""Two-phase narrow-PSF fit: the build_psf contract.

Mirrors the reference's single numerical-core entry point for PSFs
(STARRED ``build_psf`` called at processes/psf_modelling.py:164-171 with
the result-dict contract pinned by
tests/test_starred_calls/test_starred_calls.py:66-81):

    phase 1: bounded L-BFGS on the analytic Moffat (+ per-star fluxes and
             sub-pixel positions), ``n_iter_analytic`` iterations;
    phase 2: AdaBelief on the free pixel grid (+ fluxes, positions, and
             optionally the field-distortion polynomials),
             ``n_iter_adabelief`` iterations, starlet-l1 regularized with
             Monte-Carlo noise-propagated per-scale weights.

Masked pixels (cosmics, neighbours) are excluded from the chi2 by weight,
and the reduced chi2 is computed per star over unmasked pixels only.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..grids import upsample_transpose
from ..starlet import starlet_transform, n_starlet_scales
from ..params import Params, merge_free
from ..optimize import run_adabelief, run_lbfgsb
from .. import convolution as conv
from .distortion import zero_distortion_kwargs
from .model import PSFModel


def _masked_chi2_per_star(data, model_imgs, sigma_2, masks):
    res2 = (data - model_imgs) ** 2 / sigma_2
    res2 = jnp.where(masks, res2, 0.0)
    good = masks.sum(axis=(-2, -1))
    return res2.sum(axis=(-2, -1)) / jnp.maximum(good, 1)


@functools.lru_cache(maxsize=64)
def _phase_losses(n_stars, n_pix, s, field_distortion,
                  dft_precision="highest"):
    """Model + the two phase losses for a given (static) configuration.

    lru-cached so fitting many frames of identical geometry reuses the
    same function objects — and therefore the optimizers' jit cache —
    instead of recompiling per frame.  All per-frame arrays travel in the
    ``consts`` argument.
    """
    model = PSFModel(n_stars, n_pix, s, field_distortion=field_distortion)
    m = n_pix * s
    n_sc = n_starlet_scales(m)

    def pin_term(kwargs, consts):
        # pin one star's position (breaks the global-shift degeneracy
        # between the stars' sub-pixel offsets and the PSF grid) — the
        # FIRST star with any unmasked pixel: a fully-masked star 0
        # (satellite trail, cosmic) carries no data, and pinning it
        # would leave the degeneracy unbroken while the grid drifts.
        # One-hot weighted sum, NOT a gather: adding exact zeros keeps
        # the loss bit-identical to the original static x0[0] pin
        # whenever star 0 is valid (the scipy-parity test pins this)
        kg = kwargs["kwargs_gaussian"]
        valid = consts["masks"].any(axis=(-2, -1))
        first = (valid & (jnp.cumsum(valid) == 1)).astype(kg["x0"].dtype)
        px = jnp.sum(first * kg["x0"])
        py = jnp.sum(first * kg["y0"])
        return 0.5 * ((px / 1e-3) ** 2 + (py / 1e-3) ** 2)

    def data_term(kwargs, consts):
        imgs = model.model(kwargs, consts["stamp_coordinates"],
                           consts.get("dft_mats"))
        chi2 = _masked_chi2_per_star(consts["data"], imgs,
                                     consts["sigma_2"], consts["masks"])
        return 0.5 * chi2.sum() * n_pix**2 + pin_term(kwargs, consts)

    def loss_moffat(free, consts):
        return data_term(merge_free(free, consts["fixed"]), consts)

    def loss_pixels(free, consts):
        kwargs = merge_free(free, consts["fixed"])
        g = kwargs["kwargs_background"]["background"].reshape(m, m)
        # l1 with per-coefficient noise weights: soft-thresholding at
        # ~lambda sigma_coeff (standard starlet k-sigma denoising)
        coeffs = starlet_transform(g, n_scales=n_sc)
        reg = consts["lam"] * (consts["W"][:-1] * jnp.abs(coeffs[:-1])).sum()
        return data_term(kwargs, consts) + reg

    return model, loss_moffat, loss_pixels


def _grid_noise_weights_impl(sigma, m, s, num_samples, n_scales, key,
                             dft_mats=None):
    """Per-scale noise std of starlet coefficients of the PSF pixel grid.

    The operator from the grid g to the stamps is (per star)
    ``a_i * down(conv(g, r))``; its adjoint applied to noise realizations
    gives the coefficient noise used as l1 weights (same scheme as
    core/noise.propagate_noise for the deconvolution background).
    ``sigma`` is a runtime argument (no closure constants, see
    core/optimize.py module docstring).  When ``dft_mats`` is given the
    r-adjoint convolution runs as MXU matmuls (this backend's FFT is
    slow; the Monte-Carlo pass was ~25% of the batched PSF fit).
    """
    L = conv.pad_len(m) if dft_mats is None \
        else dft_mats["Ay"].shape[-1]
    r_hat = conv.r_kernel_fft(m, s, L=L)
    # a pixel with NaN noise (in all stars) would spread NaN through the
    # starlet smoothing into every weight and silently disable the
    # pixel-grid fit (NaN loss -> init returned); contribute zero there
    # (same guard as core/noise._mc_starlet_noise)
    sigma = jnp.where(jnp.isfinite(sigma), sigma, 0.0)

    def one(key):
        eps = sigma * jax.random.normal(key, sigma.shape, dtype=jnp.float32)
        fine = upsample_transpose(eps, s)
        if dft_mats is not None:
            from ...ops.dft import irfft2_crop_matmul, rfft2_pad_matmul

            fine_hat = rfft2_pad_matmul(fine, dft_mats)
            # r_hat is real (Gaussian): conj is a no-op
            back = irfft2_crop_matmul(fine_hat * r_hat, dft_mats)
        else:
            fine_hat = jnp.fft.rfft2(fine, s=(L, L))
            back = jnp.fft.irfft2(fine_hat * jnp.conj(r_hat),
                                  s=(L, L))[:m, :m]
        return starlet_transform(back, n_scales=n_scales)

    keys = jax.random.split(key, num_samples)
    coeffs = jax.lax.map(one, keys, batch_size=16)
    return jnp.maximum(jnp.std(coeffs, axis=0), 1e-12)


def _starlet_transfer_fns(L, n_scales, dtype=jnp.float32):
    """Fourier transfer functions of the starlet detail scales.

    The separable B3 a-trous smoothing at dilation d has the 1-D
    transfer (6 + 8 cos(w d) + 2 cos(2 w d)) / 16; detail scale j is
    C_j (1 - S_{2^j}) with C_j the product of the coarser smoothings.
    Returns (n_scales + 1, L, L//2+1), coarse last, all real.
    """
    wy = 2.0 * jnp.pi * jnp.fft.fftfreq(L).astype(dtype)[:, None]
    wx = 2.0 * jnp.pi * jnp.fft.rfftfreq(L).astype(dtype)[None, :]

    def smooth_1d(w, d):
        return (6.0 + 8.0 * jnp.cos(w * d) + 2.0 * jnp.cos(2.0 * w * d)) \
            / 16.0

    out = []
    c = jnp.ones((L, L // 2 + 1), dtype)
    for j in range(n_scales):
        d = float(2 ** j)
        s_j = smooth_1d(wy, d) * smooth_1d(wx, d)
        out.append(c * (1.0 - s_j))
        c = c * s_j
    out.append(c)
    return jnp.stack(out)


def _grid_noise_weights_closed(sigma, m, s, n_scales, dft_mats=None,
                               dft_precision=None):
    """CLOSED-FORM per-scale starlet coefficient noise (no Monte-Carlo).

    The map from data noise eps to the starlet coefficients of the
    r-correlated, block-repeated field is linear, so the coefficient
    variance is exact:

        Var_j[p] = sum_q b_j(p - s q)^2 sigma_q^2
                 = conv(zero_insert(sigma^2), b_j^2)[p],

    with b_j = (starlet_j kernel) * r * (s x s box) — the box summing
    the block-repeat of upsample_transpose.  The squared-kernel spectra
    are frame-independent constants (hoisted under vmap/jit), so one
    frame costs ONE forward + (n_scales+1) inverse transforms — this
    replaced the 64-sample Monte-Carlo estimate that dominated the
    batched PSF fit's fixed overhead (measured 0.99 s of a 2.34 s
    16-frame bucket on v5e; see tools/psf_roofline.py).

    vs Monte-Carlo semantics: MC applies the mirror-boundary starlet to
    the m-grid crop; this closed form models the chain as circular
    convolutions on the padded L-grid.  Interior agreement is exact in
    expectation (MC at 64 samples carries ~9% sampling noise; this has
    none); coarse scales deviate near the borders where the boundary
    models differ (bounded by tests/test_noise_and_metrics.py).
    """
    L = conv.pad_len(m) if dft_mats is None \
        else dft_mats["Ay"].shape[-1]
    r_hat = conv.r_kernel_fft(m, s, L=L)
    sigma = jnp.where(jnp.isfinite(sigma), sigma, 0.0)

    # frame-invariant squared-kernel spectra (n_scales+1, L, L//2+1)
    d_hat = _starlet_transfer_fns(L, n_scales)
    wy = 2.0 * jnp.pi * jnp.fft.fftfreq(L).astype(jnp.float32)[:, None]
    wx = 2.0 * jnp.pi * jnp.fft.rfftfreq(L).astype(jnp.float32)[None, :]

    def box_1d(w):
        re = sum(jnp.cos(w * k) for k in range(s))
        im = -sum(jnp.sin(w * k) for k in range(s))
        return jax.lax.complex(re, im)

    box_hat = box_1d(wy) * box_1d(wx)
    k_hat = d_hat * r_hat * box_hat
    b = jnp.fft.irfft2(k_hat, s=(L, L))
    b2_hat = jnp.fft.rfft2(b * b)

    # per-frame part: conv(zero-inserted sigma^2, b_j^2)
    sig2_up = jnp.zeros((m, m), jnp.float32)
    sig2_up = sig2_up.at[::s, ::s].set(sigma.astype(jnp.float32) ** 2)
    if dft_mats is not None:
        from ...ops.dft import (irfft2_crop_matmul, precision_from_name,
                                rfft2_pad_matmul)

        # dft_precision is a STATIC name keying the standalone jit below
        # (never read the ops global inside this trace: a flipped
        # set_dft_precision() must retrace, not reuse the old program)
        prec = precision_from_name(dft_precision)
        sig2_hat = rfft2_pad_matmul(sig2_up, dft_mats, precision=prec)
        var = irfft2_crop_matmul(sig2_hat * b2_hat, dft_mats,
                                 precision=prec)
    else:
        sig2_hat = jnp.fft.rfft2(sig2_up, s=(L, L))
        var = jnp.fft.irfft2(sig2_hat * b2_hat, s=(L, L))[..., :m, :m]
    return jnp.sqrt(jnp.maximum(var, 1e-24)).astype(jnp.float32)


_grid_noise_weights_closed_jit = jax.jit(
    _grid_noise_weights_closed,
    static_argnames=("m", "s", "n_scales", "dft_precision"))


def _propagate_noise_to_grid_weights(model, noisemap, mean_amp,
                                     num_samples=64, seed=0,
                                     dft_mats=None, dft_precision=None):
    """Starlet l1 weights of the PSF grid (closed form; see
    _grid_noise_weights_closed).  num_samples/seed retained for the MC
    fallback's signature but unused on the production path."""
    del num_samples, seed
    sigma = jnp.nanmedian(jnp.asarray(noisemap, dtype=jnp.float32), axis=0)
    sigma = sigma / jnp.maximum(mean_amp, 1e-12)
    return _grid_noise_weights_closed_jit(sigma, model.m, model.s,
                                          n_starlet_scales(model.m),
                                          dft_mats,
                                          dft_precision=dft_precision)


def psf_fft_length(m, s, dft_pad=None):
    """FFT length of the PSF fit's DFT matrices (see build_psf dft_pad)."""
    if dft_pad is None:
        return 2 * m
    pad = int(dft_pad)
    if pad < 4 * s:
        raise ValueError(
            f"dft_pad={pad} is below the safe minimum 4*s={4 * s}: the "
            "position bound is 3 data px = 3*s fine px and the wrap-free "
            "margin must exceed it")
    # a "reduced" length beyond the exact L=2m would cost MORE than full
    # padding for zero benefit (2m is exact for arbitrary placement)
    return min(m + 2 * pad, 2 * m)


def psf_bound_values(n_pix):
    """(kwargs_up, kwargs_down) scalar bound values of the PSF fit.

    SINGLE source of truth — the batched fitter
    (core/psf/batched._bounds) broadcasts these same values to its
    array shapes; keep them here so the two paths cannot drift.
    """
    kwargs_up = {
        "kwargs_moffat": {"fwhm_x": 0.9 * n_pix, "fwhm_y": 0.9 * n_pix,
                          "beta": 10.0},
        "kwargs_gaussian": {"a": np.inf, "x0": 3.0, "y0": 3.0},
        "kwargs_background": {"background": np.inf},
        "kwargs_distortion": {"dilation_x": 0.5, "dilation_y": 0.5,
                              "shear": 0.5},
    }
    kwargs_down = {
        "kwargs_moffat": {"fwhm_x": 0.8, "fwhm_y": 0.8, "beta": 1.15},
        "kwargs_gaussian": {"a": 0.0, "x0": -3.0, "y0": -3.0},
        "kwargs_background": {"background": -np.inf},
        "kwargs_distortion": {"dilation_x": -0.5, "dilation_y": -0.5,
                              "shear": -0.5},
    }
    return kwargs_up, kwargs_down


def build_psf(image, noisemap, subsampling_factor, n_iter_analytic=100,
              n_iter_adabelief=3000, masks=None,
              guess_method_star_position="center", guess_fwhm_pixels=None,
              field_distortion=False, stamp_coordinates=None,
              regularization_strength=1.0, adabelief_lr=5e-4,
              dft_pad=None):
    """Fit a narrow PSF on a stack of star stamps.

    Args:
        image: (N, n, n) star stamps (background-subtracted, e-/s).
        noisemap: (N, n, n) noise sigmas.
        subsampling_factor: int s; fine grid is (n*s, n*s).
        n_iter_analytic: L-BFGS iterations for the Moffat phase.
        n_iter_adabelief: AdaBelief iterations for the pixel phase.
        masks: (N, n, n) bool/float, True (1) = good pixel.
        guess_method_star_position: only 'center' is supported (the
            reference pipeline always uses it, psf_modelling.py:168).
        guess_fwhm_pixels: seeing-based initial FWHM in data pixels.
        field_distortion: fit the distortion polynomials too.
        stamp_coordinates: (N, 2) rescaled [-1, 1] star positions in the
            frame (required when field_distortion).
        regularization_strength: starlet-l1 strength for the pixel grid.
        adabelief_lr: learning rate of the pixel phase.
        dft_pad: fine-pixel zero-padding margin of the DFT matrices
            (MXU backend only).  None keeps the general L = 2m (exact
            for arbitrary placement); the PSF fit pins positions at the
            stamp centre (|x0| <= 3 data px by bound), so a reduced
            L = m + 2*dft_pad cuts the modulated-matmul FLOPs ~3x with
            wrap leakage <= ~1e-5 relative flux at the position bound
            (measured in float64; see tools/exp_psf_mxu.py).  Must be
            >= 4*s (covers the position bound with margin).

    Returns:
        dict with narrow_psf, full_psf, psf_kernel_list, chi2, residuals,
        kwargs_psf, adabelief_extra_fields{'loss_history'},
        lbfgs_extra_fields{'loss_history'} — superset of the keys the
        reference reads (processes/psf_modelling.py:177-208).
    """
    if guess_method_star_position != "center":
        raise NotImplementedError(
            "only guess_method_star_position='center' is supported")
    image = np.asarray(image, dtype=np.float32)
    noisemap = np.asarray(noisemap, dtype=np.float32)
    n_stars, n_pix = image.shape[0], image.shape[-1]
    s = int(subsampling_factor)
    m = n_pix * s
    if masks is None:
        masks = np.isfinite(image)
    else:
        # the finite guard composes with a user mask rather than being
        # replaced by it: a cosmics mask that marks a NaN pixel good
        # would otherwise turn it (via nan_to_num below) into a
        # zero-flux measurement at full weight — the exact bias the
        # isfinite default prevents (same joint sanitization as
        # deconv/batched.fit_stars_batched)
        masks = np.asarray(masks, dtype=bool) & np.isfinite(image) \
            & np.isfinite(noisemap)
    masks_j = jnp.asarray(np.asarray(masks, dtype=bool))

    scale = float(np.nanmax(np.where(masks, image, np.nan)))
    if not np.isfinite(scale) or scale <= 0:
        scale = 1.0
    data = jnp.asarray(np.nan_to_num(image / scale))
    sigma = jnp.asarray(np.nan_to_num(noisemap / scale, nan=1e8))
    # masked pixels are excluded from the chi2 by weight; unit variance
    # there keeps a zero/NaN-noise convention at masked pixels from
    # producing inf partials whose 0-cotangent VJP is NaN (same guard
    # as core/psf/batched.py _fit_one_frame)
    sigma_2 = jnp.where(masks_j, sigma**2, 1.0)

    from ...ops import get_dft_precision

    model, loss_moffat, loss_pixels = _phase_losses(
        n_stars, n_pix, s, bool(field_distortion), get_dft_precision())
    if stamp_coordinates is None:
        stamp_coordinates = np.zeros((n_stars, 2), dtype=np.float32)
    stamp_coordinates = jnp.asarray(stamp_coordinates, dtype=jnp.float32)

    fwhm0 = float(guess_fwhm_pixels) if guess_fwhm_pixels else 3.0
    fwhm0 = float(np.clip(fwhm0, 1.2, 0.45 * n_pix))
    a0 = np.clip(np.nansum(image / scale, axis=(1, 2)), 1e-3, None)

    kwargs_init = {
        "kwargs_moffat": {
            "fwhm_x": jnp.asarray(fwhm0, jnp.float32),
            "fwhm_y": jnp.asarray(fwhm0, jnp.float32),
            "beta": jnp.asarray(2.5, jnp.float32),
        },
        "kwargs_gaussian": {
            "a": jnp.asarray(a0),
            "x0": jnp.zeros(n_stars, jnp.float32),
            "y0": jnp.zeros(n_stars, jnp.float32),
        },
        "kwargs_background": {"background": jnp.zeros(m * m, jnp.float32)},
        "kwargs_distortion": zero_distortion_kwargs(),
    }
    kwargs_up, kwargs_down = psf_bound_values(n_pix)

    # --- phase 1: analytic Moffat (grid and distortion fixed at zero) ---
    kwargs_fixed_1 = {
        "kwargs_background": {"background": jnp.zeros(m * m, jnp.float32)},
        "kwargs_distortion": zero_distortion_kwargs(),
    }
    params1 = Params(kwargs_init, kwargs_fixed_1, kwargs_up, kwargs_down)

    base_consts = {"data": data, "sigma_2": sigma_2, "masks": masks_j,
                   "stamp_coordinates": stamp_coordinates}
    from ...ops import get_irfft_backend

    if get_irfft_backend() == "mxu":
        from ...ops.dft import make_dft_mats

        base_consts["dft_mats"] = make_dft_mats(
            psf_fft_length(m, s, dft_pad), m, pool=s)
    consts1 = {**base_consts, "fixed": params1.fixed}
    best1, _, hist1 = run_lbfgsb(loss_moffat, params1.free0, params1.lower,
                                 params1.upper, n_iter_analytic,
                                 consts=consts1)
    kwargs_1 = params1.merge(best1)

    # --- phase 2: pixel grid (+ optional distortion), Moffat fixed ------
    kwargs_fixed_2 = {
        "kwargs_moffat": {k: kwargs_1["kwargs_moffat"][k]
                          for k in ("fwhm_x", "fwhm_y", "beta")},
    }
    if not field_distortion:
        kwargs_fixed_2["kwargs_distortion"] = zero_distortion_kwargs()
    params2 = Params(kwargs_1, kwargs_fixed_2, kwargs_up, kwargs_down)

    mean_amp = jnp.mean(jnp.asarray(a0))
    W = _propagate_noise_to_grid_weights(
        model, noisemap / scale, mean_amp,
        dft_mats=base_consts.get("dft_mats"),
        dft_precision=get_dft_precision())

    consts2 = {**base_consts, "W": W,
               "lam": jnp.asarray(regularization_strength, jnp.float32),
               "fixed": params2.fixed}
    best2, _, hist2 = run_adabelief(
        loss_pixels, params2.free0, params2.lower, params2.upper,
        n_iter_adabelief, init_learning_rate=adabelief_lr,
        schedule_learning_rate=True, consts=consts2)
    kwargs_final = params2.merge(best2)

    narrow = model.narrow_psf(kwargs_final)
    full = model.full_psf(kwargs_final,
                          dft_mats=base_consts.get("dft_mats"))
    model_imgs = model.model(kwargs_final, stamp_coordinates,
                             base_consts.get("dft_mats"))
    chi2_per_star = _masked_chi2_per_star(data, model_imgs, sigma_2, masks_j)
    chi2 = float(jnp.mean(chi2_per_star))
    residuals = scale * np.asarray(data - model_imgs)

    return {
        "narrow_psf": np.asarray(narrow),
        "full_psf": np.asarray(full),
        "chi2": chi2,
        "chi2_per_star": np.asarray(chi2_per_star),
        "residuals": residuals,
        "scale": scale,
        "kwargs_psf": jax.tree_util.tree_map(np.asarray, kwargs_final),
        "adabelief_extra_fields": {"loss_history": np.asarray(hist2)},
        "lbfgs_extra_fields": {"loss_history": np.asarray(hist1)},
    }
