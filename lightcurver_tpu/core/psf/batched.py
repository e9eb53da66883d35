"""Batched (vmapped-over-frames) narrow-PSF fitting: the throughput path.

The reference fits PSFs one frame at a time in a serial Python loop
(reference processes/psf_modelling.py:92, ~2-3 s/frame on a gaming GPU);
here the full two-phase fit — bounded L-BFGS Moffat, then AdaBelief pixel
grid with Monte-Carlo starlet weights — is a single pure function of one
frame's arrays, vmapped over the frame axis and jitted once.  Frames with
different star counts are padded with fully-masked dummy stars (their
chi2 weight is zero), so one compiled program serves a whole bucket.

This is the "PSF fits/sec/chip" metric of BASELINE.json.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..starlet import n_starlet_scales
from ..optimize import adabelief_scan, lbfgsb_scan
from .build import (_phase_losses, _grid_noise_weights_closed,
                    _masked_chi2_per_star)
from .distortion import zero_distortion_kwargs


def _bounds(n_stars, n_pix, m):
    """Bound pytrees matching the batched parameter shapes.

    The VALUES come from build.psf_bound_values (single source of
    truth) — only the broadcasting to array shapes lives here.
    """
    from .build import psf_bound_values

    kwargs_up, kwargs_down = psf_bound_values(n_pix)
    shapes = {
        "kwargs_moffat": {"fwhm_x": (), "fwhm_y": (), "beta": ()},
        "kwargs_gaussian": {"a": (n_stars,), "x0": (n_stars,),
                            "y0": (n_stars,)},
        "kwargs_background": {"background": (m * m,)},
        "kwargs_distortion": {k: (5,) for k in ("dilation_x",
                                                "dilation_y", "shear")},
    }

    def broadcast(values):
        return {group: {key: jnp.full(shapes[group][key], values[group][key],
                                      jnp.float32)
                        for key in keys}
                for group, keys in shapes.items()}

    return broadcast(kwargs_down), broadcast(kwargs_up)


def _subset(tree, spec):
    """Extract the sub-pytree of ``tree`` matching the structure of spec."""
    return {k: (_subset(tree[k], v) if isinstance(v, dict) else tree[k])
            for k, v in spec.items()}


def _fit_one_frame(data, noisemap, masks, stamp_coords, fwhm0, key,
                   n_stars, n_pix, s, field_distortion, n_iter_analytic,
                   n_iter_adabelief, regularization_strength,
                   adabelief_lr, irfft_backend, dft_precision,
                   dft_pad=None):
    """Pure single-frame two-phase PSF fit (fully traceable).

    ``irfft_backend`` / ``dft_precision`` arrive as STATIC arguments
    (not read from the ops globals inside the trace): a flipped
    set_irfft_backend()/set_dft_precision() must retrace, not silently
    reuse the previous program.
    """
    model, loss_moffat, loss_pixels = _phase_losses(
        n_stars, n_pix, s, field_distortion, dft_precision)
    m = n_pix * s

    scale = jnp.nanmax(jnp.where(masks, data, -jnp.inf))
    scale = jnp.where(jnp.isfinite(scale) & (scale > 0), scale, 1.0)
    d = jnp.nan_to_num(data / scale)
    sig = jnp.nan_to_num(noisemap / scale, nan=1e8)
    # masked pixels are excluded from the chi2 by weight; unit noise
    # there keeps a zero-noise padding convention (docstring: "pad
    # missing stars with zeros and masks=False") from producing inf
    # partials whose 0-cotangent VJP is NaN
    sigma_2 = jnp.where(masks, sig**2, 1.0)
    # fully-masked entries are dummy padding stars: keep them out of
    # the weight statistics below
    star_valid = masks.any(axis=(1, 2))

    fwhm0 = jnp.clip(fwhm0, 1.2, 0.45 * n_pix).astype(jnp.float32)
    a0 = jnp.clip(jnp.sum(jnp.where(masks, d, 0.0), axis=(1, 2)),
                  1e-3, None)

    kwargs_init = {
        "kwargs_moffat": {"fwhm_x": fwhm0, "fwhm_y": fwhm0,
                          "beta": jnp.asarray(2.5, jnp.float32)},
        "kwargs_gaussian": {"a": a0,
                            "x0": jnp.zeros(n_stars, jnp.float32),
                            "y0": jnp.zeros(n_stars, jnp.float32)},
        "kwargs_background": {
            "background": jnp.zeros(m * m, jnp.float32)},
        "kwargs_distortion": zero_distortion_kwargs(),
    }
    lower, upper = _bounds(n_stars, n_pix, m)

    base_consts = {"data": d, "sigma_2": sigma_2, "masks": masks,
                   "stamp_coordinates": stamp_coords}
    if irfft_backend == "mxu":
        from ...ops.dft import make_dft_mats

        from .build import psf_fft_length

        base_consts["dft_mats"] = make_dft_mats(
            psf_fft_length(m, s, dft_pad), m, pool=s)

    # ---- phase 1: Moffat (grid + distortion fixed) ----------------------
    fixed1_spec = {"kwargs_background": {"background": None},
                   "kwargs_distortion": {"dilation_x": None,
                                         "dilation_y": None,
                                         "shear": None}}
    free1 = {"kwargs_moffat": kwargs_init["kwargs_moffat"],
             "kwargs_gaussian": kwargs_init["kwargs_gaussian"]}
    fixed1 = _subset(kwargs_init, fixed1_spec)
    consts1 = {**base_consts, "fixed": fixed1}
    # exact_bounds=False: under vmap the bound-recovery cond batches to
    # a select that would pay one extra loss+grad EVERY iteration;
    # Moffat iterates stay inside their boxes on production fits
    # (core/optimize.lbfgsb_scan docstring)
    best1, _, hist1 = lbfgsb_scan(
        loss_moffat, free1, consts1,
        {k: _subset(lower, {k: free1[k]})[k] for k in free1},
        {k: _subset(upper, {k: free1[k]})[k] for k in free1},
        n_iter_analytic, exact_bounds=False)

    # ---- phase 2: pixel grid (+ distortion), Moffat fixed ---------------
    free2 = {"kwargs_gaussian": best1["kwargs_gaussian"],
             "kwargs_background": kwargs_init["kwargs_background"]}
    fixed2 = {"kwargs_moffat": best1["kwargs_moffat"]}
    if field_distortion:
        free2["kwargs_distortion"] = kwargs_init["kwargs_distortion"]
    else:
        fixed2["kwargs_distortion"] = kwargs_init["kwargs_distortion"]

    # noise median over REAL stars only (NaN noise pixels excluded per
    # pixel, mirroring build_psf's nanmedian; dummy padding stars would
    # otherwise drag the weights by up to the padding fraction), scaled
    # by the mean amplitude of the real stars
    sig_w = jnp.where(jnp.isfinite(noisemap), noisemap / scale, jnp.nan)
    sig_w = jnp.where(star_valid[:, None, None], sig_w, jnp.nan)
    sigma_med = jnp.nanmedian(sig_w, axis=0)
    n_valid = jnp.maximum(star_valid.sum(), 1)
    mean_amp = jnp.sum(jnp.where(star_valid, a0, 0.0)) / n_valid
    sigma_med = sigma_med / jnp.maximum(mean_amp, 1e-12)
    # closed-form starlet noise weights: exact (no MC sampling noise)
    # and ~100x cheaper — the 64-sample MC estimate was 0.99 s of a
    # 2.34 s 16-frame bucket (tools/psf_roofline.py); `key` is retained
    # in the signature for the MC fallback but unused here
    W = _grid_noise_weights_closed(sigma_med, m, s, n_starlet_scales(m),
                                   base_consts.get("dft_mats"),
                                   dft_precision=dft_precision)
    consts2 = {**base_consts, "W": W,
               "lam": jnp.asarray(regularization_strength, jnp.float32),
               "fixed": fixed2}
    best2, _, hist2 = adabelief_scan(
        loss_pixels, free2, consts2,
        {k: _subset(lower, {k: free2[k]})[k] for k in free2},
        {k: _subset(upper, {k: free2[k]})[k] for k in free2},
        n_iter_adabelief, adabelief_lr, True)

    kwargs_final = {**best2, "kwargs_moffat": best1["kwargs_moffat"]}
    if not field_distortion:
        kwargs_final["kwargs_distortion"] = \
            kwargs_init["kwargs_distortion"]
    dft_mats = base_consts.get("dft_mats")
    narrow = model.narrow_psf(kwargs_final)
    full = model.full_psf(kwargs_final, dft_mats=dft_mats)
    model_imgs = model.model(kwargs_final, stamp_coords, dft_mats)
    chi2_per_star = _masked_chi2_per_star(d, model_imgs, sigma_2, masks)
    n_good = masks.sum(axis=(1, 2))
    chi2 = jnp.sum(jnp.where(n_good > 0, chi2_per_star, 0.0)) \
        / jnp.maximum((n_good > 0).sum(), 1)
    return {
        "narrow_psf": narrow,
        "full_psf": full,
        "chi2": chi2,
        "chi2_per_star": chi2_per_star,
        "scale": scale,
        "kwargs_moffat": kwargs_final["kwargs_moffat"],
        "kwargs_distortion": kwargs_final["kwargs_distortion"],
        "residuals": scale * (d - model_imgs),
        "loss_history_analytic": hist1,
        "loss_history_pixels": hist2,
    }


@functools.partial(
    jax.jit,
    static_argnames=("n_stars", "n_pix", "s", "field_distortion",
                     "n_iter_analytic", "n_iter_adabelief",
                     "irfft_backend", "dft_precision", "dft_pad"))
def _fit_frames(data, noisemap, masks, stamp_coords, fwhm0, keys, n_stars,
                n_pix, s, field_distortion, n_iter_analytic,
                n_iter_adabelief, regularization_strength, adabelief_lr,
                irfft_backend, dft_precision, dft_pad=None):
    fit = functools.partial(
        _fit_one_frame, n_stars=n_stars, n_pix=n_pix, s=s,
        field_distortion=field_distortion,
        n_iter_analytic=n_iter_analytic,
        n_iter_adabelief=n_iter_adabelief,
        regularization_strength=regularization_strength,
        adabelief_lr=adabelief_lr, irfft_backend=irfft_backend,
        dft_precision=dft_precision, dft_pad=dft_pad)
    return jax.vmap(fit)(data, noisemap, masks, stamp_coords, fwhm0, keys)


def build_psf_batched(images, noisemaps, subsampling_factor, masks=None,
                      stamp_coordinates=None, guess_fwhm_pixels=None,
                      n_iter_analytic=100, n_iter_adabelief=3000,
                      field_distortion=False, regularization_strength=1.0,
                      adabelief_lr=5e-4, seed=0, mesh="auto",
                      fetch="numpy", dft_pad=None):
    """Fit the narrow PSFs of many frames in one compiled program.

    Args:
        images: (F, N, n, n) star stamps — F frames, N stars each (pad
            missing stars with zeros and masks=False; any noise padding
            value works — masked pixels get unit variance internally so
            zero-noise pads cannot NaN the gradients).
        noisemaps: (F, N, n, n) noise sigmas.
        subsampling_factor: int s.
        masks: (F, N, n, n) bool, True = good pixel.
        stamp_coordinates: (F, N, 2) rescaled star positions (distortion).
        guess_fwhm_pixels: (F,) per-frame seeing guess.
        mesh: "auto" (default) shards the frame axis across all visible
            devices when there is more than one (parallel/batch.py — the
            per-frame fits are independent, so this is collective-free
            pure data parallelism); None forces single-device; or an
            explicit 1-D ``batch`` mesh.  Frame counts that do not
            divide the mesh are padded with duplicate frames, stripped
            from the result.
        fetch: "numpy" (default) blocks and returns host arrays;
            "device" returns the jitted call's UNMATERIALIZED jax
            arrays — dispatch is asynchronous, so the caller can issue
            the next bucket's fit and fetch these results while the
            device computes it (processes/psf_modelling.py pipelines
            buckets this way; device->host time then overlaps compute).

    Returns:
        dict of stacked per-frame results (numpy, or jax arrays with
        fetch="device").
    """
    images = np.asarray(images, dtype=np.float32)
    n_frames, n_stars, n_pix = images.shape[:3]
    if masks is None:
        masks = np.isfinite(images)
    else:
        # compose with, never replace, the finite guard: a user mask
        # marking a NaN pixel good would otherwise enter the fit as a
        # zero-flux measurement at full weight (nan_to_num in
        # _fit_one_frame) — same joint sanitization as build_psf and
        # deconv/batched.fit_stars_batched
        masks = np.asarray(masks, dtype=bool) & np.isfinite(images) \
            & np.isfinite(np.asarray(noisemaps, dtype=np.float32))
    if stamp_coordinates is None:
        stamp_coordinates = np.zeros((n_frames, n_stars, 2), np.float32)
    if guess_fwhm_pixels is None:
        guess_fwhm_pixels = np.full((n_frames,), 3.0, np.float32)
    guess_fwhm_pixels = np.where(
        np.isfinite(guess_fwhm_pixels), guess_fwhm_pixels, 3.0)
    from ...ops import get_dft_precision, get_irfft_backend
    from ...parallel.batch import (auto_batch_mesh, gather_to_host,
                                   pad_batch_arrays, strip_batch)

    if mesh == "auto":
        mesh = auto_batch_mesh()
    # keys are split for the REAL frame count and padded like the data:
    # splitting for the padded count would hand the real frames
    # different MC-weight keys than the unsharded path
    keys = np.asarray(jax.random.split(jax.random.PRNGKey(seed),
                                       n_frames))
    arrays = (images, np.asarray(noisemaps, dtype=np.float32),
              np.asarray(masks, dtype=bool),
              np.asarray(stamp_coordinates, dtype=np.float32),
              np.asarray(guess_fwhm_pixels, dtype=np.float32), keys)
    if mesh is not None and mesh.size > 1:
        arrays, n_pad = pad_batch_arrays(mesh, *arrays)
    else:
        arrays, n_pad = tuple(jnp.asarray(a) for a in arrays), 0
    *arrays, keys = arrays

    # a sharded mesh forces the matmul-DFT backend (the FFT op cannot
    # be partitioned; see core/deconv/batched.fit_stars_batched)
    irfft_backend = "mxu" if (mesh is not None and mesh.size > 1) \
        else get_irfft_backend()
    out = _fit_frames(
        *arrays, keys, n_stars, int(n_pix), int(subsampling_factor),
        bool(field_distortion), int(n_iter_analytic),
        int(n_iter_adabelief), float(regularization_strength),
        float(adabelief_lr), irfft_backend, get_dft_precision(),
        None if dft_pad is None else int(dft_pad))
    # multi-host: every process must gather before it can materialize
    # (fetch="device" callers also need addressable leaves)
    out = strip_batch(gather_to_host(mesh, out), n_pad)
    if fetch == "device":
        return out
    return jax.tree_util.tree_map(np.asarray, out)
