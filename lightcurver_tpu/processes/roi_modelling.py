"""Joint multi-epoch forward modelling ("deconvolution") of the ROI.

The pipeline's final and hottest step (reference
lightcurver/processes/roi_modelling.py:128-497): all prepared ROI cutouts
are modelled jointly — shared pixelated background + per-epoch point
sources at shared sky positions — in two stages (translations/fluxes with
L-BFGS, then everything with AdaBelief under starlet regularization),
yielding light curves, astrometry, a high-resolution image, and
diagnostic stacks.

TPU notes: when several devices are visible the stage-2 fit runs
epoch-sharded over a 1-D mesh for ANY epoch count — non-divisible counts
are padded with zero-weight dummy epochs whose loss contribution is
exactly masked out (parallel/deconv.pad_epoch_stacks; equivalence pinned
by tests/test_parallel.py).  All heavy arrays flow through ``consts``
(see core/optimize.py module docstring).
"""

import json
import logging
from copy import deepcopy
from datetime import datetime
from pathlib import Path

import h5py
import numpy as np
import pandas as pd
from scipy.ndimage import shift, rotate

from ..structure.user_config import get_user_config
from ..structure.database import get_pandas
from ..utilities.footprint import get_combined_footprint_hash
from ..utilities.lightcurves_postprocessing import (
    convert_flux_to_magnitude, group_observations)
from ..io.wcs import TanWCS
from ..io.fits import write_fits, Header
from ..core.deconv.model import setup_model
from ..core.deconv.loss import Loss, Prior
from ..core.params import Params
from ..core.optimize import Optimizer
from ..core.noise import propagate_noise
from ..core.fisher import get_flux_uncertainties


def circular_aperture_photometry(image, positions, radius):
    """Sum of pixels within ``radius`` of each (x, y) position.

    photutils.aperture replacement for the flux initial guess
    (reference roi_modelling.py:198-204); pixel-center membership.
    """
    yy, xx = np.mgrid[0:image.shape[0], 0:image.shape[1]]
    out = []
    for x, y in positions:
        sel = (xx - x) ** 2 + (yy - y) ** 2 <= radius**2
        out.append(float(np.nansum(image[sel])))
    return out


def align_data_interpolation(array, kwargs):
    """De-rotate + de-translate epochs per the fitted dx/dy/alpha.

    Interpolation-based: DIAGNOSTIC use only (the model itself never
    interpolates).
    """
    ka = kwargs["kwargs_analytic"]
    dx, dy = np.asarray(ka["dx"]), np.asarray(ka["dy"])
    alpha = np.asarray(ka["alpha"])
    return np.array([
        rotate(shift(a, (-ddy, -ddx)), alph, reshape=False)
        for a, ddx, ddy, alph in zip(array, dx, dy, alpha)])


def stack_epochs_sigma_clipped(data, noisemap, n_sigma=3):
    """Weighted average stack with per-pixel median sigma clipping.

    ccdproc.Combiner replacement (reference roi_modelling.py:60-83):
    weights 1/noisemap, pixels beyond n_sigma sample-stds from the
    per-pixel median are excluded.
    """
    data = np.asarray(data, dtype=float)
    weights = 1.0 / np.asarray(noisemap, dtype=float)
    median = np.nanmedian(data, axis=0)
    std = np.nanstd(data, axis=0)
    keep = np.abs(data - median) <= n_sigma * std
    w = np.where(keep, weights, 0.0)
    denominator = w.sum(axis=0)
    denominator[denominator == 0] = np.nan
    return (w * np.nan_to_num(data)).sum(axis=0) / denominator


def stack_data_diagnostic(data, noisemap, kwargs, model):
    """Stacks of the data, data-minus-point-sources, data-minus-background."""
    kwargs_only_ps = deepcopy(kwargs)
    kwargs_only_ps["kwargs_background"]["h"] = \
        0.0 * kwargs_only_ps["kwargs_background"]["h"]
    kwargs_no_ps = deepcopy(kwargs)
    kwargs_no_ps["kwargs_analytic"]["a"] = \
        0.0 * kwargs_no_ps["kwargs_analytic"]["a"]

    data_no_ps = data - np.asarray(model.model(kwargs_only_ps))
    data_no_background = data - np.asarray(model.model(kwargs_no_ps))
    return {
        "stack": stack_epochs_sigma_clipped(
            align_data_interpolation(data, kwargs), noisemap),
        "stack_no_ps": stack_epochs_sigma_clipped(
            align_data_interpolation(data_no_ps, kwargs_only_ps), noisemap),
        "stack_no_background": stack_epochs_sigma_clipped(
            align_data_interpolation(data_no_background, kwargs_no_ps),
            noisemap),
    }


def stage2_checkpoint_digest(user_config, reg, fix_astrometry, data,
                             noisemap, psf, initial_c_x, initial_c_y,
                             starting_h=None, alpha=None):
    """Identity of everything the resumable stage-2 objective depends on.

    Beyond the raw input arrays, the digest folds in the loss
    CONFIGURATION: the regularization scalars, the astrometry handling
    (fixed / free / Gaussian-prior sigma) together with the point-source
    positions it pins, whether the background is free, the starting
    background pixels (``starting_background`` participates in the
    stage-2 objective both as the fixed/initial ``h`` and through the
    starlet noise weights W computed from kwargs_init), and the fixed
    per-epoch rotations.  A resumed AdaBelief carry is only a valid
    continuation of the exact objective it was optimizing — e.g.
    resuming a run made under a different
    ``regularization_strength_scales`` or a repointed
    ``starting_background`` would silently blend two different
    backgrounds.  (Mid-fit checkpointing is beyond the reference; the
    optimizer separately validates the iteration budget and parameter
    structure, see core/optimize.py.)
    """
    from ..core.optimize import arrays_digest

    loss_config = json.dumps(
        {"reg": reg,
         "fix_astrometry": fix_astrometry,
         "further_optimize_background":
             bool(user_config["further_optimize_background"])},
        sort_keys=True, default=float)
    return arrays_digest(
        np.frombuffer(loss_config.encode("utf-8"), dtype=np.uint8),
        data, noisemap, psf,
        np.asarray(initial_c_x, dtype=np.float64),
        np.asarray(initial_c_y, dtype=np.float64),
        np.zeros(0) if starting_h is None
        else np.asarray(starting_h, dtype=np.float64),
        np.zeros(0) if alpha is None
        else np.asarray(alpha, dtype=np.float64))


def _maybe_epoch_mesh(n_epochs):
    """A mesh over all devices whenever more than one is visible.

    Any epoch count shards: non-divisible counts (e.g. the reference's
    own 87-frame tutorial dataset on 8 chips) are padded with exactly
    masked dummy epochs (parallel/deconv.pad_epoch_stacks), never
    silently dropped to a single device.
    """
    import jax

    del n_epochs
    n_dev = jax.device_count()
    if n_dev > 1:
        from ..parallel.mesh import epoch_mesh

        return epoch_mesh(n_dev)
    return None


def do_modelling_of_roi():
    """Pipeline task: the joint ROI model. Optional (do_ROI_model)."""
    logger = logging.getLogger("lightcurver.roi_modelling")
    user_config = get_user_config()
    if not user_config["do_ROI_model"]:
        return

    frames_ini = get_pandas(
        columns=["id"],
        conditions=["plate_solved = 1", "eliminated = 0",
                    "roi_in_footprint = 1"])
    footprint_hash = get_combined_footprint_hash(
        user_config, frames_ini["id"].to_list())
    roi = user_config["roi_name"]
    roi_cutouts_file = user_config["prepared_roi_cutouts_path"]
    if roi_cutouts_file is None:
        roi_cutouts_file = (user_config["workdir"] / "prepared_roi_cutouts"
                            / f"cutouts_{footprint_hash}_{roi}.h5")

    with h5py.File(roi_cutouts_file, "r") as f:
        data = np.array(f["data"])
        noisemap = np.array(f["noisemap"])
        psf = np.array(f["psf"])
        seeings = np.array(f["seeing"])
        mjds = np.array(f["mjd"])
        zeropoint = np.array(f["global_zeropoint"])
        norm_errs = np.array(f["relative_normalization_error"])
        frame_ids = np.array(f["frame_id"])
        subsampling_factor = np.array(f["subsampling_factor"])
        pixel_scales = np.array(f["pixel_scale"])
        angles_to_north = np.array(f["angle_to_north"])
        wcs_strings = np.array(f["wcs"])
        sky_levels = np.array(f["sky_level_electron_per_second"])

    scale = float(np.nanmax(data))
    if not np.isfinite(scale) or scale <= 0:
        # degenerate cutouts (all-NaN or non-positive stack): dividing
        # would NaN/sign-flip everything and the fit would silently
        # return garbage; same guard as star_photometry's normalization
        scale = 1.0
    data /= scale
    noisemap /= scale

    unique_sub = np.unique(subsampling_factor)
    message = ("The PSF models seem to have different subsampling factors! "
               "Incompatible with joint modelling.")
    if unique_sub.size != 1:
        logger.error(message)
        # a hard error, not an assert: under python -O the joint fit
        # would silently misinterpret half the PSF grids
        raise RuntimeError(message)
    subsampling_factor = int(unique_sub[0])
    n_epochs, im_size_y, im_size_x = data.shape

    ps_coords = user_config["point_sources"]
    ordered_ps = sorted(ps_coords.keys())
    logger.info(f"Jointly modelling {n_epochs} ROI cutouts with "
                f"{len(ordered_ps)} point sources.")

    # reference frame: frame 0; per-epoch rotations relative to it
    ref_index = 0
    angles_to_north = angles_to_north - angles_to_north[ref_index]
    wcs_raw = wcs_strings[ref_index]
    if isinstance(wcs_raw, bytes):
        wcs_raw = wcs_raw.decode("utf-8")
    wcs_ref = TanWCS.from_header(json.loads(wcs_raw))
    xs, ys = [], []
    for ps in ordered_ps:
        x, y = wcs_ref.world_to_pixel(*ps_coords[ps])
        xs.append(float(x))
        ys.append(float(y))
    xs, ys = np.array(xs), np.array(ys)

    # flux initial guess: aperture sums on the median stack.  Seeing
    # can be NaN or the -1 'no sources' sentinel for individual frames
    # (estimate_seeing) — a poisoned average would zero every initial
    # flux via an empty aperture
    pixel_scale = float(np.nanmedian(pixel_scales))
    stack = np.nanmedian(data, axis=0)
    good_seeing = np.asarray(seeings, dtype=float)
    good_seeing = good_seeing[np.isfinite(good_seeing)
                              & (good_seeing > 0)]
    mean_seeing = float(good_seeing.mean()) if good_seeing.size \
        else 3.0 * pixel_scale
    radius = 0.66 * mean_seeing / pixel_scale
    aperture_fluxes = circular_aperture_photometry(
        stack, list(zip(xs, ys)), radius)

    offset_x = (im_size_x - 1) / 2.0
    offset_y = (im_size_y - 1) / 2.0
    initial_c_x = xs - offset_x
    initial_c_y = ys - offset_y
    initial_a = np.tile(np.array(aperture_fluxes, dtype=np.float32),
                        n_epochs)
    model, kwargs_init, kwargs_up, kwargs_down, _ = setup_model(
        data, noisemap**2, psf, initial_c_x, initial_c_y,
        subsampling_factor, initial_a)
    kwargs_init["kwargs_analytic"]["alpha"] = np.asarray(
        angles_to_north, dtype=np.float32)

    # astrometry handling: fixed / free / Gaussian prior
    fix_astrometry = user_config["fix_point_source_astrometry"]
    astrometric_prior = None
    if isinstance(fix_astrometry, bool):
        if fix_astrometry:
            logger.info("Fully fixing the astrometry to config values.")
    elif isinstance(fix_astrometry, float):
        logger.info(f"Gaussian astrometric prior, sigma = "
                    f"{fix_astrometry:.02f} px.")
        astrometric_prior = Prior(prior_analytic=[
            ["c_x", initial_c_x,
             np.full(len(initial_c_x), fix_astrometry)],
            ["c_y", initial_c_y,
             np.full(len(initial_c_y), fix_astrometry)],
        ])

    # optional starting background
    if user_config["starting_background"] is not None:
        bck_path = Path(user_config["starting_background"])
        if not bck_path.is_absolute():
            bck_path = user_config["workdir"] / bck_path
        if bck_path.name.lower().endswith((".fits", ".fit",
                                           ".fits.gz", ".fits.fz")):
            from ..io.fits import read_fits

            bck, _ = read_fits(bck_path)
        else:
            bck = np.load(bck_path)
        kwargs_init["kwargs_background"]["h"] = \
            np.asarray(bck, dtype=np.float32).ravel() / scale

    reg = user_config.get("roi_model_regularization", {}) or {}
    if not reg:
        logger.warning("No background regularization params in config: "
                       "using defaults.")

    mesh = _maybe_epoch_mesh(n_epochs)
    n_pad = 0
    n_sources = len(ordered_ps)
    model_fit, data_fit, var_fit, epoch_w = model, data, noisemap**2, None
    if mesh is not None:
        from ..parallel.deconv import pad_epoch_stacks

        data_fit, var_fit, psf_fit, epoch_w = pad_epoch_stacks(
            data, noisemap**2, psf, mesh.size)
        n_pad = data_fit.shape[0] - n_epochs
        if n_pad:
            from ..core.deconv.model import DeconvModel

            model_fit = DeconvModel(psf_fit, subsampling_factor,
                                    data.shape[-1], n_epochs + n_pad,
                                    n_sources)
        logger.info(f"Epoch-sharding the joint fit over {mesh.size} "
                    f"devices ({n_pad} zero-weight padding epochs).")

    # mid-fit checkpointing of the long stage-2 optimization, keyed by
    # footprint hash (the data identity), opt-in via
    # deconv_checkpoint_every; the checkpoint is deleted on success so a
    # stale file can never replay a finished fit against changed inputs
    checkpoint_every = int(user_config["deconv_checkpoint_every"] or 0)
    checkpoint_path = checkpoint_digest = None
    if checkpoint_every > 0:
        user_config["checkpoints_dir"].mkdir(exist_ok=True, parents=True)
        checkpoint_path = (user_config["checkpoints_dir"]
                           / f"roi_{footprint_hash}_{roi}_stage2.ckpt")
        checkpoint_digest = stage2_checkpoint_digest(
            user_config, reg, fix_astrometry, data, noisemap, psf,
            initial_c_x, initial_c_y,
            starting_h=kwargs_init["kwargs_background"]["h"],
            alpha=kwargs_init["kwargs_analytic"]["alpha"])

    def run_fit(kwargs_start, kwargs_fixed, method, n_iter, loss_kwargs,
                lr, schedule, checkpoint=False):
        if n_pad:
            from ..parallel.deconv import pad_epoch_kwargs

            kwargs_start = pad_epoch_kwargs(kwargs_start, n_epochs, n_pad,
                                            n_sources)
            kwargs_fixed = pad_epoch_kwargs(kwargs_fixed, n_epochs, n_pad,
                                            n_sources)
        params = Params(kwargs_start, kwargs_fixed, kwargs_up, kwargs_down)
        if mesh is not None:
            from ..parallel.deconv import shard_pytree

            params.free0 = shard_pytree(mesh, params.free0)
            params.fixed = shard_pytree(mesh, params.fixed)
            params.lower = shard_pytree(mesh, params.lower)
            params.upper = shard_pytree(mesh, params.upper)
            # the FFT op cannot be batch-partitioned: force the
            # matmul-DFT render so the epoch-sharded program stays
            # collective-free apart from the shared-gradient psum;
            # likewise keep the XLA starlet (the Pallas kernel has no
            # partitioning rule) — same guards as
            # parallel.fit_deconv_sharded
            loss_kwargs = dict(loss_kwargs)
            loss_kwargs.setdefault("irfft_backend", "mxu")
            loss_kwargs.setdefault("starlet_backend", "xla")
        loss = Loss(data_fit, model_fit, params, var_fit,
                    epoch_weights=epoch_w, **loss_kwargs)
        if mesh is not None:
            from ..parallel.deconv import shard_consts

            loss.consts = shard_consts(mesh, loss.consts)
        optim = Optimizer(loss, params, method=method)
        ckpt = checkpoint_path if (checkpoint and method == "adabelief") \
            else None
        optim.minimize(max_iterations=n_iter, init_learning_rate=lr,
                       schedule_learning_rate=schedule,
                       checkpoint_path=ckpt,
                       checkpoint_every=checkpoint_every or 500,
                       checkpoint_inputs_digest=checkpoint_digest)
        kwargs_best = params.best_fit_values(as_kwargs=True)
        if mesh is not None:
            # multi-host: epoch-sharded leaves are not fully
            # addressable; gather before any np.asarray downstream
            from ..parallel.batch import gather_to_host

            kwargs_best = gather_to_host(mesh, kwargs_best)
        if n_pad:
            from ..parallel.deconv import strip_epoch_kwargs

            kwargs_best = strip_epoch_kwargs(kwargs_best, n_epochs, n_pad,
                                             n_sources)
        return kwargs_best, optim

    # ---- stage 1: only dx, dy and fluxes free --------------------------
    kwargs_fixed_1 = deepcopy(kwargs_init)
    del kwargs_fixed_1["kwargs_analytic"]["dx"]
    del kwargs_fixed_1["kwargs_analytic"]["dy"]
    del kwargs_fixed_1["kwargs_analytic"]["a"]
    kwargs_partial1, _ = run_fit(
        kwargs_init, kwargs_fixed_1, "l-bfgs-b",
        user_config["roi_deconv_translations_iters"],
        dict(prior=astrometric_prior,
             regularization_strength_flux_uniformity=reg.get(
                 "regularization_scatter_fluxes_pre_optim", 10.0)),
        lr=1e-3, schedule=True)
    logger.info("Finished stage 1 (translations + fluxes).")

    # ---- stage 2: free everything relevant ------------------------------
    kwargs_fixed_2 = deepcopy(kwargs_partial1)
    if user_config["further_optimize_background"]:
        del kwargs_fixed_2["kwargs_background"]["h"]
    del kwargs_fixed_2["kwargs_background"]["mean"]
    del kwargs_fixed_2["kwargs_analytic"]["a"]
    del kwargs_fixed_2["kwargs_analytic"]["c_x"]
    del kwargs_fixed_2["kwargs_analytic"]["c_y"]
    del kwargs_fixed_2["kwargs_analytic"]["dx"]
    del kwargs_fixed_2["kwargs_analytic"]["dy"]
    if isinstance(fix_astrometry, bool) and fix_astrometry:
        kwargs_fixed_2["kwargs_analytic"]["c_x"] = initial_c_x
        kwargs_fixed_2["kwargs_analytic"]["c_y"] = initial_c_y

    W = propagate_noise(model, noisemap, kwargs_init,
                        wavelet_type_list=["starlet"], method="SLIT",
                        num_samples=500, seed=1, likelihood_type="chi2",
                        upsampling_factor=subsampling_factor)[0]
    def run_stage2():
        return run_fit(
            kwargs_partial1, kwargs_fixed_2, "adabelief",
            user_config["roi_deconv_all_iters"],
            dict(regularization_terms="l1_starlet",
                 regularization_strength_scales=reg.get(
                     "regularization_strength_scales", 1.0),
                 regularization_strength_hf=reg.get(
                     "regularization_strength_hf", 1.0),
                 regularization_strength_positivity=reg.get(
                     "regularization_strength_positivity", 100.0),
                 regularization_strength_pts_source=reg.get(
                     "regularization_strength_pts_source", 0.01),
                 regularization_strength_flux_uniformity=reg.get(
                     "regularization_scatter_fluxes_main_optim", 10.0),
                 W=W, prior=astrometric_prior),
            lr=1e-4, schedule=False, checkpoint=True)

    from ..utilities.checkpoints import run_discarding_stale_checkpoint

    # prepared cutouts or the iteration budget may legitimately change
    # under the same footprint hash: a resume refusal discards the
    # stale checkpoint instead of wedging every re-run
    kwargs_final, optim = run_discarding_stale_checkpoint(
        run_stage2, checkpoint_path, logger)
    if checkpoint_path is not None:
        # missing_ok: on a pod, N processes race to clean up the one
        # shared file that only process 0 wrote
        checkpoint_path.unlink(missing_ok=True)

    # exact GLS flux polish at the fitted positions and background
    from ..core.fisher import linear_flux_solve
    import jax.numpy as jnp

    kwargs_final = linear_flux_solve(
        kwargs_final, jnp.asarray(data), jnp.asarray(noisemap**2), model)

    out_dir = roi_cutouts_file.parent
    ka = kwargs_final["kwargs_analytic"]
    x_pixels = np.asarray(ka["c_x"]) + float(np.asarray(ka["dx"])[0]) \
        + offset_x
    y_pixels = np.asarray(ka["c_y"]) + float(np.asarray(ka["dy"])[0]) \
        + offset_y
    ra_post, dec_post = wcs_ref.pixel_to_world(x_pixels, y_pixels)
    astrometry = {ps: [float(r), float(d)]
                  for ps, r, d in zip(ordered_ps, np.atleast_1d(ra_post),
                                      np.atleast_1d(dec_post))}
    with open(out_dir / f"{footprint_hash}_{roi}_astrometry.json",
              "w") as ff:
        json.dump(astrometry, ff)

    per_epoch, per_night, residuals = get_fluxes_dataframe_from_model(
        model=model, kwargs=kwargs_final, kwargs_down=kwargs_down,
        kwargs_up=kwargs_up, data=data, noisemap=noisemap,
        point_sources_names=ordered_ps, model_scale=scale,
        normalization_errors=norm_errs, frame_ids=frame_ids, mjds=mjds,
        seeings=seeings, zeropoint=zeropoint,
        sky_level_electron_per_second=sky_levels)
    per_epoch.to_csv(
        out_dir / f"{footprint_hash}_{roi}_photometry_per_epoch.csv")
    per_night.to_csv(
        out_dir / f"{footprint_hash}_{roi}_photometry_per_night.csv")
    try:
        from ..plotting.html_visualisation import generate_lightcurve_html

        generate_lightcurve_html(
            per_night,
            out_dir / f"{footprint_hash}_{roi}_photometry_per_night.html")
    except Exception as e:
        logger.warning(f"HTML light-curve export failed: {e}")

    # diagnostic stacks + FITS outputs
    stacks = stack_data_diagnostic(data, noisemap, kwargs_final, model)
    ref_header = Header()
    ref_header.update(wcs_ref.to_header_cards())
    for stack_type, stacked in stacks.items():
        write_fits(out_dir / f"{footprint_hash}_{roi}_{stack_type}.fits",
                   scale * stacked, ref_header)

    high_res, background_only = model.getDeconvolved(kwargs_final, 0)
    # exact fine-grid alignment incl. the (s-1)/2 pool-center offset
    # and SIP carry-over (io/wcs.upsampled_wcs; the reference's plain
    # crpix *= s shifts every source by half a fine pixel)
    from ..io.wcs import upsampled_wcs

    wcs_highres = upsampled_wcs(wcs_ref, subsampling_factor)
    header_highres = Header()
    header_highres.update(wcs_highres.to_header_cards())
    zpt = float(np.atleast_1d(zeropoint)[0])
    if np.isfinite(zpt):
        header_highres["ZPT"] = zpt
    else:
        # FITS has no NaN card value; an absent zeropoint (no catalog
        # match) is recorded as commentary instead of an invalid card
        header_highres["COMMENT"] = "ZPT unavailable (no zeropoint)"
    write_fits(out_dir / f"{footprint_hash}_{roi}_high_res_model.fits",
               scale * np.asarray(high_res), header_highres)
    write_fits(out_dir / f"{footprint_hash}_{roi}_background.fits",
               scale * np.asarray(background_only), header_highres)

    try:
        from ..plotting.joint_modelling_plotting import \
            plot_joint_modelling_diagnostic

        plot_dir = (user_config["plots_dir"] / "pixel_modelling"
                    / str(footprint_hash))
        plot_dir.mkdir(exist_ok=True, parents=True)
        time_now = datetime.now().strftime("%Y-%m-%dT%H-%M-%S")
        plot_file = plot_dir / f"{time_now}_joint_modelling_roi_{roi}.jpg"
        plot_joint_modelling_diagnostic(
            datas=data, noisemaps=noisemap, residuals=residuals,
            chi2_per_frame=np.array(per_epoch["reduced_chi2"]),
            loss_curve=optim.loss_history, save_path=plot_file,
            starlet_background=np.asarray(background_only))
    except Exception as e:
        logger.warning(f"ROI modelling plot failed: {e}")
    from ..core.optimize import warn_if_unconverged

    rld = warn_if_unconverged(optim.loss_history, logger,
                              f"ROI {roi} stage-2 joint fit",
                              "roi_deconv_all_iters")
    logger.info("Finished modelling the ROI. Global reduced chi2: "
                f"{float(np.mean(per_epoch['reduced_chi2'])):.02f} "
                f"(loss plateau metric {rld:.4f}).")


def get_fluxes_dataframe_from_model(model, kwargs, kwargs_down, kwargs_up,
                                    data, noisemap, point_sources_names,
                                    model_scale, normalization_errors,
                                    frame_ids, mjds, seeings, zeropoint,
                                    sky_level_electron_per_second):
    """Light curves + uncertainties + chi2 per frame from the fit.

    Returns (per-epoch mags DataFrame, per-night mags DataFrame,
    residuals array).  Flux uncertainties compound the Fisher photon
    term with the per-frame normalization error (reference
    roi_modelling.py:420-497).
    """
    fluxes = np.asarray(kwargs["kwargs_analytic"]["a"])
    photon_err = np.asarray(get_flux_uncertainties(
        kwargs=kwargs, kwargs_down=kwargs_down, kwargs_up=kwargs_up,
        data=data, noisemap=noisemap, model=model))
    n_ps = len(point_sources_names)
    curves, d_curves = {}, {}
    for i, ps in enumerate(point_sources_names):
        curve = fluxes[i::n_ps] * model_scale
        photon = photon_err[i::n_ps] * model_scale
        norm = normalization_errors * curve
        curves[ps] = curve
        d_curves[ps] = np.sqrt(photon**2 + norm**2)

    modelled = np.asarray(model.model(kwargs))
    residuals = data - modelled
    chi2_per_frame = np.nansum(residuals**2 / noisemap**2,
                               axis=(1, 2)) / model.image_size**2

    rows = []
    for epoch in range(len(frame_ids)):
        row = {
            "frame_id": frame_ids[epoch],
            "mjd": mjds[epoch],
            "zeropoint": float(np.atleast_1d(zeropoint)[0]),
            "reduced_chi2": chi2_per_frame[epoch],
            "seeing": seeings[epoch],
            "sky_level_electron_per_second":
                sky_level_electron_per_second[epoch],
        }
        for ps in point_sources_names:
            row[f"{ps}_flux"] = curves[ps][epoch]
            row[f"{ps}_d_flux"] = d_curves[ps][epoch]
        rows.append(row)
    df_per_epoch = pd.DataFrame(rows).set_index("frame_id")
    df_per_night = group_observations(df_per_epoch)
    return (convert_flux_to_magnitude(df_per_epoch),
            convert_flux_to_magnitude(df_per_night), residuals)
