"""Joint multi-epoch PSF photometry of the reference stars.

Per star: all its (good-PSF) frames are modelled JOINTLY — one point
source pinned at the stamp center, per-epoch free flux, optional uniform
per-epoch pedestal and/or a shared starlet-regularized pixel background —
equivalent to PSF photometry but with the exact machinery of the final
ROI modelling so systematics cancel (reference
lightcurver/processes/star_photometry.py:23-151,232-373).
"""

import logging
from datetime import datetime
from time import time

import h5py
import numpy as np

from ..structure.database import (execute_sqlite_query, executemany_sqlite,
                                  select_stars, select_stars_for_a_frame,
                                  get_pandas)
from ..structure.user_config import get_user_config
from ..utilities.chi2_selector import get_chi2_bounds
from ..utilities.footprint import get_combined_footprint_hash
from ..utilities.image_coordinates import rescale_image_coordinates
from ..core.deconv.model import setup_model
from ..core.deconv.loss import Loss
from ..core.params import Params
from ..core.optimize import Optimizer, warn_if_unconverged
from ..core.noise import propagate_noise
from ..core.fisher import get_flux_uncertainties
from ..core.psf.distortion import apply_distortion


def do_one_star_forward_modelling(data, noisemap, psf, subsampling_factor,
                                  n_iter=2000,
                                  uniform_background_per_epoch=False,
                                  starlet_global_background=True):
    """Joint forward modelling of N epochs of one star.

    Returns a dict with fluxes (data units, 1D), uncertainties, per-frame
    reduced chi2, loss curve, residuals, the high-res model, and the
    fitted background channel (reference star_photometry.py:23-151).
    """
    data = np.array(data, dtype=np.float32)
    noisemap = np.array(noisemap, dtype=np.float32)
    scale = float(np.nanmax(data))
    if not np.isfinite(scale) or scale <= 0:
        scale = 1.0
    data /= scale
    noisemap /= scale
    # flux init first (it expects the NaNs), then sanitize: a single
    # NaN pixel reaching the loss would NaN every gradient through the
    # nansum VJP and the fit would silently return its init

    # flux init: stamp sum minus a border-median background estimate
    borders = np.nanmean([
        np.nanmedian(data[:, :1, :], axis=(1, 2)),
        np.nanmedian(data[:, :, :1], axis=(1, 2)),
        np.nanmedian(data[:, -1:, :], axis=(1, 2)),
        np.nanmedian(data[:, :, -1:], axis=(1, 2)),
    ], axis=0)
    borders = np.nan_to_num(borders, nan=0.0)
    a_est = np.nansum(data, axis=(1, 2)) - data[0].size * borders

    # dead (any-NaN) pixels: zero data, inflated noise — same guard the
    # batched pipeline path applies before calling into the core
    isnan = np.isnan(data) | np.isnan(noisemap)
    data[isnan] = 0.0
    noisemap[isnan] = 1e7
    sigma_2 = noisemap**2

    model, kwargs_init, kwargs_up, kwargs_down, _ = setup_model(
        data, sigma_2, psf, np.array([0.0]), np.array([0.0]),
        subsampling_factor, a_est)

    # the point source STARTS at the origin (plate solving + proper
    # motions put it there); positions stay free so per-epoch
    # miscentering is absorbed — only rotation, background grid and
    # pedestal are fixed, as in the reference (star_photometry.py:74-87)
    n_epochs = len(data)
    m = model.m
    kwargs_fixed = {
        "kwargs_analytic": {
            "alpha": kwargs_init["kwargs_analytic"]["alpha"],
        },
        "kwargs_background": {
            "h": np.zeros(m * m, dtype=np.float32),
            "mean": np.zeros(n_epochs, dtype=np.float32),
        },
        "kwargs_sersic": {},
    }
    if uniform_background_per_epoch:
        del kwargs_fixed["kwargs_background"]["mean"]
    if starlet_global_background:
        del kwargs_fixed["kwargs_background"]["h"]

    parameters = Params(kwargs_init, kwargs_fixed, kwargs_up, kwargs_down)

    kwargs_loss = {
        "data": data,
        "deconv_class": model,
        "param_class": parameters,
        "sigma_2": sigma_2,
        "regularization_terms": "l1_starlet",
        "regularization_strength_scales": 3.0,
        "regularization_strength_hf": 3.0,
        "regularization_strength_flux_uniformity": 0.0,
    }
    if starlet_global_background:
        kwargs_loss["W"] = propagate_noise(
            model, noisemap, kwargs_init, wavelet_type_list=["starlet"],
            method="SLIT", num_samples=200, seed=1,
            likelihood_type="chi2",
            upsampling_factor=subsampling_factor)[0]
    loss = Loss(**kwargs_loss)
    optim = Optimizer(loss, parameters, method="adabelief")
    optim.minimize(max_iterations=n_iter, init_learning_rate=1e-3,
                   schedule_learning_rate=True, restart_from_init=True)

    kwargs_final = parameters.best_fit_values(as_kwargs=True)
    # exact GLS flux polish (see core/fisher.linear_flux_solve)
    from ..core.fisher import linear_flux_solve
    import jax.numpy as jnp

    kwargs_final = linear_flux_solve(
        kwargs_final, jnp.asarray(data), jnp.asarray(sigma_2), model)
    modelled = np.asarray(model.model(kwargs_final))
    residuals = data - modelled
    chi2_per_frame = np.nansum(residuals**2 / sigma_2,
                               axis=(1, 2)) / model.image_size**2
    fluxes = scale * np.asarray(kwargs_final["kwargs_analytic"]["a"])
    flux_uncertainties = scale * get_flux_uncertainties(
        kwargs=kwargs_final, kwargs_up=kwargs_up, kwargs_down=kwargs_down,
        data=data, noisemap=noisemap, model=model)
    high_res, background_only = model.getDeconvolved(kwargs_final, 0)

    return {
        "scale": scale,
        "kwargs_final": kwargs_final,
        "fluxes": fluxes,
        "fluxes_uncertainties": flux_uncertainties,
        "chi2": float(np.nanmean(chi2_per_frame)),
        "chi2_per_frame": np.asarray(chi2_per_frame),
        "loss_curve": optim.loss_history,
        "residuals": scale * residuals,
        "deconvolved_image": scale * np.asarray(high_res),
        "starlet_background": scale * np.asarray(background_only),
    }


def _derived_psf_ref(frame_id, user_config, combined_footprint_hash,
                     cache=None):
    """The PSF model name the CURRENT config selects for a frame
    (mirrors psf_modelling's naming: 'psf_' + sorted star names)."""
    if cache is not None and frame_id in cache:
        return cache[frame_id]
    stars_psf = select_stars_for_a_frame(
        frame_id=frame_id,
        stars_to_use=user_config["stars_to_use_psf"],
        stars_to_exclude=user_config["stars_to_exclude_psf"],
        combined_footprint_hash=combined_footprint_hash)
    ref = "psf_" + "".join(sorted(stars_psf["name"]))
    if cache is not None:
        cache[frame_id] = ref
    return ref


def get_frames_for_star(combined_footprint_hash, gaia_id, psf_fit_chi2_min,
                        psf_fit_chi2_max, only_fluxless_frames=False,
                        psf_ref_cache=None, user_config=None):
    """Frames containing the star, gated on PSF chi2; optionally only
    frames still missing a flux (the incremental mechanism).

    ``user_config``: pass the caller's config; loading it here would
    re-read + re-derive the YAML once PER STAR in the task loop."""
    query = """
    SELECT f.*, ps.chi2, ps.psf_ref
    FROM frames f
    JOIN stars_in_frames sif
        ON f.id = sif.frame_id AND sif.combined_footprint_hash = ?
    """
    if only_fluxless_frames:
        query += ("LEFT JOIN star_flux_in_frame sff ON f.id = sff.frame_id "
                  "AND sif.star_gaia_id = sff.star_gaia_id "
                  "AND sif.combined_footprint_hash = "
                  "sff.combined_footprint_hash\n")
    query += """
    JOIN PSFs ps ON f.id = ps.frame_id
        AND sif.combined_footprint_hash = ps.combined_footprint_hash
    WHERE sif.star_gaia_id = ?
    """
    if only_fluxless_frames:
        query += "AND sff.frame_id IS NULL\n"
    # chi2 gate applied to the JOINED PSF row (same footprint hash).
    # The reference phrases this as an EXISTS subquery whose inner
    # alias shadows the join and omits the hash constraint (reference
    # processes/star_photometry.py:190-196), so its gate can match a
    # different footprint's PSF row; this implements the documented
    # intent ("frames ... have a PSF with chi2 between the bounds").
    query += """
    AND ps.chi2 BETWEEN ? AND ?"""
    params = (combined_footprint_hash, gaia_id, psf_fit_chi2_min,
              psf_fit_chi2_max)
    frames = execute_sqlite_query(query, params, use_pandas=True)
    if len(frames):
        # several PSF models can exist per frame (older star sets).
        # The gate must judge the PSF the fit will actually USE — the
        # one the current config derives — not an arbitrary surviving
        # row: a stale passing row must not admit a frame whose current
        # PSF failed the chi2 bounds (and since the SQL gate already
        # removed failing rows, keeping only the current ref here
        # composes to 'admit iff the current PSF passed').
        if user_config is None:
            user_config = get_user_config()
        current_ref = frames["id"].map(lambda fid: _derived_psf_ref(
            fid, user_config, combined_footprint_hash, psf_ref_cache))
        frames = frames[frames["psf_ref"] == current_ref]
        frames = frames.drop_duplicates(subset=["id"], ignore_index=True)
    return frames


def update_star_fluxes(flux_data):
    """Upsert measured fluxes (idempotent re-runs)."""
    executemany_sqlite(
        """INSERT INTO star_flux_in_frame (combined_footprint_hash,
           frame_id, star_gaia_id, flux, flux_uncertainty, chi2,
           relative_loss_differential) VALUES (?, ?, ?, ?, ?, ?, ?)
           ON CONFLICT(combined_footprint_hash, frame_id, star_gaia_id)
           DO UPDATE SET flux=excluded.flux,
           flux_uncertainty=excluded.flux_uncertainty,
           chi2=excluded.chi2,
           relative_loss_differential=excluded.relative_loss_differential""",
        flux_data)


def _load_star_epochs(user_config, h5f, frames, star, footprint_hash,
                      psf_ref_cache=None):
    """Per-frame stamps + matching narrow PSFs (distortion-evaluated)."""
    data, noisemap, mask, psf = [], [], [], []
    for _, frame in frames.iterrows():
        rel = frame["image_relpath"]
        gaia_id = str(star["gaia_id"])
        data.append(h5f[f"{rel}/data/{gaia_id}"][...])
        noisemap.append(h5f[f"{rel}/noisemap/{gaia_id}"][...])
        mask.append(h5f[f"{rel}/cosmicsmask/{gaia_id}"][...])
        psf_ref = _derived_psf_ref(frame["id"], user_config,
                                   footprint_hash, psf_ref_cache)
        narrow_psf = h5f[f"{rel}/{psf_ref}/narrow_psf"][...]
        if user_config["field_distortion"]:
            dist_group = h5f[f"{rel}/{psf_ref}/distortion"]
            kwargs_distortion = {k: dist_group[k][...] for k in dist_group}
            position = h5f[
                f"{rel}/image_pixel_coordinates/{gaia_id}"][...]
            frame_shape = h5f[f"{rel}/frame_shape"][...]
            position = rescale_image_coordinates(position, frame_shape)
            narrow_psf = apply_distortion(narrow_psf, kwargs_distortion,
                                          position)
        psf.append(narrow_psf)
    return (np.array(data), np.array(noisemap),
            np.array(mask).astype(bool), np.array(psf))


def do_star_photometry():
    """Pipeline task: joint PSF photometry of every reference star.

    Stars are fitted in one BATCHED (vmapped) program per bucket —
    epochs padded to the bucket maximum with zero-weight dummies —
    instead of the reference's serial per-star loop
    (star_photometry.py:257).  On a multi-chip backend the star axis is
    additionally sharded across the device mesh (fit_stars_batched
    mesh="auto", parallel/batch.py): per-star fits are independent, so
    the partitioned program is collective-free and scales linearly in
    chips.
    """
    logger = logging.getLogger("lightcurver.star_photometry")
    user_config = get_user_config()
    frames_ini = get_pandas(
        columns=["id"],
        conditions=["plate_solved = 1", "eliminated = 0",
                    "roi_in_footprint = 1"])
    footprint_hash = get_combined_footprint_hash(
        user_config, frames_ini["id"].to_list())
    stars = select_stars(
        stars_to_use=user_config["stars_to_use_norm"],
        combined_footprint_hash=footprint_hash,
        stars_to_exclude=user_config["stars_to_exclude_norm"])
    logger.info(f"PSF photometry for {len(stars)} stars.")
    only_fluxless = not user_config["redo_star_photometry"]
    time_now = datetime.now().strftime("%Y-%m-%dT%H-%M-%S")

    # gather per-star jobs (host IO); ONE read-only open for the loop
    jobs = []
    chi2_min, chi2_max = get_chi2_bounds(psf_or_fluxes="psf")
    psf_ref_cache = {}  # frame_id -> config-derived psf_ref, per task
    with h5py.File(user_config["regions_path"], "r") as h5f:
      for _, star in stars.iterrows():
        frames = get_frames_for_star(
            gaia_id=star["gaia_id"], psf_fit_chi2_min=chi2_min,
            psf_fit_chi2_max=chi2_max, only_fluxless_frames=only_fluxless,
            combined_footprint_hash=footprint_hash,
            psf_ref_cache=psf_ref_cache, user_config=user_config)
        if len(frames) == 0:
            logger.info(f"Star {star['name']}: up to date.")
            continue
        data, noisemap, cosmics, psf = _load_star_epochs(
            user_config, h5f, frames, star, footprint_hash,
            psf_ref_cache=psf_ref_cache)
        # ANY-NaN pixels are dead: zero the data AND inflate the noise
        # (a NaN datum with finite noise would otherwise enter the fit
        # as a zero-flux measurement at full weight)
        isnan = np.isnan(data) | np.isnan(noisemap)
        data[isnan] = 0.0
        noisemap[isnan] = 1e7
        noisemap[cosmics] *= 1000.0  # cosmics True = bad pixel
        jobs.append({"star": star, "frames": frames, "data": data,
                     "noisemap": noisemap, "psf": psf})
    if not jobs:
        return

    t0 = time()
    # bucket the stars: the measured batch curve peaks at ~32 stars per
    # compiled fit on v5e (15.4 / 24.9 / 17.5 stars/s at 8 / 32 / 128 —
    # batch 128's working set regresses throughput ~30%), so large star
    # sets run as buckets with bucket i's fetch + store overlapping
    # bucket i+1's device compute (the PSF task's pipelined pattern)
    batch_size = int(user_config.get("star_fit_batch_size", 32) or 0) \
        or len(jobs)
    buckets = [jobs[lo:lo + batch_size]
               for lo in range(0, len(jobs), batch_size)]
    checkpointing = int(user_config["deconv_checkpoint_every"] or 0) > 0

    def store_bucket(bucket, out, t0b):
        results = _collect_star_results(out, bucket)
        logger.info(f"Collected {len(bucket)} star fits "
                    f"{time() - t0b:.1f}s after dispatch.")
        for job, result in zip(bucket, results):
            _store_star_result(user_config, job, result, footprint_hash,
                               time_now, logger)

    if checkpointing or len(buckets) == 1:
        # checkpoint segments synchronize anyway; fetch="device" would
        # buy nothing (and is unsupported with a checkpoint_path)
        for bucket in buckets:
            t0b = time()
            out = _dispatch_star_jobs(user_config, bucket,
                                      fetch="numpy")
            store_bucket(bucket, out, t0b)
    else:
        from .psf_modelling import run_pipelined_buckets

        run_pipelined_buckets(
            buckets, lambda bucket: bucket,
            lambda bucket: _dispatch_star_jobs(user_config, bucket,
                                               fetch="device"),
            store_bucket)
    logger.info(f"Fitted {len(jobs)} stars jointly in "
                f"{time() - t0:.1f}s (batched, "
                f"{len(buckets)} bucket(s)).")


def _dispatch_star_jobs(user_config, jobs, fetch="numpy"):
    """Pad one bucket of stars to a common epoch count and dispatch it.

    ``fetch="device"`` returns the result tree unmaterialized (jitted
    dispatch is asynchronous) so the caller can overlap this bucket's
    device compute with the previous bucket's fetch + store
    (run_pipelined_buckets); ``fetch="numpy"`` blocks and is required
    when mid-fit checkpointing is on (segments synchronize anyway).
    """
    from ..core.deconv.batched import fit_stars_batched

    n_max = max(len(j["data"]) for j in jobs)
    n_pix = jobs[0]["data"].shape[-1]
    mp = jobs[0]["psf"].shape[-1]
    S = len(jobs)
    data = np.zeros((S, n_max, n_pix, n_pix), np.float32)
    noise = np.full((S, n_max, n_pix, n_pix), 1e7, np.float32)
    psf = np.zeros((S, n_max, mp, mp), np.float32)
    for i, job in enumerate(jobs):
        k = len(job["data"])
        data[i, :k] = job["data"]
        noise[i, :k] = job["noisemap"]
        psf[i, :k] = job["psf"]
        psf[i, k:] = job["psf"][0]  # dummy epochs need a valid PSF

    # opt-in mid-fit checkpointing (deconv_checkpoint_every), keyed by
    # the bucket's star set + batch shape; the array CONTENT is digested
    # inside fit_stars_batched (a mismatch discards the checkpoint below)
    checkpoint_every = int(user_config["deconv_checkpoint_every"] or 0)
    checkpoint_path = None
    if checkpoint_every > 0:
        import hashlib

        user_config["checkpoints_dir"].mkdir(exist_ok=True, parents=True)
        job_key = hashlib.sha256(
            (",".join(str(j["star"]["gaia_id"]) for j in jobs)
             + f":{data.shape}").encode()).hexdigest()[:16]
        checkpoint_path = (user_config["checkpoints_dir"]
                           / f"star_photometry_{job_key}.ckpt")

    def run_batched_fit():
        return fit_stars_batched(
            data, noise, psf, user_config["subsampling_factor"],
            n_iter=user_config["star_deconv_n_iter"],
            uniform_background_per_epoch=user_config[
                "star_photometry_uniform_background_per_epoch"],
            starlet_global_background=user_config[
                "star_photometry_starlet_global_background"],
            checkpoint_path=checkpoint_path,
            checkpoint_every=checkpoint_every or 500,
            fetch=fetch if checkpoint_path is None else "numpy")

    from ..utilities.checkpoints import run_discarding_stale_checkpoint

    # inputs/budget may legitimately change under the same pending-star
    # set (this task re-derives them from SQL): a resume refusal
    # discards the stale checkpoint instead of wedging every re-run
    out = run_discarding_stale_checkpoint(
        run_batched_fit, checkpoint_path,
        logging.getLogger("lightcurver.star_photometry"))
    if checkpoint_path is not None:
        # missing_ok: on a pod, N processes race to clean up the one
        # shared file that only process 0 wrote
        checkpoint_path.unlink(missing_ok=True)
    return out


def _collect_star_results(out, jobs):
    """Materialize a dispatched bucket into per-star result dicts."""
    out = {key: np.asarray(val) for key, val in out.items()}
    results = []
    for i, job in enumerate(jobs):
        k = len(job["data"])
        results.append({
            "fluxes": out["fluxes"][i, :k],
            "fluxes_uncertainties": out["fluxes_uncertainties"][i, :k],
            "chi2_per_frame": out["chi2_per_frame"][i, :k],
            "chi2": float(np.nanmean(out["chi2_per_frame"][i, :k])),
            "loss_curve": out["loss_history"][i],
            "residuals": out["residuals"][i, :k],
            "starlet_background": out["starlet_background"][i],
        })
    return results


def _fit_star_jobs_batched(user_config, jobs):
    """One bucket, synchronously: dispatch + collect (test/API shim)."""
    return _collect_star_results(
        _dispatch_star_jobs(user_config, jobs, fetch="numpy"), jobs)


def _store_star_result(user_config, job, result, footprint_hash,
                       time_now, logger):
    """Plots + DB upsert for one fitted star."""
    star, frames = job["star"], job["frames"]
    data, noisemap = job["data"], job["noisemap"]

    try:
        from ..plotting.joint_modelling_plotting import \
            plot_joint_modelling_diagnostic

        plot_dir = (user_config["plots_dir"] / "star_modelling"
                    / str(footprint_hash))
        plot_dir.mkdir(exist_ok=True, parents=True)
        kwargs_plot = {
            "datas": data, "noisemaps": noisemap,
            "residuals": result["residuals"],
            "chi2_per_frame": result["chi2_per_frame"],
            "loss_curve": result["loss_curve"],
            "save_path": plot_dir / (f"{time_now}_joint_modelling_"
                                     f"star_{star['name']}.jpg"),
        }
        if user_config["star_photometry_starlet_global_background"]:
            kwargs_plot["starlet_background"] = \
                result["starlet_background"]
        plot_joint_modelling_diagnostic(**kwargs_plot)
    except Exception as e:
        logger.warning(f"Star modelling plot failed: {e}")

    rld = warn_if_unconverged(result["loss_curve"], logger,
                              f"Star {star['name']} joint fit",
                              "star_deconv_n_iter")
    flux_data = [
        (footprint_hash, int(frame["id"]), star["gaia_id"],
         float(result["fluxes"][j]),
         float(result["fluxes_uncertainties"][j]),
         float(result["chi2_per_frame"][j]), rld)
        for j, (_, frame) in enumerate(frames.iterrows())]
    update_star_fluxes(flux_data)
    logger.info(f"Star {star['name']}: {len(frames)} frames, chi2 "
                f"{result['chi2']:.02f}.")
