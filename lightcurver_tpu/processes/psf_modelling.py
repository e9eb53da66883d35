"""Per-frame narrow-PSF modelling task.

Mirrors the reference task (lightcurver/processes/psf_modelling.py:64-225):
select stars per frame, load their stamps from the regions HDF5,
auto-mask neighbouring objects, repair NaNs, drop stars >40% masked, fit
the two-phase narrow PSF (core/psf/build.py replaces STARRED build_psf),
persist narrow/full PSF + distortion to HDF5, and record chi2 / Moffat
FWHM / loss-plateau metric in the PSFs table.
"""

import logging
import threading
from pathlib import Path
from time import time

import h5py
import numpy as np

from ..structure.database import (select_stars_for_a_frame,
                                  execute_sqlite_query, get_pandas)
from ..structure.user_config import get_user_config
from ..utilities.footprint import get_combined_footprint_hash
from ..utilities.image_coordinates import rescale_image_coordinates
from ..core.psf.build import build_psf
from ..core.optimize import warn_if_unconverged
from .star_extraction import _segment


def check_psf_exists(frame_id, psf_ref, combined_footprint_hash):
    """Is this (frame, star set, footprint) PSF already in the DB?"""
    rows = execute_sqlite_query(
        "SELECT 1 FROM PSFs WHERE frame_id = ? AND psf_ref = ? "
        "AND combined_footprint_hash = ?",
        params=(frame_id, psf_ref, combined_footprint_hash))
    return len(rows) > 0


def mask_surrounding_stars(data, noisemap):
    """True = good pixel; masks every detected object except the central one.

    (reference psf_modelling.py:35-61, sep segmentation replaced by the
    in-repo connected-component segmentation)
    """
    data = np.nan_to_num(np.asarray(data, dtype=np.float32))
    var = np.nan_to_num(np.asarray(noisemap, dtype=np.float32),
                        nan=1e8) ** 2
    labels, seg = _segment(data, var, threshold=3.0, min_area=15)
    mask = np.ones_like(data, dtype=bool)
    if not labels:
        return mask
    cy = (data.shape[0] - 1) / 2.0
    cx = (data.shape[1] - 1) / 2.0
    dists = []
    for lab in labels:
        ys, xs = np.nonzero(seg == lab)
        w = data[ys, xs].clip(min=0) + 1e-9
        dists.append(np.hypot((xs * w).sum() / w.sum() - cx,
                              (ys * w).sum() / w.sum() - cy))
    central = labels[int(np.argmin(dists))]
    for lab in labels:
        if lab != central:
            mask[seg == lab] = False
    return mask


# serializes regions-HDF5 opens between the prefetch thread (read-only
# loads of the NEXT bucket) and the main thread (r+ stores of the
# current bucket's results): HDF5 file locking rejects an r+ open while
# a read handle is live in the same process, which would crash the task
# timing-dependently on large buckets
_REGIONS_IO_LOCK = threading.Lock()


def _load_star_stack(regions_file, relpath, gaia_ids):
    with _REGIONS_IO_LOCK, h5py.File(regions_file, "r") as f:
        base = f[relpath]
        datas = np.array([base["data"][g][...] for g in gaia_ids])
        noisemaps = np.array([base["noisemap"][g][...] for g in gaia_ids])
        cosmics = np.array([base["cosmicsmask"][g][...]
                            for g in gaia_ids]).astype(bool)
        frame_shape = base["frame_shape"][...]
        positions = np.array([base["image_pixel_coordinates"][g][...]
                              for g in gaia_ids])
    rescaled = rescale_image_coordinates(positions, frame_shape)
    return datas, noisemaps, ~cosmics, rescaled  # True = good pixel


def _prepare_frame_job(user_config, regions_file, frame,
                       combined_footprint_hash, logger):
    """Load + mask one frame's star stack; None when nothing to fit."""
    stars = select_stars_for_a_frame(
        frame_id=frame["id"],
        combined_footprint_hash=combined_footprint_hash,
        stars_to_use=user_config["stars_to_use_psf"],
        stars_to_exclude=user_config["stars_to_exclude_psf"])
    if len(stars) == 0:
        logger.warning(f"Frame {frame['id']}: no reference stars, "
                       "skipping.")
        return None
    psf_ref = "psf_" + "".join(sorted(stars["name"]))
    if check_psf_exists(frame["id"], psf_ref, combined_footprint_hash) \
            and not user_config["redo_psf"]:
        logger.info(f"Frame {frame['id']}: PSF {psf_ref} exists, "
                    "skipping.")
        return None

    gaia_ids = [str(g) for g in stars["gaia_id"]]
    datas, noisemaps, good_masks, stamp_coords = _load_star_stack(
        regions_file, frame["image_relpath"], gaia_ids)
    auto = np.array([mask_surrounding_stars(d, n)
                     for d, n in zip(datas, noisemaps)])
    masks = good_masks & auto
    isnan = np.isnan(datas) | np.isnan(noisemaps)
    datas[isnan] = 0.0
    noisemaps[isnan] = 1.0
    masks[isnan] = False

    # drop stars with > 40% masked pixels
    n_before = len(datas)
    frac_masked = (~masks).sum(axis=(1, 2)) / masks[0].size
    keep = frac_masked <= 0.4
    datas, noisemaps, masks = datas[keep], noisemaps[keep], masks[keep]
    stamp_coords = stamp_coords[keep]
    names = list(np.asarray(stars["name"])[keep])
    if len(datas) == 0:
        logger.warning(f"Frame {frame['id']}: all {n_before} stars too "
                       "masked, skipping.")
        return None
    return {
        "frame": frame, "psf_ref": psf_ref, "data": datas,
        "noisemap": noisemaps, "masks": masks,
        "stamp_coords": stamp_coords, "names": names,
        "n_before": n_before,
    }


def _dispatch_fit_jobs(user_config, jobs, fetch="device"):
    """Dispatch one bucket's batched fit; returns UNMATERIALIZED output.

    Star counts are padded to the batch maximum with fully-masked dummy
    slices (zero chi2 weight).  With the default fetch="device" the
    jitted call returns immediately (asynchronous dispatch): the caller
    collects the results later, overlapping the device->host transfer
    with the next bucket's device work.
    """
    from ..core.psf.batched import build_psf_batched

    n_max = max(len(job["data"]) for job in jobs)
    n_pix = jobs[0]["data"].shape[-1]

    def pad(arr, fill, dtype=np.float32):
        out = np.full((len(jobs), n_max) + arr[0].shape[1:], fill,
                      dtype=dtype)
        return out

    data = pad([j["data"] for j in jobs], 0.0)
    noise = pad([j["noisemap"] for j in jobs], 1.0)
    masks = np.zeros((len(jobs), n_max, n_pix, n_pix), dtype=bool)
    coords = np.zeros((len(jobs), n_max, 2), dtype=np.float32)
    fwhm0 = np.zeros(len(jobs), dtype=np.float32)
    for i, job in enumerate(jobs):
        k = len(job["data"])
        data[i, :k] = job["data"]
        noise[i, :k] = job["noisemap"]
        masks[i, :k] = job["masks"]
        coords[i, :k] = job["stamp_coords"]
        seeing = job["frame"]["seeing_pixels"]
        # > 0: estimate_seeing returns -1.0 for source-less frames
        fwhm0[i] = seeing if (seeing and np.isfinite(seeing)
                              and seeing > 0) else 3.0

    return build_psf_batched(
        data, noise, user_config["subsampling_factor"], masks=masks,
        stamp_coordinates=coords, guess_fwhm_pixels=fwhm0,
        n_iter_analytic=user_config["psf_n_iter_analytic"],
        n_iter_adabelief=user_config["psf_n_iter_pixels"],
        field_distortion=user_config["field_distortion"], fetch=fetch,
        dft_pad=user_config.get("psf_dft_pad"))


def _collect_fit_results(out, jobs):
    """Materialize a dispatched bucket into per-job result dicts."""
    out = {key: np.asarray(val) if not isinstance(val, dict)
           else {k2: np.asarray(v2) for k2, v2 in val.items()}
           for key, val in out.items()}
    results = []
    for i, job in enumerate(jobs):
        k = len(job["data"])
        results.append({
            "narrow_psf": out["narrow_psf"][i],
            "full_psf": out["full_psf"][i],
            "chi2": float(out["chi2"][i]),
            "chi2_per_star": out["chi2_per_star"][i, :k],
            "residuals": out["residuals"][i, :k],
            "kwargs_psf": {
                "kwargs_moffat": {
                    key: out["kwargs_moffat"][key][i]
                    for key in out["kwargs_moffat"]},
                "kwargs_distortion": {
                    key: out["kwargs_distortion"][key][i]
                    for key in out["kwargs_distortion"]},
            },
            "adabelief_extra_fields": {
                "loss_history": out["loss_history_pixels"][i]},
        })
    return results


def model_all_psfs():
    """Pipeline task: build a PSF model for every eligible frame.

    Frames are fitted in BATCHES (one vmapped compiled program per
    bucket) instead of the reference's serial per-frame loop — the
    pipeline's main per-frame GPU/TPU cost (reference
    psf_modelling.py:92, tutorial: 2-3 s/frame).  On a multi-chip
    backend the bucket's frame axis is additionally sharded across the
    device mesh (build_psf_batched mesh="auto", parallel/batch.py):
    per-frame fits are independent, so the partitioned program is
    collective-free and scales linearly in chips.
    """
    logger = logging.getLogger("lightcurver.psf_modelling")
    user_config = get_user_config()
    regions_file = user_config["regions_path"]

    frames = get_pandas(
        columns=["id", "image_relpath", "exptime", "mjd", "seeing_pixels",
                 "pixel_scale"],
        conditions=["plate_solved = 1", "eliminated = 0",
                    "roi_in_footprint = 1"])
    combined_footprint_hash = get_combined_footprint_hash(
        user_config, frames["id"].to_list())
    logger.info(f"Building PSFs for up to {len(frames)} frames.")

    batch_size = int(user_config.get("psf_fit_batch_size", 16) or 16)
    frame_rows = [frame for _, frame in frames.iterrows()]

    def prepare_chunk(rows):
        """Host-side IO + masking for one bucket of frames."""
        chunk = []
        for frame in rows:
            job = _prepare_frame_job(user_config, regions_file, frame,
                                     combined_footprint_hash, logger)
            if job is not None:
                chunk.append(job)
        return chunk

    def store_bucket(chunk, out, t0):
        results = _collect_fit_results(out, chunk)
        # elapsed since THIS bucket's dispatch; in steady state that
        # window also hosts the next bucket's overlapped HDF5 prepare,
        # so it is pipelined wall-clock, not pure device-fit time
        logger.info(f"Collected {len(chunk)} PSF fits {time() - t0:.1f}s "
                    "after dispatch (pipelined).")
        for job, result in zip(chunk, results):
            _store_psf_result(user_config, regions_file, job, result,
                              combined_footprint_hash, logger)

    buckets = [frame_rows[lo:lo + batch_size]
               for lo in range(0, len(frame_rows), batch_size)]
    run_pipelined_buckets(
        buckets, prepare_chunk,
        lambda chunk: _dispatch_fit_jobs(user_config, chunk),
        store_bucket)


def run_pipelined_buckets(buckets, prepare, dispatch, store):
    """Three-deep software pipeline over work buckets.

    While the device fits bucket i (``dispatch`` returns without
    blocking), bucket i+1's host-side ``prepare`` runs on a worker
    thread and bucket i-1's results are fetched/stored (``store``) —
    device compute, host IO and device->host transfer all overlap.

    A finished bucket is NEVER lost to its successor's failure: if
    prepare/dispatch of bucket i+1 raises, bucket i's in-flight results
    are stored before the exception propagates, so a rerun resumes
    after them (tests/test_processes.py pins this).
    """
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=1) as pool:
        pending = pool.submit(prepare, buckets[0]) if buckets else None
        in_flight = None  # (chunk, dispatched device output, t0)
        for i in range(len(buckets)):
            try:
                chunk = pending.result()
                pending = pool.submit(prepare, buckets[i + 1]) \
                    if i + 1 < len(buckets) else None
                if not chunk:
                    continue
                dispatched = (chunk, dispatch(chunk), time())
            except BaseException:
                if in_flight is not None:
                    store(*in_flight)
                    in_flight = None
                raise
            if in_flight is not None:
                store(*in_flight)
            in_flight = dispatched
        if in_flight is not None:
            store(*in_flight)


def _store_psf_result(user_config, regions_file, job, result,
                      combined_footprint_hash, logger):
    """Bookkeeping for one fitted frame: plot, HDF5, DB row."""
    frame = job["frame"]
    psf_ref = job["psf_ref"]
    datas, noisemaps, masks = job["data"], job["noisemap"], job["masks"]
    names = job["names"]
    n_before = job["n_before"]

    kwargs_moffat = result["kwargs_psf"]["kwargs_moffat"]
    # NaN is truthy, so 'or' alone would store a NaN Moffat FWHM in the
    # DB for frames whose WCS yielded no scale
    pixel_scale = frame["pixel_scale"]
    if pixel_scale is None or not np.isfinite(pixel_scale):
        pixel_scale = 1.0
    fwhm_arcsec = float(0.5 * (kwargs_moffat["fwhm_x"]
                               + kwargs_moffat["fwhm_y"]) * pixel_scale)
    loss_history = result["adabelief_extra_fields"]["loss_history"]

    # diagnostic plot (psf_do_plots: 0 skips it — e.g. headless bench
    # runs; the reference plots unconditionally, psf_modelling.py:182)
    if user_config.get("psf_do_plots", 1):
        try:
            from ..plotting.psf_plotting import plot_psf_diagnostic

            plots_dir = (user_config["plots_dir"] / "PSFs"
                         / str(combined_footprint_hash))
            plots_dir.mkdir(exist_ok=True, parents=True)
            frame_name = Path(frame["image_relpath"]).stem
            seeing = frame["seeing_pixels"]
            # NaN is truthy ('or 0' would print 'seeing: nan'), and the
            # estimator's -1.0 no-sources sentinel must not print as a
            # negative arcsecond value (same seeing > 0 gate as
            # _dispatch_fit_jobs)
            if seeing is None or not np.isfinite(seeing) or seeing <= 0:
                seeing = 0.0
            seeing = seeing * pixel_scale
            text = (f"{frame_name}\nseeing estimation: {seeing:.02f}\n"
                    f"seeing moffat: {fwhm_arcsec:.02f}")
            plot_psf_diagnostic(
                datas=datas, noisemaps=noisemaps,
                residuals=result["residuals"],
                full_psf=result["full_psf"], loss_curve=loss_history,
                masks=masks, names=names, diagnostic_text=text,
                save_path=plots_dir / f"{frame['id']}_{frame_name}.jpg")
        except Exception as e:
            logger.warning(f"PSF diagnostic plot failed: {e}")

    with _REGIONS_IO_LOCK, h5py.File(regions_file, "r+") as f:
        frame_group = f[frame["image_relpath"]]
        if psf_ref in frame_group:
            del frame_group[psf_ref]
        psf_group = frame_group.create_group(psf_ref)
        psf_group["narrow_psf"] = np.asarray(result["narrow_psf"])
        psf_group["full_psf"] = np.asarray(result["full_psf"])
        psf_group["subsampling_factor"] = np.array(
            [user_config["subsampling_factor"]])
        distortion_group = psf_group.create_group("distortion")
        for key, value in result["kwargs_psf"][
                "kwargs_distortion"].items():
            distortion_group[key] = value

    rld = warn_if_unconverged(loss_history, logger,
                              f"Frame {frame['id']} PSF pixel fit",
                              "psf_n_iter_pixels")
    execute_sqlite_query(
        """REPLACE INTO PSFs (frame_id, chi2,
           relative_loss_differential, psf_ref,
           combined_footprint_hash, subsampling_factor,
           fwhm_moffat_arcseconds) VALUES (?, ?, ?, ?, ?, ?, ?)""",
        params=(frame["id"], float(result["chi2"]),
                rld, psf_ref,
                combined_footprint_hash,
                user_config["subsampling_factor"], fwhm_arcsec),
        is_select=False)
    logger.info(
        f"Frame {frame['id']}: PSF {psf_ref} built "
        f"({n_before}->{len(datas)} stars, chi2 "
        f"{result['chi2']:.02f}).")
