"""Full-scale real-sky-shaped pipeline run (marked slow).

The hermetic e2e (test_e2e_pipeline.py, 160 px) and the 48-frame stress
run (test_stress_pipeline.py, 176 px) exercise the logic; this module
exercises the SCALE and the messiness of the reference's own tutorial
dataset (reference docs/mkdocs/contents/tutorial.md:166-169: 87 real
VST-OmegaCAM wide-field frames):

- 87 frames of 2048 x 2048 px (6.8' across at 0.2"/px);
- SIP-distorted WCS written through io/wcs.py's own SIP writer (~2 px
  at the field corners, the scale a real solve-field solution carries),
  with per-frame variation;
- per-frame field rotations (+-15 deg, plus one 90-degree frame);
- two deliberately bad pointings (750 px off) that the mean + 5*std
  footprint elimination (utilities/footprint.py, reference
  utilities/footprint.py:153-199) must flag;
- a mid-run SIGKILL during the ROI stage-2 optimization, then a resume
  run that must pick the fit up from the on-disk checkpoint INSIDE the
  pipeline (digest-verified), not restart it — and skip every completed
  upstream task;
- a third run asserting full idempotency (no work, no output rewrites).
"""

import glob
import os
import subprocess
import sys
import time

import numpy as np
import pandas as pd
import pytest
import yaml

ROI_RA, ROI_DEC = 149.512, 2.2073
PIXEL_SCALE = 0.2 / 3600.0
FRAME = 2048
EXPTIME, GAIN, SKY_E_S = 30.0, 1.2, 10.0
N_FRAMES = 87
BAD_FRAMES = (20, 55)          # 750 px pointing offset -> 5-sigma cut
BAD_OFFSET_PX = 750.0
ROT_90_FRAME = 40              # one frame rotated a full 90 degrees

# stars out to ~140" from the ROI (700 px): the SIP terms are ~0.5-2 px
# there, so uncorrected cutouts would be visibly off-center
STARS = [(-100, -100, 900.0), (100, -100, 700.0), (-100, 100, 1100.0),
         (100, 100, 800.0), (60, 0, 600.0), (0, 60, 1000.0),
         (-60, 0, 750.0), (0, -60, 850.0), (140, 20, 650.0),
         (-20, -140, 950.0)]
PS_OFFSETS = {"A": (-0.8, 0.5), "B": (0.7, -0.6)}
PS_BASE = {"A": 340.0, "B": 160.0}

ROI_ITERS = 400
CKPT_EVERY = 50


def _sky(dx_arcsec, dy_arcsec):
    return (float(ROI_RA + dx_arcsec / 3600.0
                  / np.cos(np.radians(ROI_DEC))),
            float(ROI_DEC + dy_arcsec / 3600.0))


def _moffat_stamp(x0, y0, flux, fwhm, size, beta=2.8):
    """Render a Moffat into the full frame via a bounded stamp.

    Radius-64 stamps: the flux outside is ~2e-6 of the total (beta=2.8),
    far below the pipeline's photometric noise floor."""
    r = 64
    ix, iy = int(round(x0)), int(round(y0))
    x_lo, x_hi = max(ix - r, 0), min(ix + r + 1, size)
    y_lo, y_hi = max(iy - r, 0), min(iy + r + 1, size)
    if x_lo >= x_hi or y_lo >= y_hi:
        return None
    yy, xx = np.mgrid[y_lo:y_hi, x_lo:x_hi]
    alpha = fwhm / (2 * np.sqrt(2.0 ** (1.0 / beta) - 1.0))
    rr2 = (xx - x0) ** 2 + (yy - y0) ** 2
    stamp = flux * (beta - 1) / (np.pi * alpha**2) \
        * (1 + rr2 / alpha**2) ** (-beta)
    return (slice(y_lo, y_hi), slice(x_lo, x_hi)), stamp


def _frame_wcs(k, rng):
    """Rotated, dithered, SIP-distorted TAN WCS for frame k."""
    from lightcurver_tpu.io.wcs import TanWCS

    theta = np.radians(90.0 if k == ROT_90_FRAME
                       else float(rng.uniform(-15.0, 15.0)))
    c, s = np.cos(theta), np.sin(theta)
    # proper rotation of the standard (RA increasing left) orientation
    cd = [[-PIXEL_SCALE * c, PIXEL_SCALE * s],
          [PIXEL_SCALE * s, PIXEL_SCALE * c]]
    dx, dy = rng.uniform(-20, 20, 2)
    if k in BAD_FRAMES:
        dx += BAD_OFFSET_PX
    # quadratic SIP at real solve-field scale (~2 px in the corners),
    # varied per frame like refit solutions would be
    j = 1.0 + 0.1 * rng.standard_normal()
    sip_a = np.array([[0.0, 0.0, 2.1e-6 * j],
                      [0.0, -1.3e-6 * j, 0.0],
                      [1.7e-6 * j, 0.0, 0.0]])
    sip_b = np.array([[0.0, 0.0, -1.8e-6 * j],
                      [0.0, 1.1e-6 * j, 0.0],
                      [-1.5e-6 * j, 0.0, 0.0]])
    cpix = (FRAME + 1) / 2.0
    return TanWCS(ROI_RA, ROI_DEC, cpix + dx, cpix + dy, cd,
                  sip_a=sip_a, sip_b=sip_b)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    from lightcurver_tpu.io.fits import write_fits, Header

    tmp = tmp_path_factory.mktemp("fullscale")
    raw = tmp / "raw"
    raw.mkdir()
    rng = np.random.default_rng(11)

    ps_fluxes = {ps: PS_BASE[ps] * (1 + 0.2 * np.sin(
        np.linspace(0, 3 * np.pi, N_FRAMES) + i))
        for i, ps in enumerate(PS_OFFSETS)}
    fwhms = 2.4 + 0.8 * rng.random(N_FRAMES)

    for k in range(N_FRAMES):
        wcs = _frame_wcs(k, rng)
        img = np.zeros((FRAME, FRAME))
        for dx, dy, flux in STARS:
            x, y = wcs.world_to_pixel(*_sky(dx, dy))
            hit = _moffat_stamp(float(x), float(y), flux, fwhms[k],
                                FRAME)
            if hit is not None:
                img[hit[0]] += hit[1]
        for ps, (dx, dy) in PS_OFFSETS.items():
            x, y = wcs.world_to_pixel(*_sky(dx, dy))
            hit = _moffat_stamp(float(x), float(y),
                                float(ps_fluxes[ps][k]), fwhms[k],
                                FRAME)
            if hit is not None:
                img[hit[0]] += hit[1]
        total_e = (img + SKY_E_S) * EXPTIME
        noisy = total_e + rng.normal(0, 1, total_e.shape) \
            * np.sqrt(total_e)
        header = Header()
        header["MJD-OBS"] = 60200.0 + 1.0 * k
        header["EXPTIME"] = EXPTIME
        header["GAIN"] = GAIN
        header.update(wcs.to_header_cards())
        write_fits(raw / f"frame_{k:02d}.fits",
                   (noisy / GAIN).astype(np.float32), header)

    rows = []
    for i, (dx, dy, flux) in enumerate(STARS):
        ra, dec = _sky(dx, dy)
        g = 20.0 - 2.5 * np.log10(flux)
        rows.append({"ra": ra, "dec": dec, "source_id": 3000 + i,
                     "phot_g_mean_mag": g, "phot_bp_mean_mag": g + 0.5,
                     "phot_rp_mean_mag": g - 0.5, "pmra": 0.0,
                     "pmdec": 0.0, "ref_epoch": 2016.0})
    fixture_csv = tmp / "gaia_fixture.csv"
    pd.DataFrame(rows).to_csv(fixture_csv, index=False)

    parser_dir = tmp / "header_parser"
    parser_dir.mkdir()
    (parser_dir / "parse_header.py").write_text(
        "def parse_header(header):\n"
        "    return {'mjd': header['MJD-OBS'], 'gain': header['GAIN'],\n"
        "            'exptime': header['EXPTIME']}\n")

    template = (os.path.dirname(os.path.dirname(__file__))
                + "/lightcurver_tpu/pipeline/example_config_file/"
                  "config.yaml")
    with open(template) as f:
        config = yaml.safe_load(f)
    config.update({
        "workdir": str(tmp), "raw_dirs": [str(raw)],
        "already_plate_solved": 1, "multiprocessing_cpu_count": 1,
        "star_selection_strategy": "ROI_disk",
        "ROI_disk_radius_arcseconds": 220, "min_number_stars": 8,
        "stamp_size_stars": 16, "stamp_size_ROI": 24,
        "subsampling_factor": 2,
        "psf_fit_batch_size": 12,
        "psf_n_iter_analytic": 40, "psf_n_iter_pixels": 150,
        "psf_fit_exclude_strategy": {"threshold": [0.0, 2.0]},
        "star_deconv_n_iter": 250,
        "roi_deconv_translations_iters": 30,
        "roi_deconv_all_iters": ROI_ITERS,
        "deconv_checkpoint_every": CKPT_EVERY,
        "point_sources": {ps: list(_sky(dx, dy))
                          for ps, (dx, dy) in PS_OFFSETS.items()},
        "fix_point_source_astrometry": 0.5,
    })
    config["ROI"] = {"fullscale": {"coordinates": [ROI_RA, ROI_DEC]}}
    config_path = tmp / "config.yaml"
    config_path.write_text(yaml.dump(config))
    os.environ["LIGHTCURVER_CONFIG"] = str(config_path)
    os.environ["LIGHTCURVER_GAIA_FIXTURE"] = str(fixture_csv)
    np.savez(tmp / "ps_fluxes.npz", **ps_fluxes)
    yield tmp
    os.environ.pop("LIGHTCURVER_GAIA_FIXTURE", None)


_RUNNER = """
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", {cache!r})
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from lightcurver_tpu.pipeline.workflow_manager import WorkflowManager
WorkflowManager().run()
"""


def _cpu_cache_dir():
    """Same CPU-feature-keyed cache dir conftest.py configures."""
    import hashlib
    import pathlib

    try:
        with open("/proc/cpuinfo") as f:
            flags = next(ln for ln in f if ln.startswith("flags"))
    except (OSError, StopIteration):
        flags = "unknown"
    fp = hashlib.sha256(flags.encode()).hexdigest()[:8]
    return str(pathlib.Path(__file__).parents[1]
               / f".jax_cache_cpu_{fp}")


@pytest.fixture(scope="module")
def killed_then_resumed(workdir):
    """Run the pipeline in a subprocess, SIGKILL it mid ROI stage 2,
    then resume in-process.  Returns bookkeeping for the tests."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)   # no TPU plugin in the child
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    log_path = workdir / "killed_run.log"
    ckpt_glob = str(workdir / "checkpoints" / "roi_*_stage2.ckpt")
    with open(log_path, "w") as log:
        proc = subprocess.Popen(
            [sys.executable, "-c",
             _RUNNER.format(cache=_cpu_cache_dir())],
            env=env, stdout=log, stderr=subprocess.STDOUT,
            cwd=str(workdir))
        deadline = time.time() + 2400
        killed = False
        ckpt_path = None
        while time.time() < deadline:
            if proc.poll() is not None:
                break
            hits = glob.glob(ckpt_glob)
            if hits:
                try:
                    with np.load(hits[0]) as z:
                        done = int(z["done"])
                except Exception:  # mid-replace; retry next poll
                    done = 0
                if done >= CKPT_EVERY:
                    ckpt_path = hits[0]
                    proc.kill()
                    proc.wait(timeout=60)
                    killed = True
                    break
            time.sleep(0.2)
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=60)
    assert killed, (
        "never saw a stage-2 checkpoint to kill; pipeline log tail:\n"
        + "".join(open(log_path).readlines()[-40:]))

    # the interrupted state the resume must pick up
    with np.load(ckpt_path) as z:
        done_before = int(z["done"])
        digest_before = str(z["inputs_digest"])
        history_before = np.asarray(z["history"])[:done_before]
    assert CKPT_EVERY <= done_before < ROI_ITERS
    assert len(digest_before) == 64  # sha256 hex: the digest path is on

    # upstream products that the resume must NOT rebuild: the imported
    # calibrated frames (DB-incremental skip) and the fitted PSFs.
    # (prepare_calibrated_cutouts DOES re-run — reference behavior —
    # regenerating byte-identical inputs, which is exactly what the
    # checkpoint's inputs_digest then verifies.)
    cal_frames = sorted(glob.glob(str(workdir / "frames" / "*.fits")))
    assert len(cal_frames) == N_FRAMES
    mtimes_before = {p: os.path.getmtime(p) for p in cal_frames}
    counts_before = {
        t: len(_query(f"SELECT * FROM {t}"))  # noqa: S608 — fixed names
        for t in ("frames", "PSFs", "star_flux_in_frame",
                  "normalization_coefficients")}

    # resume IN-PROCESS, counting checkpoint segment writes: a genuine
    # resume writes only the REMAINING segments; a silent restart
    # would write all ROI_ITERS / CKPT_EVERY of them
    from lightcurver_tpu.core import optimize
    from lightcurver_tpu.pipeline.workflow_manager import WorkflowManager

    saves = []
    orig_save = optimize.save_checkpoint

    def counting_save(path, *args, **kwargs):
        saves.append(str(path))
        return orig_save(path, *args, **kwargs)

    optimize.save_checkpoint = counting_save
    try:
        WorkflowManager().run()
    finally:
        optimize.save_checkpoint = orig_save

    stage2_saves = [p for p in saves if p.endswith("_stage2.ckpt")]
    return {
        "workdir": workdir,
        "done_before": done_before,
        "history_before": history_before,
        "ckpt_path": ckpt_path,
        "stage2_saves": stage2_saves,
        "mtimes_before": mtimes_before,
        "counts_before": counts_before,
    }


def _query(sql, params=()):
    from lightcurver_tpu.structure.database import execute_sqlite_query

    return execute_sqlite_query(sql, params, use_pandas=True)


@pytest.mark.slow
def test_bad_pointings_eliminated(killed_then_resumed):
    frames = _query(
        "SELECT id, original_image_path, eliminated, comment FROM frames")
    assert len(frames) == N_FRAMES
    bad = frames[frames.eliminated == 1]
    flagged = sorted(int(str(p).split("frame_")[1][:2])
                     for p in bad["original_image_path"])
    assert flagged == sorted(BAD_FRAMES)
    assert (bad["comment"] == "bad_pointing").all()


@pytest.mark.slow
def test_sip_wcs_roundtrip_through_pipeline(killed_then_resumed):
    """The header written by the generator parses back SIP-complete and
    agrees with the DB-stored footprint of the same frame."""
    import json

    from lightcurver_tpu.io.fits import read_fits
    from lightcurver_tpu.io.wcs import TanWCS

    wd = killed_then_resumed["workdir"]
    _, header = read_fits(wd / "raw" / "frame_00.fits")
    wcs = TanWCS.from_header(header)
    assert wcs.has_sip
    # SIP moves the corner by ~px-scale; a non-SIP read would not
    x, y = wcs.world_to_pixel(*wcs.pixel_to_world(40.0, 2000.0))
    assert abs(float(x) - 40.0) < 1e-3
    assert abs(float(y) - 2000.0) < 1e-3
    row = _query(
        """SELECT footprints.polygon FROM footprints JOIN frames
           ON footprints.frame_id = frames.id
           WHERE frames.original_image_path LIKE '%frame_00%'""")
    poly = np.asarray(json.loads(row["polygon"].iloc[0]), dtype=float)
    corners = np.asarray(
        [wcs.pixel_to_world(x, y)
         for (x, y) in ((0, 0), (FRAME - 1, 0), (FRAME - 1, FRAME - 1),
                        (0, FRAME - 1))])
    # same vertex set up to ordering
    d = np.abs(poly[:, None, :] - corners[None, :, :]).sum(-1)
    assert d.min(axis=0).max() < 1e-6


@pytest.mark.slow
def test_psfs_and_star_counts(killed_then_resumed):
    psfs = _query("SELECT frame_id, chi2 FROM PSFs")
    assert len(psfs) == N_FRAMES - len(BAD_FRAMES)
    assert (psfs["chi2"] < 2.0).all()
    stars = _query("SELECT gaia_id FROM stars")
    assert len(stars) == len(STARS)
    # the assignment covers ALL footprinted frames, eliminated included
    # (reference processes/frame_star_assignment.py:20-26 does the
    # same); the elimination gates PSFs and everything downstream
    counts = _query(
        "SELECT frame_id, COUNT(*) AS n FROM stars_in_frames "
        "GROUP BY frame_id")
    assert len(counts) == N_FRAMES
    good = _query(
        """SELECT sif.frame_id, COUNT(*) AS n FROM stars_in_frames sif
           JOIN frames ON frames.id = sif.frame_id
           WHERE frames.eliminated = 0 GROUP BY sif.frame_id""")
    assert good["n"].min() == len(STARS)  # every star, every good frame
    # the bad pointings shifted far enough that stars left THEIR
    # footprints — the count varies, proving real polygon membership
    bad = counts[~counts["frame_id"].isin(good["frame_id"])]
    assert bad["n"].max() < len(STARS)


@pytest.mark.slow
def test_resume_continued_from_checkpoint(killed_then_resumed):
    st = killed_then_resumed
    # only the remaining segments were written on resume
    n_total = -(-ROI_ITERS // CKPT_EVERY)
    n_remaining = -(-(ROI_ITERS - st["done_before"]) // CKPT_EVERY)
    assert n_remaining < n_total  # the kill landed mid-fit
    assert len(st["stage2_saves"]) == n_remaining, (
        f"expected {n_remaining} resumed segment writes "
        f"(done_before={st['done_before']}), saw "
        f"{len(st['stage2_saves'])}")
    # success deletes the checkpoint (stale-replay protection)
    assert not os.path.exists(st["ckpt_path"])
    # upstream task products were skipped, not rebuilt
    for p, t in st["mtimes_before"].items():
        assert os.path.getmtime(p) == t, f"resume rewrote {p}"
    for table, n in st["counts_before"].items():
        assert len(_query(f"SELECT * FROM {table}")) == n, table


@pytest.mark.slow
def test_flux_recovery_and_idempotency(killed_then_resumed):
    st = killed_then_resumed
    wd = st["workdir"]
    out_dir = wd / "prepared_roi_cutouts"
    csvs = list(out_dir.glob("*_photometry_per_epoch.csv"))
    assert len(csvs) == 1
    photometry = pd.read_csv(csvs[0])
    assert len(photometry) == N_FRAMES - len(BAD_FRAMES)
    assert (photometry["reduced_chi2"] < 2.0).all()

    with np.load(wd / "ps_fluxes.npz") as z:
        truth = {ps: z[ps] for ps in PS_OFFSETS}
    frames = _query("SELECT id, original_image_path FROM frames")
    idx_by_id = {int(r["id"]): int(str(r["original_image_path"])
                                   .split("frame_")[1][:2])
                 for _, r in frames.iterrows()}
    for ps in PS_OFFSETS:
        measured = np.asarray(photometry[f"{ps}_flux"])
        true = np.array([truth[ps][idx_by_id[int(fid)]]
                         for fid in photometry["frame_id"]])
        rel = measured / true - 1
        assert np.abs(np.median(rel)) < 0.1, (ps, np.median(rel))
        assert np.abs(rel).max() < 0.25, (ps, rel)

    # third run, through every SQL-incremental task (the ROI model task
    # itself re-runs by design, as in the reference — stop before it):
    # nothing re-runs, nothing is rewritten
    from lightcurver_tpu.pipeline.workflow_manager import WorkflowManager

    mtime_csv = os.path.getmtime(csvs[0])
    mtimes_h5 = {p: os.path.getmtime(p)
                 for p in glob.glob(str(out_dir / "*.h5"))}
    counts = {t: len(_query(f"SELECT * FROM {t}"))
              for t in ("frames", "PSFs", "star_flux_in_frame")}
    WorkflowManager().run(stop_step="calculate_absolute_zeropoints")
    assert os.path.getmtime(csvs[0]) == mtime_csv
    for p, t in mtimes_h5.items():
        assert os.path.getmtime(p) == t
    for table, n in counts.items():
        assert len(_query(f"SELECT * FROM {table}")) == n, table
