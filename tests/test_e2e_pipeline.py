"""End-to-end pipeline test on synthetic frames (hermetic, CPU).

Mirrors the reference's e2e strategy
(tests/test_entire_pipeline/test_run_pipeline_example_config.py) but with
generated data and a recorded Gaia fixture, so no network and no bundled
blobs are needed.  Asserts the reference's DB invariants: every frame
gets a PSF (chi2 < 2), star fluxes (chi2 < 2), a normalization
coefficient, an absolute zeropoint — and additionally that the recovered
ROI point-source fluxes match the injected ones.
"""

import json
import os

import numpy as np
import pandas as pd
import pytest
import yaml

ROI_RA, ROI_DEC = 42.2031, 19.22528
PIXEL_SCALE = 0.2 / 3600.0  # deg/px
FRAME_SIZE = 160  # 32" x 32": stars stay clear of the 4" assignment margin
EXPTIME = 30.0
GAIN = 1.2
SKY_E_PER_S = 10.0
N_FRAMES = 3

# star offsets from the ROI in arcsec (dx=RA direction, dy=Dec)
STAR_OFFSETS = [(-6, -6), (6, -6), (-6, 6), (6, 6), (8, 0), (0, 8),
                (-8, 0), (0, -8)]
STAR_FLUXES_E_S = [800.0, 600.0, 1000.0, 700.0, 500.0, 900.0, 650.0,
                   750.0]
# two blended ROI point sources, offsets in arcsec and per-epoch fluxes
PS_OFFSETS = {"A": (-0.8, 0.5), "B": (0.7, -0.6)}
PS_FLUXES = {"A": [300.0, 360.0, 330.0], "B": [150.0, 120.0, 135.0]}
FRAME_FWHM_PX = [2.6, 3.1, 2.8]
FRAME_DITHER_PX = [(0.0, 0.0), (1.4, -0.8), (-1.1, 0.6)]


def _make_wcs(dither_px):
    from lightcurver_tpu.io.wcs import TanWCS

    c = (FRAME_SIZE + 1) / 2.0  # 1-based center
    return TanWCS(ROI_RA, ROI_DEC, c + dither_px[0], c + dither_px[1],
                  [[-PIXEL_SCALE, 0.0], [0.0, PIXEL_SCALE]])


def _render_frame(rng, frame_idx, star_world, wcs):
    """Clean e-/s image of stars + ROI sources with a Moffat PSF."""
    from lightcurver_tpu.utilities.synthetic import moffat_np

    fwhm = FRAME_FWHM_PX[frame_idx]
    # oversampled odd kernel so sub-pixel positions hit the right spot
    img = np.zeros((FRAME_SIZE, FRAME_SIZE))
    yy, xx = np.mgrid[0:FRAME_SIZE, 0:FRAME_SIZE]

    def add_source(x, y, flux):
        # analytic Moffat evaluated directly at each pixel
        beta = 2.8
        root = np.sqrt(2.0 ** (1.0 / beta) - 1.0)
        alpha = fwhm / (2 * root)
        rr2 = (xx - x) ** 2 + (yy - y) ** 2
        norm = (beta - 1.0) / (np.pi * alpha**2)
        img[:] += flux * norm * (1.0 + rr2 / alpha**2) ** (-beta)

    for (ra, dec), flux in star_world:
        x, y = wcs.world_to_pixel(ra, dec)
        add_source(float(x), float(y), flux)
    for ps, (dra, ddec) in PS_OFFSETS.items():
        ra = ROI_RA + dra / 3600.0 / np.cos(np.radians(ROI_DEC))
        dec = ROI_DEC + ddec / 3600.0
        x, y = wcs.world_to_pixel(ra, dec)
        add_source(float(x), float(y), PS_FLUXES[ps][frame_idx])
    return img


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    """Temp working directory with synthetic frames + config + fixtures."""
    tmp = tmp_path_factory.mktemp("e2e")
    raw_dir = tmp / "raw"
    raw_dir.mkdir()
    rng = np.random.default_rng(42)

    # Gaia fixture CSV
    stars = []
    for i, ((dx, dy), flux) in enumerate(zip(STAR_OFFSETS,
                                             STAR_FLUXES_E_S)):
        ra = ROI_RA + dx / 3600.0 / np.cos(np.radians(ROI_DEC))
        dec = ROI_DEC + dy / 3600.0
        gmag = 20.0 - 2.5 * np.log10(flux)
        stars.append({
            "ra": ra, "dec": dec, "source_id": 1000 + i,
            "phot_g_mean_mag": gmag, "phot_bp_mean_mag": gmag + 0.5,
            "phot_rp_mean_mag": gmag - 0.5, "pmra": 0.0, "pmdec": 0.0,
            "ref_epoch": 2016.0,
        })
    fixture_csv = tmp / "gaia_fixture.csv"
    pd.DataFrame(stars).to_csv(fixture_csv, index=False)
    star_world = [((s["ra"], s["dec"]), f)
                  for s, f in zip(stars, STAR_FLUXES_E_S)]

    # synthetic frames
    from lightcurver_tpu.io.fits import write_fits, Header

    for k in range(N_FRAMES):
        wcs = _make_wcs(FRAME_DITHER_PX[k])
        clean_e_s = _render_frame(rng, k, star_world, wcs)
        total_e = (clean_e_s + SKY_E_PER_S) * EXPTIME
        noisy_e = total_e + rng.normal(0, np.sqrt(total_e))
        adu = noisy_e / GAIN
        header = Header()
        header["MJD-OBS"] = 60000.0 + 2.0 * k
        header["EXPTIME"] = EXPTIME
        header["GAIN"] = GAIN
        header.update(wcs.to_header_cards())
        write_fits(raw_dir / f"frame_{k:02d}.fits",
                   adu.astype(np.float32), header)

    # header parser plugin
    parser_dir = tmp / "header_parser"
    parser_dir.mkdir()
    (parser_dir / "parse_header.py").write_text(
        "def parse_header(header):\n"
        "    return {'mjd': header['MJD-OBS'], 'gain': header['GAIN'],\n"
        "            'exptime': header['EXPTIME']}\n")

    # config: template keys with fast test values
    template = (os.path.dirname(os.path.dirname(__file__))
                + "/lightcurver_tpu/pipeline/example_config_file/"
                  "config.yaml")
    with open(template) as f:
        config = yaml.safe_load(f)
    config.update({
        "workdir": str(tmp),
        "raw_dirs": [str(raw_dir)],
        "already_plate_solved": 1,
        "multiprocessing_cpu_count": 1,
        "background_estimation_n_boxes": 3,
        "source_extraction_threshold": 3.0,
        "source_extraction_min_area": 5,
        "source_extraction_do_plots": 0,
        "star_selection_strategy": "ROI_disk",
        "ROI_disk_radius_arcseconds": 30,
        "min_number_stars": 5,
        "stamp_size_stars": 16,
        "stamp_size_ROI": 24,
        "cosmics_masking_params": {"sigclip": 6.0, "sigfrac": 0.3,
                                   "objlim": 5.0},
        "subsampling_factor": 2,
        "psf_n_iter_analytic": 40,
        "psf_n_iter_pixels": 150,
        "star_deconv_n_iter": 250,
        "roi_deconv_translations_iters": 40,
        "roi_deconv_all_iters": 400,
        # exercise the segmented (resumable) optimizer paths end-to-end
        "deconv_checkpoint_every": 100,
        "point_sources": {
            ps: [float(ROI_RA + dx / 3600.0 / np.cos(np.radians(ROI_DEC))),
                 float(ROI_DEC + dy / 3600.0)]
            for ps, (dx, dy) in PS_OFFSETS.items()},
        "fix_point_source_astrometry": 0.5,
        "constraints_on_frame_columns_for_roi": {},
        "constraints_on_normalization_coeff": {},
    })
    config_path = tmp / "config.yaml"
    config_path.write_text(yaml.dump(config))

    os.environ["LIGHTCURVER_CONFIG"] = str(config_path)
    os.environ["LIGHTCURVER_GAIA_FIXTURE"] = str(fixture_csv)
    yield tmp
    os.environ.pop("LIGHTCURVER_GAIA_FIXTURE", None)


@pytest.fixture(scope="module")
def pipeline_run(workdir):
    from lightcurver_tpu.pipeline.workflow_manager import WorkflowManager

    WorkflowManager().run()
    return workdir


def _query(sql, params=()):
    from lightcurver_tpu.structure.database import execute_sqlite_query

    return execute_sqlite_query(sql, params, use_pandas=True)


def test_frames_imported_and_solved(pipeline_run):
    frames = _query("SELECT * FROM frames")
    assert len(frames) == N_FRAMES
    assert (frames["plate_solved"] == 1).all()
    assert (frames["roi_in_footprint"] == 1).all()
    assert (frames["eliminated"] == 0).all()
    # seeing estimates should be close to the injected FWHM
    np.testing.assert_allclose(np.sort(frames["seeing_pixels"]),
                               np.sort(FRAME_FWHM_PX), atol=0.8)


def test_psfs_built_with_good_chi2(pipeline_run):
    psfs = _query("SELECT * FROM PSFs")
    assert len(psfs) == N_FRAMES
    assert (psfs["chi2"] < 2.0).all()


def test_star_fluxes_measured(pipeline_run):
    fluxes = _query("SELECT * FROM star_flux_in_frame")
    stars = _query("SELECT * FROM stars")
    assert len(stars) == len(STAR_OFFSETS)
    assert len(fluxes) == N_FRAMES * len(stars)
    assert (fluxes["chi2"] < 2.0).all()
    # recovered fluxes should be close to the injected ones
    merged = fluxes.merge(stars, left_on="star_gaia_id",
                          right_on="gaia_id")
    injected = {str(1000 + i): f
                for i, f in enumerate(STAR_FLUXES_E_S)}
    for gaia_id, group in merged.groupby("star_gaia_id"):
        measured = group["flux"].median()
        assert measured == pytest.approx(injected[str(gaia_id)], rel=0.1)


def test_normalization_and_zeropoints(pipeline_run):
    coeffs = _query("SELECT * FROM normalization_coefficients")
    assert len(coeffs) == N_FRAMES
    # same-depth synthetic frames: coefficients all ~1
    np.testing.assert_allclose(coeffs["coefficient"], 1.0, atol=0.05)
    zps = _query("SELECT * FROM absolute_zeropoints")
    assert len(zps) == N_FRAMES


def test_roi_products_and_fluxes(pipeline_run, workdir):
    out_dir = workdir / "prepared_roi_cutouts"
    csvs = list(out_dir.glob("*_photometry_per_epoch.csv"))
    assert len(csvs) == 1
    photometry = pd.read_csv(csvs[0])
    assert len(photometry) == N_FRAMES
    assert (photometry["reduced_chi2"] < 2.0).all()
    for ps, fluxes in PS_FLUXES.items():
        measured = np.asarray(photometry[f"{ps}_flux"])
        np.testing.assert_allclose(measured, fluxes, rtol=0.15)
    # astrometry close to injected positions
    astrometry_file = list(out_dir.glob("*_astrometry.json"))[0]
    astrometry = json.loads(astrometry_file.read_text())
    for ps, (dx, dy) in PS_OFFSETS.items():
        ra_true = ROI_RA + dx / 3600.0 / np.cos(np.radians(ROI_DEC))
        dec_true = ROI_DEC + dy / 3600.0
        ra_fit, dec_fit = astrometry[ps]
        assert abs(dec_fit - dec_true) * 3600 < 0.3
        assert abs(ra_fit - ra_true) * 3600 < 0.3
    # high-res model + stacks written
    assert list(out_dir.glob("*_high_res_model.fits"))
    assert list(out_dir.glob("*_stack.fits"))
    # the fits ran checkpointed (deconv_checkpoint_every=100) and the
    # checkpoints were cleaned up on success — no stale-resume hazard
    assert not list((workdir / "checkpoints").glob("*.ckpt"))


def test_rerun_is_incremental(pipeline_run):
    """Re-running the pipeline does not duplicate products."""
    from lightcurver_tpu.pipeline.workflow_manager import WorkflowManager

    WorkflowManager().run(stop_step="calculate_normalization_coefficient")
    assert len(_query("SELECT * FROM frames")) == N_FRAMES
    assert len(_query("SELECT * FROM PSFs")) == N_FRAMES
    assert len(_query("SELECT * FROM star_flux_in_frame")) == \
        N_FRAMES * len(STAR_OFFSETS)


def test_adapt_wcs_recovers_injected_fault(pipeline_run, workdir):
    """Reference e2e scenario: SQL-flip one frame to unsolved, switch the
    strategy to adapt_wcs_from_reference, and check it gets re-solved by
    source-pattern matching against a solved frame."""
    from lightcurver_tpu.structure.database import execute_sqlite_query
    from lightcurver_tpu.processes.\
        alternate_plate_solving_adapt_existing_wcs import \
        alternate_plate_solve_adapt_ref
    import lightcurver_tpu.structure.user_config as uc

    execute_sqlite_query(
        "UPDATE frames SET plate_solved = 0, attempted_plate_solve = 0 "
        "WHERE id = 2", is_select=False)

    config = uc.get_user_config()  # sanity: loads fine
    assert config["already_plate_solved"] == 1

    # run the alternate solver directly (the strategy dispatch is
    # exercised by WorkflowManager tests)
    import yaml

    cfg_path = workdir / "config.yaml"
    cfg = yaml.safe_load(cfg_path.read_text())
    cfg["plate_solve_frames"] = "all_not_plate_solved"
    cfg["reference_frame_for_wcs"] = 1
    cfg_path.write_text(yaml.dump(cfg))

    alternate_plate_solve_adapt_ref()
    solved = _query("SELECT plate_solved FROM frames WHERE id = 2")
    assert int(solved["plate_solved"][0]) == 1
    # the re-derived WCS must land the ROI within a fraction of a pixel
    from lightcurver_tpu.io.fits import read_fits
    from lightcurver_tpu.io.wcs import TanWCS

    frames = _query("SELECT image_relpath FROM frames WHERE id = 2")
    _, header = read_fits(workdir / frames["image_relpath"][0],
                          header_only=True)
    wcs = TanWCS.from_header(header)
    x, y = wcs.world_to_pixel(ROI_RA, ROI_DEC)
    true_wcs = _make_wcs(FRAME_DITHER_PX[1])
    xt, yt = true_wcs.world_to_pixel(ROI_RA, ROI_DEC)
    assert abs(float(x) - float(xt)) < 0.3
    assert abs(float(y) - float(yt)) < 0.3

    # restore config for any later tests
    cfg["plate_solve_frames"] = "all_never_attempted"
    cfg["reference_frame_for_wcs"] = None
    cfg_path.write_text(yaml.dump(cfg))


def test_field_distortion_redo(pipeline_run, workdir):
    """Re-run PSF modelling with field_distortion=True (redo path)."""
    import yaml
    from lightcurver_tpu.pipeline.workflow_manager import WorkflowManager

    cfg_path = workdir / "config.yaml"
    cfg = yaml.safe_load(cfg_path.read_text())
    cfg["field_distortion"] = True
    cfg["redo_psf"] = True
    cfg["psf_n_iter_analytic"] = 20
    cfg["psf_n_iter_pixels"] = 60
    cfg_path.write_text(yaml.dump(cfg))
    try:
        WorkflowManager().run(start_step="psf_modeling",
                              stop_step="psf_modeling")
        psfs = _query("SELECT * FROM PSFs")
        assert len(psfs) == N_FRAMES
        assert (psfs["chi2"] < 3.0).all()
    finally:
        cfg["field_distortion"] = False
        cfg["redo_psf"] = False
        cfg_path.write_text(yaml.dump(cfg))
