"""High-SNR blind end-to-end accuracy: the full pipeline reaches ~1%.

The standard e2e (test_e2e_pipeline.py) bounds blind ROI flux recovery
at 15% — at its LOW test SNR, where the method's intrinsic
flux<->background degeneracy dominates (BASELINE.md scope note).  This
module runs the same 12-task blind pipeline on a 100x-brighter scene
(sources x25, exposure x4 -> ~10x higher SNR) and pins the accuracy the
method should reach when photon noise no longer feeds the degeneracy:
every recovered ROI point-source flux within 1% of the injected truth.

Together with tools/degeneracy_study.py (the committed error-vs-SNR x
regularization table in PARITY.md) this closes the accuracy story:
sub-mmag model chain (test_photometric_accuracy.py), ~1% full blind
pipeline at high SNR (here), 10-15% at the low-SNR e2e scale.
"""

import os

import numpy as np
import pandas as pd
import pytest
import yaml

ROI_RA, ROI_DEC = 42.2031, 19.22528
PIXEL_SCALE = 0.2 / 3600.0  # deg/px
FRAME_SIZE = 160
EXPTIME = 120.0             # 4x the standard e2e exposure
GAIN = 1.2
SKY_E_PER_S = 10.0
N_FRAMES = 3
BRIGHT = 25.0               # flux scale vs the standard e2e scene

STAR_OFFSETS = [(-6, -6), (6, -6), (-6, 6), (6, 6), (8, 0), (0, 8),
                (-8, 0), (0, -8)]
STAR_FLUXES_E_S = [BRIGHT * f for f in
                   (800.0, 600.0, 1000.0, 700.0, 500.0, 900.0, 650.0,
                    750.0)]
PS_OFFSETS = {"A": (-0.8, 0.5), "B": (0.7, -0.6)}
PS_FLUXES = {"A": [BRIGHT * f for f in (300.0, 360.0, 330.0)],
             "B": [BRIGHT * f for f in (150.0, 120.0, 135.0)]}
FRAME_FWHM_PX = [2.6, 3.1, 2.8]
FRAME_DITHER_PX = [(0.0, 0.0), (1.4, -0.8), (-1.1, 0.6)]


def _make_wcs(dither_px):
    from lightcurver_tpu.io.wcs import TanWCS

    c = (FRAME_SIZE + 1) / 2.0
    return TanWCS(ROI_RA, ROI_DEC, c + dither_px[0], c + dither_px[1],
                  [[-PIXEL_SCALE, 0.0], [0.0, PIXEL_SCALE]])


def _render_frame(frame_idx, star_world, wcs):
    fwhm = FRAME_FWHM_PX[frame_idx]
    img = np.zeros((FRAME_SIZE, FRAME_SIZE))
    yy, xx = np.mgrid[0:FRAME_SIZE, 0:FRAME_SIZE]

    def add_source(x, y, flux):
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
    tmp = tmp_path_factory.mktemp("e2e_hisnr")
    raw_dir = tmp / "raw"
    raw_dir.mkdir()
    rng = np.random.default_rng(7)

    stars = []
    for i, ((dx, dy), flux) in enumerate(zip(STAR_OFFSETS,
                                             STAR_FLUXES_E_S)):
        ra = ROI_RA + dx / 3600.0 / np.cos(np.radians(ROI_DEC))
        dec = ROI_DEC + dy / 3600.0
        gmag = 20.0 - 2.5 * np.log10(flux)
        stars.append({
            "ra": ra, "dec": dec, "source_id": 2000 + i,
            "phot_g_mean_mag": gmag, "phot_bp_mean_mag": gmag + 0.5,
            "phot_rp_mean_mag": gmag - 0.5, "pmra": 0.0, "pmdec": 0.0,
            "ref_epoch": 2016.0,
        })
    fixture_csv = tmp / "gaia_fixture.csv"
    pd.DataFrame(stars).to_csv(fixture_csv, index=False)
    star_world = [((s["ra"], s["dec"]), f)
                  for s, f in zip(stars, STAR_FLUXES_E_S)]

    from lightcurver_tpu.io.fits import write_fits, Header

    for k in range(N_FRAMES):
        wcs = _make_wcs(FRAME_DITHER_PX[k])
        clean_e_s = _render_frame(k, star_world, wcs)
        total_e = (clean_e_s + SKY_E_PER_S) * EXPTIME
        noisy_e = total_e + rng.normal(0, np.sqrt(total_e))
        adu = noisy_e / GAIN
        header = Header()
        header["MJD-OBS"] = 60100.0 + 2.0 * k
        header["EXPTIME"] = EXPTIME
        header["GAIN"] = GAIN
        header.update(wcs.to_header_cards())
        write_fits(raw_dir / f"frame_{k:02d}.fits",
                   adu.astype(np.float32), header)

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
        # SAME budgets and shapes as the low-SNR e2e
        # (test_e2e_pipeline.py) wherever the 1% bar allows: those fit
        # programs are then byte-identical across the two modules and
        # compile once for the whole suite via the persistent cache.
        # Only the star fit needs more depth (measured: 250 iters
        # leaves the faintest star 1.1% low; 400 converges it)
        "psf_n_iter_analytic": 40,
        "psf_n_iter_pixels": 150,
        "star_deconv_n_iter": 400,
        "roi_deconv_translations_iters": 40,
        "roi_deconv_all_iters": 400,
        "deconv_checkpoint_every": 0,
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

    prev_cfg = os.environ.get("LIGHTCURVER_CONFIG")
    os.environ["LIGHTCURVER_CONFIG"] = str(config_path)
    os.environ["LIGHTCURVER_GAIA_FIXTURE"] = str(fixture_csv)
    yield tmp
    os.environ.pop("LIGHTCURVER_GAIA_FIXTURE", None)
    if prev_cfg is not None:
        os.environ["LIGHTCURVER_CONFIG"] = prev_cfg


@pytest.fixture(scope="module")
def pipeline_run(workdir):
    from lightcurver_tpu.pipeline.workflow_manager import WorkflowManager

    WorkflowManager().run()
    return workdir


def test_star_fluxes_within_one_percent(pipeline_run):
    from lightcurver_tpu.structure.database import execute_sqlite_query

    fluxes = execute_sqlite_query("SELECT * FROM star_flux_in_frame",
                                  use_pandas=True)
    stars = execute_sqlite_query("SELECT * FROM stars", use_pandas=True)
    assert len(fluxes) == N_FRAMES * len(stars)
    merged = fluxes.merge(stars, left_on="star_gaia_id",
                          right_on="gaia_id")
    injected = {str(2000 + i): f
                for i, f in enumerate(STAR_FLUXES_E_S)}
    for gaia_id, group in merged.groupby("star_gaia_id"):
        measured = group["flux"].median()
        assert measured == pytest.approx(injected[str(gaia_id)],
                                         rel=0.01)


def test_roi_fluxes_within_one_percent(pipeline_run, workdir):
    """The headline claim: blind pipeline accuracy ~1% at high SNR."""
    out_dir = workdir / "prepared_roi_cutouts"
    csvs = list(out_dir.glob("*_photometry_per_epoch.csv"))
    assert len(csvs) == 1
    photometry = pd.read_csv(csvs[0])
    assert len(photometry) == N_FRAMES
    assert (photometry["reduced_chi2"] < 2.0).all()
    for ps, fluxes in PS_FLUXES.items():
        measured = np.asarray(photometry[f"{ps}_flux"])
        np.testing.assert_allclose(measured, fluxes, rtol=0.01)
