"""End-to-end Gaia-match plate solving on synthetic unsolved frames."""

import os

import numpy as np
import pandas as pd
import pytest
import yaml

from test_e2e_pipeline import (ROI_RA, ROI_DEC, PIXEL_SCALE, FRAME_SIZE,
                               EXPTIME, GAIN, SKY_E_PER_S, STAR_OFFSETS,
                               STAR_FLUXES_E_S, _make_wcs, _render_frame)

DITHERS = [(0.0, 0.0), (2.0, -1.5)]


@pytest.fixture()
def workdir(tmp_path, monkeypatch):
    raw_dir = tmp_path / "raw"
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
            "ref_epoch": 2016.0})
    fixture_csv = tmp_path / "gaia.csv"
    pd.DataFrame(stars).to_csv(fixture_csv, index=False)
    star_world = [((s["ra"], s["dec"]), f)
                  for s, f in zip(stars, STAR_FLUXES_E_S)]

    from lightcurver_tpu.io.fits import write_fits, Header

    for k, dither in enumerate(DITHERS):
        wcs = _make_wcs(dither)
        clean = _render_frame(rng, 0, star_world, wcs)
        total = (clean + SKY_E_PER_S) * EXPTIME
        adu = (total + rng.normal(0, np.sqrt(total))) / GAIN
        header = Header()  # NO WCS: frames arrive unsolved
        header["MJD-OBS"] = 60100.0 + k
        header["EXPTIME"] = EXPTIME
        header["GAIN"] = GAIN
        write_fits(raw_dir / f"frame_{k:02d}.fits",
                   adu.astype(np.float32), header)

    parser_dir = tmp_path / "header_parser"
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
        "workdir": str(tmp_path),
        "raw_dirs": [str(raw_dir)],
        "already_plate_solved": 0,
        "plate_solving_strategy": "alternate_gaia_solve",
        "plate_scale_interval": [0.19, 0.21],
        "alternate_plate_solve_gaia_radius": 60,
        "multiprocessing_cpu_count": 1,
        "source_extraction_threshold": 3.0,
        "source_extraction_min_area": 5,
        "source_extraction_do_plots": 0,
        "min_number_stars": 5,
    })
    config_path = tmp_path / "config.yaml"
    config_path.write_text(yaml.dump(config))
    monkeypatch.setenv("LIGHTCURVER_CONFIG", str(config_path))
    monkeypatch.setenv("LIGHTCURVER_GAIA_FIXTURE", str(fixture_csv))
    return tmp_path


def test_gaia_solver_recovers_wcs(workdir):
    from lightcurver_tpu.pipeline.workflow_manager import WorkflowManager
    from lightcurver_tpu.structure.database import execute_sqlite_query
    from lightcurver_tpu.io.fits import read_fits
    from lightcurver_tpu.io.wcs import TanWCS

    WorkflowManager().run(stop_step="plate_solving")
    frames = execute_sqlite_query(
        "SELECT id, image_relpath, plate_solved FROM frames",
        use_pandas=True)
    assert len(frames) == len(DITHERS)
    assert (frames["plate_solved"] == 1).all()

    for idx, row in frames.iterrows():
        _, header = read_fits(workdir / row["image_relpath"],
                              header_only=True)
        wcs = TanWCS.from_header(header)
        true_wcs = _make_wcs(DITHERS[idx])
        x, y = wcs.world_to_pixel(ROI_RA, ROI_DEC)
        xt, yt = true_wcs.world_to_pixel(ROI_RA, ROI_DEC)
        assert abs(float(x) - float(xt)) < 0.3
        assert abs(float(y) - float(yt)) < 0.3
        assert wcs.pixel_scale_arcsec() == pytest.approx(0.2, rel=5e-3)
