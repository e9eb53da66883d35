"""Pan-STARRS absolute-calibration path (offline fixture, no network)."""

import numpy as np
import pandas as pd
import pytest
import yaml


@pytest.fixture()
def ps_workdir(tmp_path, monkeypatch):
    config = {
        "workdir": str(tmp_path),
        "raw_dirs": [str(tmp_path / "raw")],
        "ROI": {"testroi": {"coordinates": [42.2031, 19.22528]}},
        "photometric_band": "r_panstarrs",
        "stars_to_use_psf": None,
        "stars_to_use_norm": None,
        "stars_to_exclude_psf": None,
        "stars_to_exclude_norm": None,
    }
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.dump(config))
    monkeypatch.setenv("LIGHTCURVER_CONFIG", str(cfg_path))
    from lightcurver_tpu.structure.database import (execute_sqlite_query,
                                                    initialize_database)

    initialize_database()
    execute_sqlite_query(
        "INSERT INTO stars (combined_footprint_hash, name, ra, dec, "
        "gaia_id, distance_to_roi_arcsec) VALUES (1, 'a', 42.2, 19.2, "
        "'g1', 5.0)", is_select=False)
    return tmp_path


def _fixture_csv(path, rows):
    pd.DataFrame(rows).to_csv(path, index=False)
    return path


def test_band_selection_and_db_insert(ps_workdir, monkeypatch):
    from lightcurver_tpu.structure.database import execute_sqlite_query
    from lightcurver_tpu.utilities.absolute_magnitudes_from_panstarrs \
        import save_panstarrs_catalog_photometry_to_database

    csv = _fixture_csv(ps_workdir / "ps1.csv", [{
        "objID": 12345, "nDetections": 30,
        "gMeanPSFMag": 17.5, "gMeanPSFMagErr": 0.01,
        "rMeanPSFMag": 17.0, "rMeanPSFMagErr": 0.02,
        "iMeanPSFMag": 16.8, "iMeanPSFMagErr": 0.02,
    }])
    monkeypatch.setenv("LIGHTCURVER_PANSTARRS_FIXTURE", str(csv))
    save_panstarrs_catalog_photometry_to_database("g1")
    rows = execute_sqlite_query(
        "SELECT catalog, band, mag, mag_err, original_catalog_id "
        "FROM catalog_star_photometry WHERE star_gaia_id = 'g1'")
    assert len(rows) == 1
    catalog, band, mag, mag_err, cat_id = rows[0]
    assert (catalog, band) == ("panstarrs", "r")
    assert mag == pytest.approx(17.0)
    assert float(cat_id) == 12345  # CSV fixtures may float-ify objID
    # idempotent: a second call does not duplicate
    save_panstarrs_catalog_photometry_to_database("g1")
    n = execute_sqlite_query(
        "SELECT COUNT(*) FROM catalog_star_photometry")[0][0]
    assert n == 1


def test_composite_bands_and_cluster_rejection(ps_workdir, monkeypatch):
    from lightcurver_tpu.utilities.absolute_magnitudes_from_panstarrs \
        import photometric_selection_heuristic

    row = {"objID": 1, "nDetections": 30,
           "gMeanPSFMag": 18.0, "gMeanPSFMagErr": 0.02,
           "rMeanPSFMag": 17.0, "rMeanPSFMagErr": 0.02,
           "iMeanPSFMag": 16.5, "iMeanPSFMagErr": 0.03}

    # composite 'c' band (Tonry+ 2018): 0.49 g + 0.51 r
    cfg = yaml.safe_load((ps_workdir / "config.yaml").read_text())
    cfg["photometric_band"] = "c_panstarrs"
    (ps_workdir / "config.yaml").write_text(yaml.dump(cfg))
    out = photometric_selection_heuristic(pd.DataFrame([row]))
    assert out["band"] == "c"
    assert out["mag"] == pytest.approx(0.49 * 18.0 + 0.51 * 17.0)

    # duplicate barely-detected clusters are filtered, real one kept
    dup = dict(row, objID=2, nDetections=2)
    out2 = photometric_selection_heuristic(pd.DataFrame([row, dup]))
    assert out2 is not None and out2["catalog_ID"] == 1

    # ambiguous (two strong detections) -> None, never a guess
    strong_dup = dict(row, objID=3, nDetections=28)
    assert photometric_selection_heuristic(
        pd.DataFrame([row, strong_dup])) is None

    # missing band -> None
    nog = {k: v for k, v in row.items() if not k.startswith("g")}
    cfg["photometric_band"] = "g_panstarrs"
    (ps_workdir / "config.yaml").write_text(yaml.dump(cfg))
    assert photometric_selection_heuristic(pd.DataFrame([nog])) is None


def test_invalid_sentinel_mags_rejected(ps_workdir):
    """PS1 uses -999 for missing photometry: must not pass the cut."""
    from lightcurver_tpu.utilities.absolute_magnitudes_from_panstarrs \
        import photometric_selection_heuristic

    row = {"objID": 1, "nDetections": 30,
           "rMeanPSFMag": -999.0, "rMeanPSFMagErr": -999.0}
    assert photometric_selection_heuristic(pd.DataFrame([row])) is None
