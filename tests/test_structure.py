"""Database schema/queries and config loading on a temp workdir."""

import os
import sqlite3

import numpy as np
import pytest
import yaml


@pytest.fixture()
def workdir(tmp_path, monkeypatch):
    """Minimal config + initialized database in a temp dir."""
    config = {
        "workdir": str(tmp_path),
        "raw_dirs": [str(tmp_path / "raw")],
        "ROI": {"testroi": {"coordinates": [42.2031, 19.22528]}},
        "photometric_band": "r_sdss",
        "stars_to_use_psf": "abc",
        "stars_to_use_norm": None,
        "stars_to_exclude_psf": None,
        "stars_to_exclude_norm": None,
    }
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.dump(config))
    monkeypatch.setenv("LIGHTCURVER_CONFIG", str(cfg_path))
    from lightcurver_tpu.structure.database import initialize_database

    initialize_database()
    return tmp_path


def test_config_derivations(workdir):
    from lightcurver_tpu.structure.user_config import get_user_config

    config = get_user_config()
    assert config["roi_name"] == "testroi"
    assert config["ROI_ra_deg"] == 42.2031
    assert config["stars_to_use_psf"] == ["a", "b", "c"]
    assert config["reference_absolute_photometric_survey"] == "gaia"
    assert config["database_path"].name == "database.sqlite3"
    assert config["plots_dir"].exists()


def test_psf_dft_pad_default_scales_with_subsampling(workdir, tmp_path):
    """The injected psf_dft_pad default must satisfy psf_fft_length's
    pad >= 4*s validation at ANY subsampling factor — a bare 16 would
    hard-crash previously-working configs with subsampling_factor 5+
    the moment the default landed."""
    from lightcurver_tpu.core.psf.build import psf_fft_length
    from lightcurver_tpu.structure.user_config import get_user_config

    cfg_path = tmp_path / "config.yaml"
    base = yaml.safe_load(cfg_path.read_text())
    for s, expected in [(2, 16), (4, 16), (5, 20), (8, 32)]:
        base["subsampling_factor"] = s
        cfg_path.write_text(yaml.dump(base))
        config = get_user_config()
        assert config["psf_dft_pad"] == expected
        # and it must be accepted by the validator (no ValueError)
        psf_fft_length(32 * s, s, config["psf_dft_pad"])


def test_schema_tables(workdir):
    conn = sqlite3.connect(workdir / "database.sqlite3")
    tables = {r[0] for r in conn.execute(
        "SELECT name FROM sqlite_master WHERE type='table'")}
    assert {"frames", "footprints", "combined_footprint", "stars",
            "catalog_star_photometry", "stars_in_frames", "PSFs",
            "star_flux_in_frame", "normalization_coefficients",
            "absolute_zeropoints"} <= tables


def test_star_selection_queries(workdir):
    from lightcurver_tpu.structure.database import (
        execute_sqlite_query, select_stars, select_stars_for_a_frame)

    fp = 12345
    for i, (name, dist) in enumerate(
            zip("abcde", [10.0, 20.0, 30.0, 40.0, 50.0])):
        execute_sqlite_query(
            "INSERT INTO stars (combined_footprint_hash, name, ra, dec, "
            "gaia_id, distance_to_roi_arcsec) VALUES (?, ?, ?, ?, ?, ?)",
            params=(fp, name, 42.0 + i * 0.01, 19.0, f"gaia{i}", dist),
            is_select=False)
    execute_sqlite_query(
        "INSERT INTO frames (id, mjd) VALUES (1, 60000.0)", is_select=False)
    for i in range(3):
        execute_sqlite_query(
            "INSERT INTO stars_in_frames (frame_id, star_gaia_id, "
            "combined_footprint_hash) VALUES (?, ?, ?)",
            params=(1, f"gaia{i}", fp), is_select=False)

    # top-N closest
    top2 = select_stars(fp, stars_to_use=2)
    assert list(top2["name"]) == ["a", "b"]
    # named list
    named = select_stars(fp, stars_to_use=["d", "e"])
    assert set(named["name"]) == {"d", "e"}
    # exclusion wins
    excl = select_stars(fp, stars_to_use=3, stars_to_exclude="b")
    assert list(excl["name"]) == ["a", "c"]
    # per-frame join
    per_frame = select_stars_for_a_frame(1, fp)
    assert set(per_frame["name"]) == {"a", "b", "c"}
    # numpy-scalar parameters (the type every pandas-derived id has)
    # must behave exactly like Python ints: sqlite3 would otherwise bind
    # them as BLOBs and silently return ZERO rows (round-2 regression)
    import numpy as np

    per_frame_np = select_stars_for_a_frame(np.int64(1), np.int64(fp))
    assert set(per_frame_np["name"]) == {"a", "b", "c"}
    rows = execute_sqlite_query(
        "SELECT COUNT(*) FROM stars_in_frames WHERE frame_id = ?",
        params=(np.int64(1),))
    assert rows[0][0] == 3


def test_upsert_semantics(workdir):
    from lightcurver_tpu.structure.database import (execute_sqlite_query,
                                                    get_pandas)

    q = ("INSERT OR REPLACE INTO PSFs (combined_footprint_hash, frame_id, "
         "chi2, psf_ref, subsampling_factor) VALUES (?, ?, ?, ?, ?)")
    execute_sqlite_query(q, params=(1, 1, 1.5, "abc", 2), is_select=False)
    execute_sqlite_query(q, params=(1, 1, 1.1, "abc", 2), is_select=False)
    psfs = get_pandas(table="PSFs")
    assert len(psfs) == 1
    assert psfs["chi2"][0] == pytest.approx(1.1)


def test_header_parser_plugin(workdir):
    plugin_dir = workdir / "header_parser"
    plugin_dir.mkdir()
    (plugin_dir / "parse_header.py").write_text(
        "def parse_header(header):\n"
        "    return {'mjd': header['MJD-OBS'], 'gain': 1.2, 'exptime': 30.}\n")
    from lightcurver_tpu.structure.user_header_parser import \
        load_custom_header_parser

    parser = load_custom_header_parser()
    out = parser({"MJD-OBS": 60123.5})
    assert out == {"mjd": 60123.5, "gain": 1.2, "exptime": 30.0}


def test_empty_star_list_is_a_clear_error(workdir):
    """stars_to_use = [] used to generate 'IN ()' — a bare SQLite syntax
    error deep inside a task; now a ValueError naming the config knob."""
    from lightcurver_tpu.structure.database import select_stars

    with pytest.raises(ValueError, match="empty list"):
        select_stars(12345, stars_to_use=[])


def test_star_assignment_across_ra_seam(workdir):
    """A footprint straddling RA = 0 must still collect its stars
    (round-3 review finding: flat-plane contains() broke at the seam)."""
    import json

    from lightcurver_tpu.processes.frame_star_assignment import \
        populate_stars_in_frames
    from lightcurver_tpu.structure.database import (execute_sqlite_query,
                                                    get_pandas)

    execute_sqlite_query("INSERT INTO frames (id, mjd) VALUES (1, 60000.0)",
                         is_select=False)
    # corner RAs as the (historically wrapped) WCS convention stores them
    poly = [[359.9, 9.9], [0.1, 9.9], [0.1, 10.1], [359.9, 10.1]]
    execute_sqlite_query(
        "INSERT INTO footprints (frame_id, polygon) VALUES (?, ?)",
        params=(1, json.dumps(poly)), is_select=False)
    for gaia_id, ra in [("g1", 359.95), ("g2", 0.05), ("g3", 1.5)]:
        execute_sqlite_query(
            "INSERT INTO stars (combined_footprint_hash, name, ra, dec, "
            "gaia_id, distance_to_roi_arcsec) VALUES (?, ?, ?, ?, ?, ?)",
            params=(777, gaia_id, ra, 10.0, gaia_id, 10.0),
            is_select=False)
    populate_stars_in_frames()
    rows = get_pandas(table="stars_in_frames")
    assert set(rows["star_gaia_id"]) == {"g1", "g2"}  # g3 outside
