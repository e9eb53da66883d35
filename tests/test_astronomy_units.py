"""Direct unit coverage of the small astronomy/gating components that
were previously only exercised through the end-to-end pipeline:
ephemeris accuracy vs known values, Gaia colour transforms, chi2 gating
strategies, and the plate-solve health check."""

import numpy as np
import pytest
import yaml


class TestEphemeris:
    """In-repo Meeus ephemeris vs independently known values."""

    def test_sun_position_j2000(self):
        from lightcurver_tpu.utilities.ephemeris import sun_position

        # 2000-01-01 12:00 TT (J2000.0): apparent sun at
        # RA ~ 281.29 deg, Dec ~ -23.03 deg (Astronomical Almanac)
        mjd = 51544.5
        ra, dec, _ = sun_position(mjd)
        assert ra == pytest.approx(281.29, abs=0.2)
        assert dec == pytest.approx(-23.03, abs=0.1)

    def test_moon_distance_from_sun_tracks_phase(self):
        from lightcurver_tpu.utilities.ephemeris import (
            angular_separation, moon_illumination_percent, moon_position,
            sun_position)

        # full moon 2024-01-25 ~17:54 UTC (MJD 60334.75): illumination
        # ~100%, moon roughly opposite the sun
        mjd_full = 60334.75
        assert moon_illumination_percent(mjd_full) > 98.0
        sra, sdec, _ = sun_position(mjd_full)
        mra, mdec, _, _ = moon_position(mjd_full)
        assert angular_separation(sra, sdec, mra, mdec) > 170.0

        # new moon 2024-01-11 ~11:57 UTC: dark, near the sun
        mjd_new = 60320.5
        assert moon_illumination_percent(mjd_new) < 2.0

    def test_altaz_zenith(self):
        from lightcurver_tpu.utilities.ephemeris import (gmst_deg,
                                                         radec_to_altaz)

        # a target at the local meridian with dec == latitude transits
        # the zenith
        mjd = 60000.0
        lat, lon = -29.25, -70.73  # La Silla
        lst = (gmst_deg(mjd) + lon) % 360.0
        alt, az = radec_to_altaz(lst, lat, mjd, lat, lon)
        assert alt == pytest.approx(90.0, abs=0.2)

    def test_angular_separation_small_and_large(self):
        from lightcurver_tpu.utilities.ephemeris import angular_separation

        assert angular_separation(10.0, 20.0, 10.0, 21.0) == \
            pytest.approx(1.0, abs=1e-6)
        assert angular_separation(0.0, 0.0, 180.0, 0.0) == \
            pytest.approx(180.0, abs=1e-6)


@pytest.fixture()
def gated_workdir(tmp_path, monkeypatch):
    config = {
        "workdir": str(tmp_path),
        "raw_dirs": [str(tmp_path / "raw")],
        "ROI": {"t": {"coordinates": [42.0, 19.0]}},
        "photometric_band": "r_sdss",
        "stars_to_use_psf": None, "stars_to_use_norm": None,
        "stars_to_exclude_psf": None, "stars_to_exclude_norm": None,
        "psf_fit_exclude_strategy": None,
        "fluxes_fit_exclude_strategy": None,
        "plate_solving_min_success_fraction": 0.6,
    }
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.dump(config))
    monkeypatch.setenv("LIGHTCURVER_CONFIG", str(cfg_path))
    from lightcurver_tpu.structure.database import initialize_database

    initialize_database()
    return tmp_path, cfg_path, config


def _set(cfg_path, config, **updates):
    config.update(updates)
    cfg_path.write_text(yaml.dump(config))


class TestChi2Selector:
    def test_strategies(self, gated_workdir):
        tmp, cfg_path, config = gated_workdir
        from lightcurver_tpu.structure.database import \
            execute_sqlite_query
        from lightcurver_tpu.utilities.chi2_selector import \
            get_chi2_bounds

        # None -> wide open
        lo, hi = get_chi2_bounds("psf")
        assert lo == -np.inf and hi == np.inf

        # explicit thresholds pass through
        _set(cfg_path, config,
             psf_fit_exclude_strategy={"threshold": [0.0, 2.0]})
        assert get_chi2_bounds("psf") == (0.0, 2.0)

        # sigma_clip derives bounds from the stored chi2 population
        rng = np.random.default_rng(0)
        chi2s = np.concatenate([rng.normal(1.0, 0.05, 50), [8.0, 9.0]])
        for i, c in enumerate(chi2s):
            execute_sqlite_query(
                "INSERT OR REPLACE INTO PSFs (frame_id, chi2, psf_ref, "
                "combined_footprint_hash, subsampling_factor) "
                "VALUES (?, ?, 'p', 1, 2)", (i, float(c)),
                is_select=False)
        _set(cfg_path, config,
             psf_fit_exclude_strategy={"sigma_clip": 3.0})
        lo, hi = get_chi2_bounds("psf")
        assert lo < 1.0 < hi
        assert hi < 8.0, "outliers must not inflate the clip bounds"

        # malformed strategy rejected loudly
        _set(cfg_path, config,
             psf_fit_exclude_strategy={"bogus": 1})
        with pytest.raises(RuntimeError):
            get_chi2_bounds("psf")


class TestStateChecker:
    def test_plate_solve_fraction(self, gated_workdir):
        tmp, cfg_path, config = gated_workdir
        from lightcurver_tpu.pipeline.state_checkers import \
            check_plate_solving
        from lightcurver_tpu.structure.database import \
            execute_sqlite_query

        ok, msg = check_plate_solving()
        assert ok  # nothing attempted

        for i, solved in enumerate([1, 1, 0, 0]):
            execute_sqlite_query(
                "INSERT INTO frames (id, mjd, attempted_plate_solve, "
                "plate_solved) VALUES (?, 60000, 1, ?)", (i, solved),
                is_select=False)
        ok, msg = check_plate_solving()
        assert not ok and "0.50" in msg  # 0.5 < minimum 0.6
        _set(cfg_path, config, plate_solving_min_success_fraction=0.4)
        ok, msg = check_plate_solving()
        assert ok


class TestGaiaColourTransforms:
    def test_r_sdss_transform_and_insert(self, gated_workdir):
        tmp, cfg_path, config = gated_workdir
        from lightcurver_tpu.structure.database import \
            execute_sqlite_query
        from lightcurver_tpu.utilities.absolute_magnitudes_from_gaia \
            import (GAIA_COLOR_COEFFICIENTS,
                    save_gaia_catalog_photometry_to_database)

        g, bp, rp = 17.0, 17.5, 16.7  # BP-RP = 0.8, solar-ish
        execute_sqlite_query(
            "INSERT INTO stars (combined_footprint_hash, name, ra, dec, "
            "gaia_id, gmag, bmag, rmag, distance_to_roi_arcsec) "
            "VALUES (1, 'a', 42.0, 19.0, 'g9', ?, ?, ?, 5.0)",
            (g, bp, rp), is_select=False)
        save_gaia_catalog_photometry_to_database("g9")
        rows = execute_sqlite_query(
            "SELECT band, mag, mag_err FROM catalog_star_photometry "
            "WHERE star_gaia_id = 'g9'")
        assert len(rows) == 1
        band, mag, mag_err = rows[0]
        assert band == "r_sdss"
        coef = GAIA_COLOR_COEFFICIENTS["r_sdss"]
        expected = g - sum(c * 0.8**i for i, c in enumerate(coef))
        assert mag == pytest.approx(expected, abs=1e-9)
        # the published relation: G - r ~ 0.1-0.25 at this colour
        assert 0.0 < g - mag < 0.5
        assert mag_err == pytest.approx(0.03)

    def test_unsupported_band_rejected(self, gated_workdir):
        tmp, cfg_path, config = gated_workdir
        from lightcurver_tpu.utilities.absolute_magnitudes_from_gaia \
            import save_gaia_catalog_photometry_to_database

        _set(cfg_path, config, photometric_band="z_panstarrs")
        with pytest.raises(ValueError, match="Unsupported band"):
            save_gaia_catalog_photometry_to_database("g9")


def test_ephemeris_result_structure():
    """Reference contract (tests/test_processes/
    test_frame_characterization.py): the ephemeris() dict carries the
    five documented keys at a realistic observation."""
    from lightcurver_tpu.processes.frame_characterization import ephemeris

    results = ephemeris(mjd=60365.13, ra_object=141.23246,
                        dec_object=2.32358, telescope_longitude=-70.738,
                        telescope_latitude=-29.256,
                        telescope_elevation=2400.0)
    assert isinstance(results, dict)
    for key in ("weird_astro_conditions", "comments", "target_info",
                "moon_info", "sun_info"):
        assert key in results
    # and the target block is populated with finite values
    assert np.isfinite(results["target_info"]["airmass"])
