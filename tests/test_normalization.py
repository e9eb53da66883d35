"""Normalization solver: recover known per-frame flux scales."""

import numpy as np
import pandas as pd
import pytest
from scipy.optimize import minimize


def _synthetic_flux_table(frame_scales, star_base_fluxes, noise=0.01,
                          seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    for star_idx, base in enumerate(star_base_fluxes):
        for frame_idx, scale in enumerate(frame_scales):
            flux = base * scale * (1 + noise * rng.normal())
            rows.append({
                "star_gaia_id": f"g{star_idx}",
                "frame_id": frame_idx,
                "flux": flux,
                "d_flux": noise * base * scale,
            })
    return pd.DataFrame(rows)


def test_coefficient_recovery():
    from lightcurver_tpu.processes.normalization_calculation import (
        cost_function_scatter_in_frame, weighted_std)

    frame_scales = np.array([1.0, 0.8, 1.25, 0.95, 1.1])
    df = _synthetic_flux_table(frame_scales, [100.0, 300.0, 50.0, 800.0])

    medians = df.groupby("star_gaia_id")["flux"].median().rename(
        "median_flux")
    df = df.merge(medians, on="star_gaia_id")
    df["normalized_flux"] = df["flux"] / df["median_flux"]
    df["normalized_d_flux"] = df["d_flux"] / df["median_flux"]
    flux_pivot = df.pivot(index="star_gaia_id", columns="frame_id",
                          values="normalized_flux")
    d_pivot = df.pivot(index="star_gaia_id", columns="frame_id",
                       values="normalized_d_flux")

    constraint = {"type": "eq", "fun": lambda c: 1.0 - np.nanmean(c)}
    result = minimize(cost_function_scatter_in_frame,
                      np.ones(flux_pivot.shape[0]),
                      args=(flux_pivot, d_pivot),
                      constraints=constraint, method="SLSQP")
    scaled = flux_pivot.mul(result.x, axis=0)
    weights = 1.0 / d_pivot.mul(result.x, axis=0) ** 2
    coeff = (scaled * weights).sum(axis=0) / weights.sum(axis=0)

    # coefficients recover the injected frame scales up to a global norm
    recovered = coeff.to_numpy()
    expected = frame_scales / np.median(frame_scales)
    np.testing.assert_allclose(recovered / np.median(recovered),
                               expected, rtol=0.02)

    # per-frame uncertainty from the weighted std is finite and small
    errs = [weighted_std(scaled[f], weights[f]) for f in scaled.columns]
    assert np.all(np.isfinite(errs))
    assert max(errs) < 0.05


@pytest.fixture()
def _norm_workdir(tmp_path, monkeypatch):
    """Config + DB with 2 frames x 3 stars of fluxes; star 'c' is
    variable (flux 5x higher in frame 2)."""
    import yaml

    config = {
        "workdir": str(tmp_path),
        "raw_dirs": [str(tmp_path / "raw")],
        "ROI": {"roi": {"coordinates": [42.0, 19.0]}},
        "photometric_band": "r_sdss",
        "stars_to_use_psf": None,
        "stars_to_use_norm": None,
        "stars_to_exclude_psf": None,
        "stars_to_exclude_norm": "c",
        "star_selection_strategy": "common_footprint_stars",
        "fluxes_fit_exclude_strategy": None,
    }
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.dump(config))
    monkeypatch.setenv("LIGHTCURVER_CONFIG", str(cfg_path))
    from lightcurver_tpu.structure.database import (execute_sqlite_query,
                                                    initialize_database)

    initialize_database()
    from lightcurver_tpu.structure.user_config import get_user_config
    from lightcurver_tpu.utilities.footprint import \
        get_combined_footprint_hash

    for fid in (1, 2):
        execute_sqlite_query(
            "INSERT INTO frames (id, mjd, plate_solved, eliminated, "
            "roi_in_footprint) VALUES (?, ?, 1, 0, 1)",
            params=(fid, 60000.0 + fid), is_select=False)
    fp = get_combined_footprint_hash(get_user_config(), [1, 2])
    # stars a, b constant; star c 5x brighter in frame 2
    fluxes = {"ga": (100.0, 100.0), "gb": (300.0, 300.0),
              "gc": (100.0, 500.0)}
    for name, gid in [("a", "ga"), ("b", "gb"), ("c", "gc")]:
        execute_sqlite_query(
            "INSERT INTO stars (combined_footprint_hash, name, ra, dec, "
            "gaia_id, distance_to_roi_arcsec) VALUES "
            "(?, ?, 42.0, 19.0, ?, 10.0)", params=(fp, name, gid),
            is_select=False)
        for fid in (1, 2):
            execute_sqlite_query(
                "INSERT INTO stars_in_frames (frame_id, star_gaia_id, "
                "combined_footprint_hash) VALUES (?, ?, ?)",
                params=(fid, gid, fp), is_select=False)
            execute_sqlite_query(
                "INSERT INTO star_flux_in_frame (combined_footprint_hash,"
                " frame_id, star_gaia_id, flux, flux_uncertainty, chi2) "
                "VALUES (?, ?, ?, ?, ?, 1.0)",
                params=(fp, fid, gid, fluxes[gid][fid - 1],
                        0.01 * fluxes[gid][fid - 1]), is_select=False)
    return fp


def test_excluded_star_rows_do_not_poison_coefficients(_norm_workdir):
    """stars_to_exclude_norm must filter STALE star_flux_in_frame rows
    out of the normalization (the reference never consults it there,
    reference processes/normalization_calculation.py:157-160: an
    excluded variable star's old rows silently skew every frame
    coefficient)."""
    from lightcurver_tpu.processes.normalization_calculation import \
        calculate_coefficient
    from lightcurver_tpu.structure.database import get_pandas

    calculate_coefficient()
    coeffs = get_pandas(columns=["frame_id", "coefficient"],
                        table="normalization_coefficients")
    assert len(coeffs) == 2
    c = coeffs.sort_values("frame_id")["coefficient"].to_numpy()
    # stars a and b are constant across the frames: with the variable
    # excluded star filtered out, the two coefficients must be equal
    # (with it leaking in, frame 2's coefficient is ~1.5x frame 1's)
    np.testing.assert_allclose(c[1] / c[0], 1.0, rtol=0.02)


def test_update_normalization_coefficients_upsert(tmp_path, monkeypatch):
    """Reference contract (tests/test_database_queries/test_queries.py):
    insert rows, then re-insert one key with new values — the modified
    row is updated in place and the untouched row survives."""
    import yaml

    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.dump({
        "workdir": str(tmp_path), "raw_dirs": [str(tmp_path / "raw")],
        "ROI": {"roi": {"coordinates": [42.0, 19.0]}},
        "photometric_band": "r_sdss",
        "stars_to_use_psf": None, "stars_to_use_norm": None,
        "stars_to_exclude_psf": None, "stars_to_exclude_norm": None,
        "star_selection_strategy": "common_footprint_stars",
        "fluxes_fit_exclude_strategy": None}))
    monkeypatch.setenv("LIGHTCURVER_CONFIG", str(cfg_path))
    from lightcurver_tpu.processes.normalization_calculation import \
        update_normalization_coefficients
    from lightcurver_tpu.structure.database import (execute_sqlite_query,
                                                    initialize_database)

    initialize_database()
    update_normalization_coefficients([(1, -1, 1.0, 0.05),
                                       (2, -2, 0.9, 0.07)])
    rows = execute_sqlite_query(
        "SELECT * FROM normalization_coefficients", use_pandas=False)
    assert len(rows) == 2
    assert (1, -1, 1.0, 0.05) in [tuple(r) for r in rows]
    assert (2, -2, 0.9, 0.07) in [tuple(r) for r in rows]

    update_normalization_coefficients([(1, -1, 1.1, 0.15)])
    rows = [tuple(r) for r in execute_sqlite_query(
        "SELECT * FROM normalization_coefficients", use_pandas=False)]
    assert len(rows) == 2
    assert (1, -1, 1.1, 0.15) in rows
    assert (2, -2, 0.9, 0.07) in rows
