"""Record golden fixtures computed by the ACTUAL reference implementation.

The reference's STARRED numerical core cannot be installed in this
environment (no network), so the core parity fixtures are self-golden
(see record_self_golden.py / record_reference_golden.py).  Its pure
Python/numpy/scipy utilities, however, import fine straight from the
reference checkout — this script runs THEM on deterministic synthetic
inputs and commits their outputs, giving true reference-computed parity
pins for:

- nightly grouping (reference utilities/lightcurves_postprocessing.py:8)
- flux -> magnitude with asymmetric errors, incl. the negative-flux NaN
  branches (reference utilities/lightcurves_postprocessing.py:60)
- the normalization scatter cost + SLSQP alignment + inverse-variance
  combination (reference processes/normalization_calculation.py:70-215)
- the COSMOULINE histogram-peak seeing estimator (reference
  processes/frame_characterization.py:135)
- star naming and [-1, 1] image-coordinate rescaling

Usage:  python tools/record_reference_utilities_golden.py [reference_dir]
Writes: tests/fixtures/reference_utilities_golden.json

The matching test (tests/test_reference_golden.py) reruns OUR
implementations on the same inputs (built by make_inputs below, which
is deterministic and dependency-light) and asserts agreement with the
committed fixture; it does NOT need the reference checkout.
"""

import json
import pathlib
import sys

import numpy as np
import pandas as pd

FIXTURE = (pathlib.Path(__file__).resolve().parents[1] / "tests"
           / "fixtures" / "reference_utilities_golden.json")

# modules the reference imports at module scope that are not installed
# here and play no role in the functions under test
_STUBS = [
    "astropy", "astropy.coordinates", "astropy.units", "astropy.stats",
    "astropy.time", "astropy.io", "astropy.io.fits", "astropy.wcs",
    "astropy.table", "astropy.visualization", "shapely",
    "shapely.geometry", "shapely.ops", "ephem", "ruamel", "ruamel.yaml",
    "astroquery", "astroquery.gaia", "widefield_plate_solver",
]


def make_inputs():
    """Deterministic synthetic inputs shared by recorder and test."""
    rng = np.random.default_rng(42)

    # -- photometry table: 12 epochs over 5 nights, 2 sources ------------
    mjd = np.array([60000.00, 60000.02, 60000.05,
                    60001.10, 60001.13,
                    60002.20, 60002.22, 60002.25,
                    60003.30, 60003.31,
                    60004.40, 60004.45])
    a_flux = 1000.0 + 30.0 * rng.standard_normal(mjd.size)
    a_flux[4] = 1450.0                    # outlier for the sigma clip
    b_flux = 12.0 + 2.0 * rng.standard_normal(mjd.size)
    b_flux[7] = 1.5                       # flux - d_flux < 0: NaN branch
    phot_df = pd.DataFrame({
        "mjd": mjd,
        "A_flux": a_flux,
        "A_d_flux": np.full(mjd.size, 25.0),
        "B_flux": b_flux,
        "B_d_flux": np.full(mjd.size, 2.5),
        "zeropoint": np.full(mjd.size, 27.3),
        "seeing": 1.0 + 0.1 * rng.standard_normal(mjd.size),
    })

    # -- normalization: 6 stars x 15 frames with NaN holes ---------------
    n_stars, n_frames = 6, 15
    true_frame_scale = 1.0 + 0.15 * rng.standard_normal(n_frames)
    star_brightness = 10 ** rng.uniform(2.5, 4.0, n_stars)
    rows = []
    for si in range(n_stars):
        for fi in range(n_frames):
            if (si * n_frames + fi) % 13 == 0:
                continue                  # missing measurement
            flux = (star_brightness[si] * true_frame_scale[fi]
                    * (1 + 0.01 * rng.standard_normal()))
            rows.append({"star_gaia_id": 1000 + si, "frame_id": fi,
                         "flux": flux,
                         "d_flux": 0.01 * star_brightness[si]})
    norm_df = pd.DataFrame(rows)

    # -- seeing: three regimes -------------------------------------------
    fwhm_many = np.concatenate([
        3.2 + 0.25 * rng.standard_normal(40),     # stellar peak
        rng.uniform(5.0, 25.0, 15),               # galaxies/junk
        np.full(3, 1.1),                          # cosmics
    ])
    fwhm_few = np.array([2.8, 3.0, 3.4, 2.9, 3.1])
    fwhm_none = np.array([])

    # -- image coordinates ------------------------------------------------
    xy = np.array([[0.0, 0.0], [99.0, 79.0], [49.5, 39.5],
                   [10.0, 60.0], [80.0, 5.0]])
    image_shape = (80, 100)               # (ny, nx)

    return {"phot_df": phot_df, "norm_df": norm_df,
            "fwhm_many": fwhm_many, "fwhm_few": fwhm_few,
            "fwhm_none": fwhm_none, "xy": xy,
            "image_shape": image_shape, "n_names": 30}


def normalization_pipeline(norm_df, cost_fn, weighted_std_fn,
                           minimize_fn):
    """The reference's coefficient computation on an in-memory table.

    Mirrors the documented recipe of reference
    processes/normalization_calculation.py:160-215 — per-star median
    normalization, star x frame pivot, SLSQP scatter minimization with
    a mean-1 constraint, then inverse-variance frame coefficients with
    weighted-std uncertainties — parameterized on the scoring functions
    so the recorder can inject the REFERENCE implementations and the
    test OUR implementations.
    """
    df = norm_df.copy()
    med = df.groupby("star_gaia_id")["flux"].median().rename("median_flux")
    df = df.merge(med, on="star_gaia_id")
    df["normalized_flux"] = df["flux"] / df["median_flux"]
    df["normalized_d_flux"] = df["d_flux"] / df["median_flux"]
    flux_piv = df.pivot(index="star_gaia_id", columns="frame_id",
                        values="normalized_flux")
    d_piv = df.pivot(index="star_gaia_id", columns="frame_id",
                     values="normalized_d_flux")
    constraint = ({"type": "eq",
                   "fun": lambda c: 1 - np.nanmean(c)})
    res = minimize_fn(cost_fn, np.ones(flux_piv.shape[0]),
                      args=(flux_piv, d_piv), constraints=constraint,
                      method="SLSQP")
    scaled = flux_piv.mul(res.x, axis=0)
    scaled_d = d_piv.mul(res.x, axis=0)
    weights = 1.0 / scaled_d**2
    err = scaled.columns.map(
        lambda fid: weighted_std_fn(scaled[fid], weights[fid]))
    coeff = (scaled * weights).sum(axis=0) / weights.sum(axis=0)
    err = pd.Series(err, index=scaled.columns)
    err.loc[err == 0.0] = 0.1 * coeff.loc[err == 0.0]
    return (res.x.tolist(), coeff.to_numpy().tolist(),
            err.to_numpy().tolist())


def _df_to_json(df):
    return {c: [None if pd.isna(v) else float(v) for v in df[c]]
            for c in df.columns}


def main(reference_dir="/root/reference"):
    from unittest import mock

    sys.path.insert(0, str(reference_dir))
    for name in _STUBS:
        sys.modules.setdefault(name, mock.MagicMock())

    from scipy.optimize import minimize
    from lightcurver.utilities.lightcurves_postprocessing import (
        convert_flux_to_magnitude, group_observations)
    from lightcurver.utilities.star_naming import generate_star_names
    from lightcurver.utilities.image_coordinates import (
        rescale_image_coordinates)
    from lightcurver.processes.frame_characterization import (
        estimate_seeing)
    from lightcurver.processes.normalization_calculation import (
        cost_function_scatter_in_frame, weighted_std)

    inp = make_inputs()
    out = {}

    grouped = group_observations(inp["phot_df"])
    out["grouped"] = _df_to_json(grouped)
    mags = convert_flux_to_magnitude(inp["phot_df"])
    out["magnitudes"] = _df_to_json(mags)

    scales, coeff, err = normalization_pipeline(
        inp["norm_df"], cost_function_scatter_in_frame, weighted_std,
        minimize)
    out["norm_star_scales"] = scales
    out["norm_coefficients"] = coeff
    out["norm_errors"] = err

    out["seeing_many"] = float(estimate_seeing(
        {"FWHM": inp["fwhm_many"]}))
    out["seeing_few"] = float(estimate_seeing({"FWHM": inp["fwhm_few"]}))
    out["seeing_none"] = float(estimate_seeing(
        {"FWHM": inp["fwhm_none"]}))

    out["star_names"] = generate_star_names(inp["n_names"])
    out["rescaled_xy"] = rescale_image_coordinates(
        inp["xy"].copy(), inp["image_shape"]).tolist()

    FIXTURE.parent.mkdir(parents=True, exist_ok=True)
    FIXTURE.write_text(json.dumps(out, indent=1))
    print(f"wrote {FIXTURE}")


if __name__ == "__main__":
    main(*sys.argv[1:])
