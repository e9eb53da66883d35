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
