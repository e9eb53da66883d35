"""Light-curve post-processing: nightly grouping and flux -> magnitude.

Behavioural parity with the reference
(lightcurver/utilities/lightcurves_postprocessing.py:8-149), whose tests
pin hand-computed values for both functions: 2-sigma-clipped
inverse-variance nightly means, and asymmetric magnitude errors with NaN
on non-positive fluxes.
"""

import warnings
from copy import deepcopy

import numpy as np
import pandas as pd

from .stats import sigmaclip


def _point_source_names(columns, suffix="_flux"):
    # strip the exact suffix rather than split("_")[0] (the reference's
    # defect): a label containing an underscore ("QSO_A") would
    # otherwise map to a nonexistent "QSO_flux" column and crash the
    # pipeline at its very last step.  A candidate is dropped only when
    # it is a DERIVED column of another present source ("a_d" with "a"
    # present) — a plain suffix blacklist would silently drop a genuine
    # source the user named "image_d".  The HTML report reuses this
    # with suffix="_mag".
    names = {c[:-len(suffix)] for c in columns if c.endswith(suffix)}
    derived = {f"{m}_{kind}" for m in names
               for kind in ("d", "scatter", "count")}
    return names - derived


def group_observations(df, threshold=0.8):
    """Group epochs into nights: a gap > ``threshold`` days starts a group.

    Per group and per source: 2-sigma clip the fluxes, then
    inverse-variance weighted mean; uncertainty = sqrt(1 / sum(weights));
    scatter = weighted std.  Other columns are plain-averaged.
    """
    # a NaN MJD cannot be assigned to a night: np.diff(NaN) fails the
    # '> threshold' break test and the epoch's (possibly finite) fluxes
    # would silently merge into the LAST night (the HTML report drops
    # such rows for the same reason)
    df = df[np.isfinite(np.asarray(df["mjd"], dtype=float))]
    df_sorted = df.sort_values(by="mjd").reset_index(drop=True)
    sources = sorted(_point_source_names(df.columns))
    flux_cols = ([f"{ps}_flux" for ps in sources]
                 + [f"{ps}_d_flux" for ps in sources])

    mjd = df_sorted["mjd"].to_numpy()
    # group boundaries where the gap exceeds the threshold
    breaks = np.flatnonzero(np.diff(mjd) > threshold) + 1
    bounds = np.concatenate([[0], breaks, [len(df_sorted)]])

    rows = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        group = df_sorted.iloc[lo:hi]
        row = {
            "mjd": group["mjd"].mean(),
            "scatter_mjd": float(np.nan_to_num(group["mjd"].std())),
        }
        for col in group.columns:
            if col != "mjd" and col not in flux_cols:
                row[col] = group[col].mean()
        for ps in sources:
            fluxes = group[f"{ps}_flux"].to_numpy()
            variances = group[f"{ps}_d_flux"].to_numpy() ** 2
            # one NaN epoch (a degenerate fit is reported as NaN by
            # design) must not NaN the whole night: clip and average
            # over the finite epochs only.  The reference's
            # scipy.stats.sigmaclip propagates the NaN into the clip
            # bounds and loses the night (reference
            # utilities/lightcurves_postprocessing.py:8-57)
            # > 0: a zero-variance epoch (degenerate Fisher error) is
            # excluded like the NaN ones — np.all(kept_var > 0) below
            # would otherwise discard the whole night
            finite = (np.isfinite(fluxes) & np.isfinite(variances)
                      & (variances > 0))
            fluxes, variances = fluxes[finite], variances[finite]
            kept, lo_lim, hi_lim = sigmaclip(fluxes, low=2, high=2)
            keep = (fluxes >= lo_lim) & (fluxes <= hi_lim)
            kept_var = variances[keep]
            if kept_var.size > 0 and np.all(kept_var > 0):
                w = 1.0 / kept_var
                mean = np.average(kept, weights=w)
                scatter = np.sqrt(np.average((kept - mean) ** 2, weights=w))
                err = np.sqrt(1.0 / w.sum())
                count = kept_var.size
            else:
                mean, scatter, err, count = np.nan, np.nan, np.inf, 0
            row[f"{ps}_flux"] = mean
            row[f"{ps}_d_flux"] = err
            row[f"{ps}_scatter_flux"] = scatter
            row[f"{ps}_count_flux"] = count
        rows.append(row)
    return pd.DataFrame(rows)


def convert_flux_to_magnitude(df):
    """Add magnitude columns with asymmetric errors.

    For each source {ps} with columns {ps}_flux and {ps}_d_flux (and
    optionally {ps}_scatter_flux):
        {ps}_mag             = -2.5 log10(flux) + zeropoint
        {ps}_d_mag_down/up   = asymmetric errors from flux +/- d_flux
                               (NaN branch when flux -/+ error <= 0)
        {ps}_d_mag           = linearized 2.5/ln10 * |dF/F|
    """
    df = deepcopy(df)
    if "zeropoint" not in df.columns:
        warnings.warn("Zeropoint column missing. Using a zeropoint of 0.",
                      RuntimeWarning)
        df["zeropoint_used_in_conversion"] = 0.0
        df["zeropoint"] = 0.0
    zp = np.asarray(df["zeropoint"], dtype=float)

    # same derived-column rule as _point_source_names (a substring
    # blacklist would silently drop a source the user named "image_d")
    flux_cols = [f"{ps}_flux"
                 for ps in sorted(_point_source_names(df.columns))]

    with np.errstate(invalid="ignore", divide="ignore"):
        for flux_col in flux_cols:
            ps = flux_col[:-len("_flux")]  # underscore-safe labels
            flux = np.asarray(df[flux_col], dtype=float)
            # the magnitude itself needs no error column — a df missing
            # {ps}_d_flux still gets {ps}_mag (as the docstring promises),
            # so downstream find_sources(suffix='_mag') keeps working
            mag = -2.5 * np.log10(flux) + zp
            df[f"{ps}_mag"] = mag
            for prefix in ("d", "scatter"):
                err_col = f"{ps}_{prefix}_flux"
                if err_col not in df.columns:
                    continue
                err = np.asarray(df[err_col], dtype=float)
                up, down = flux + err, flux - err
                mag_down = np.where(up > 0, -2.5 * np.log10(
                    np.where(up > 0, up, 1.0)) + zp, np.nan)
                mag_up = np.where(down > 0, -2.5 * np.log10(
                    np.where(down > 0, down, 1.0)) + zp, np.nan)
                df[f"{ps}_{prefix}_mag_down"] = mag - mag_down
                df[f"{ps}_{prefix}_mag_up"] = mag_up - mag
                df[f"{ps}_{prefix}_mag"] = 2.5 / np.log(10) * np.abs(
                    err / flux)
    return df
