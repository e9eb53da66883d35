"""Publication-style multi-season light-curve plot (user-facing, not
called by the pipeline; reference plotting/photometry_plotting.py:12-292)."""

import numpy as np
import matplotlib.pyplot as plt


def find_sources(df):
    """Source labels present in a photometry DataFrame."""
    return sorted({c.split("_")[0] for c in df.columns
                   if c.endswith("_mag") and c.count("_") == 1})


def compute_offsets(df, sources, spacing=0.3):
    """Vertical offsets separating the curves by ~spacing magnitudes."""
    offsets = {}
    level = 0.0
    for i, ps in enumerate(sources):
        mags = np.asarray(df[f"{ps}_mag"], dtype=float)
        med = np.nanmedian(mags)
        offsets[ps] = level - med if np.isfinite(med) else 0.0
        level += spacing
    return offsets


def plot_photometry(df, sources=None, offsets=None, season_gap_days=60,
                    save_path=None):
    """Light curves with automatic offsets and season-split panels."""
    if sources is None:
        sources = find_sources(df)
    if offsets is None:
        offsets = compute_offsets(df, sources)
    mjd = np.asarray(df["mjd"], dtype=float)
    order = np.argsort(mjd)
    mjd = mjd[order]
    breaks = np.flatnonzero(np.diff(mjd) > season_gap_days) + 1
    bounds = np.concatenate([[0], breaks, [len(mjd)]])
    n_seasons = len(bounds) - 1

    fig, axes = plt.subplots(1, n_seasons,
                             figsize=(4 + 2.5 * n_seasons, 5),
                             sharey=True, squeeze=False)
    axes = axes[0]
    for season, (lo, hi) in enumerate(zip(bounds[:-1], bounds[1:])):
        ax = axes[season]
        for ps in sources:
            mags = np.asarray(df[f"{ps}_mag"], dtype=float)[order][lo:hi]
            err_col = f"{ps}_d_mag"
            errs = (np.asarray(df[err_col], dtype=float)[order][lo:hi]
                    if err_col in df.columns else None)
            ax.errorbar(mjd[lo:hi], mags + offsets[ps], yerr=errs,
                        fmt=".", markersize=4, elinewidth=0.5,
                        label=ps if season == 0 else None)
        ax.set_xlabel("MJD")
    axes[0].invert_yaxis()
    axes[0].set_ylabel("magnitude (+ offsets)")
    axes[0].legend()
    plt.tight_layout()
    if save_path is not None:
        plt.savefig(save_path, dpi=130)
        plt.close()
    return fig
