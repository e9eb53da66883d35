"""Small statistics helpers (astropy.stats subset, numpy implementation)."""

import numpy as np


def sigma_clipped_stats(data, sigma=3.0, maxiters=5):
    """(mean, median, std) of iteratively sigma-clipped data.

    Clips about the median with the sample std, like astropy's defaults
    (the reference calls astropy.stats.sigma_clipped_stats at
    utilities/chi2_selector.py:35 and utilities/footprint.py:171).
    """
    arr = np.asarray(data, dtype=float)
    arr = arr[np.isfinite(arr)]
    if arr.size == 0:
        return np.nan, np.nan, np.nan
    mask = np.ones(arr.shape, dtype=bool)
    for _ in range(maxiters):
        selected = arr[mask]
        med = np.median(selected)
        std = np.std(selected)
        # astropy semantics: clip from the SURVIVORS (clipped points
        # never re-enter), and converge on mask identity, not count —
        # equal counts with different members is not convergence
        new_mask = mask & (np.abs(arr - med) <= sigma * std)
        if new_mask.sum() == 0:
            break
        if np.array_equal(new_mask, mask):
            break
        mask = new_mask
    selected = arr[mask]
    return float(np.mean(selected)), float(np.median(selected)), \
        float(np.std(selected))


def sigmaclip(data, low=4.0, high=4.0):
    """scipy.stats.sigmaclip-compatible: iterative clip about the MEAN.

    Returns (clipped_array, lower_bound, upper_bound).
    """
    arr = np.asarray(data, dtype=float).ravel()
    prev = -1
    lo = hi = np.nan
    # size-0 input (e.g. an all-NaN night after the caller's finite
    # filter) would spam 'Mean of empty slice' RuntimeWarnings below
    while arr.size != prev and arr.size > 0:
        prev = arr.size
        mean, std = arr.mean(), arr.std()
        lo, hi = mean - low * std, mean + high * std
        arr = arr[(arr >= lo) & (arr <= hi)]
    return arr, lo, hi
