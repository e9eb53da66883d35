"""Source extraction: thresholding + connected components (sep.extract
replacement, numpy/scipy).

Produces the observable columns the pipeline consumes downstream
(reference lightcurver/processes/star_extraction.py:8-55): x/y centroids,
flux, second-moment semi-axes a/b, elongation filtering, the FWHM
estimate 2*sqrt(ln2*(a^2+b^2)), ellipticity, flux-descending order.
Tables are pandas DataFrames (astropy unavailable), persisted as CSV.
"""

import numpy as np
import pandas as pd
from scipy import ndimage


def _segment(image, variance_map, threshold, min_area):
    """Label pixels above threshold*sigma; returns (labels_kept, seg_map).

    seg_map uses 0 for background, like sep's segmentation map.
    """
    sigma = np.sqrt(np.maximum(variance_map, 0.0))
    detect = image > threshold * sigma
    # 8-connectivity, matching the C++ extractor and sep: the default
    # 4-connected labeling splits diagonal-touching components and the
    # two backends would produce different catalogs
    seg, n_raw = ndimage.label(detect, structure=np.ones((3, 3)))
    if n_raw == 0:
        return [], seg
    counts = ndimage.sum_labels(np.ones_like(seg), seg,
                                index=np.arange(1, n_raw + 1))
    kept = [lab for lab, c in zip(range(1, n_raw + 1), counts)
            if c >= min_area]
    return kept, seg


def _moments(image, seg, labels):
    """Per-object flux, flux-weighted centroid and second-moment axes."""
    rows = []
    yy, xx = np.mgrid[0:image.shape[0], 0:image.shape[1]]
    for lab in labels:
        sel = seg == lab
        w = np.where(sel, np.maximum(image, 0.0), 0.0)
        flux = w.sum()
        if flux <= 0:
            continue
        x = (w * xx).sum() / flux
        y = (w * yy).sum() / flux
        x2 = (w * (xx - x) ** 2).sum() / flux
        y2 = (w * (yy - y) ** 2).sum() / flux
        xy = (w * (xx - x) * (yy - y)).sum() / flux
        # principal axes of the 2nd-moment tensor (sep's a/b convention)
        t = 0.5 * (x2 + y2)
        d = np.sqrt(max(0.25 * (x2 - y2) ** 2 + xy**2, 0.0))
        a = np.sqrt(max(t + d, 1e-12))
        b = np.sqrt(max(t - d, 1e-12))
        rows.append({
            "x": x, "y": y, "flux": float(image[sel].sum()),
            "a": a, "b": b, "npix": int(sel.sum()),
            "peak": float(image[sel].max()),
        })
    return rows


def postprocess_detections(sources):
    """Star-likeness filter + derived columns + flux-descending order.

    The observable semantics of the reference's post-sep block
    (reference star_extraction.py:28-49): centroid aliases, the
    ``elongation < median + 3*std`` point-source filter, the
    ``FWHM = 2*sqrt(ln2*(a^2 + b^2))`` estimate, ellipticity, and
    brightest-first ordering — pinned against the reference's own code
    in tests/test_reference_db_golden.py.
    """
    sources = sources.copy()
    sources["xcentroid"] = sources["x"]
    sources["ycentroid"] = sources["y"]
    elongation = sources["a"] / sources["b"]
    sources["elongation"] = elongation
    if len(sources):
        # drop weirdly elongated detections (not star-like).  <= and not
        # the reference's strict < (reference star_extraction.py:37-41):
        # with a single detection (or all-equal elongations) std is 0
        # and the strict comparison discards EVERY source
        sources = sources[
            elongation <= elongation.median() + 3 * elongation.std(ddof=0)]
    sources["FWHM"] = 2.0 * np.sqrt(
        np.log(2.0) * (sources["a"] ** 2 + sources["b"] ** 2))
    sources["ellipticity"] = 1.0 - sources["b"] / sources["a"]
    return sources.sort_values(
        "flux", ascending=False).reset_index(drop=True)


def extract_stars(image_background_subtracted, variance_map,
                  detection_threshold=3, min_area=10, debug_plot_path=None):
    """Detect point-ish sources; returns a DataFrame, brightest first.

    Uses the C++ flood-fill extractor (native/) when available — the
    reference's equivalent stage ran on the C library sep — with the
    numpy/scipy implementation as fallback.
    """
    image = np.asarray(image_background_subtracted, dtype=np.float32)
    from ..native import extract_sources as native_extract

    rows = native_extract(image, variance_map, detection_threshold,
                          min_area)
    if rows is not None:
        sources = pd.DataFrame(
            rows[:, :7],
            columns=["x", "y", "flux", "a", "b", "npix", "peak"])
    else:
        labels, seg = _segment(image, variance_map, detection_threshold,
                               min_area)
        sources = pd.DataFrame(
            _moments(image, seg, labels),
            columns=["x", "y", "flux", "a", "b", "npix", "peak"])

    sources = postprocess_detections(sources)

    if debug_plot_path is not None:
        from ..plotting.sources_plotting import plot_sources

        debug_plot_path.parent.mkdir(exist_ok=True, parents=True)
        plot_sources(sources=sources, image=image,
                     save_path=debug_plot_path)
    return sources


def write_sources(sources, path):
    """Persist a sources table (CSV; the reference used FITS tables)."""
    sources.to_csv(path, index=False)


def read_sources(path):
    return pd.read_csv(path)


def extract_sources_from_sky_sub_image(image_path, sources_path,
                                       detection_threshold, min_area,
                                       exptime,
                                       background_rms_electron_per_second,
                                       debug_plot_path):
    """Re-extraction utility on an already sky-subtracted stored frame.

    Works in ELECTRONS (exptime * stored e-/s frame) like the reference
    (reference processes/star_extraction.py:76-77), while the import
    path extracts on the e-/s frame directly — so re-extracted fluxes
    differ from import-time ones by the frame's exptime.  Kept as
    reference parity: the sources flux is only ever used for ordering
    (brightest-first) and the detection SNR is scale-invariant.
    """
    from ..io.fits import read_fits

    data, _ = read_fits(image_path)
    image_electrons = exptime * np.asarray(data, dtype=float)
    rms_e = exptime * background_rms_electron_per_second
    variance_map = rms_e**2 + np.abs(image_electrons)
    sources = extract_stars(image_electrons, variance_map,
                            detection_threshold=detection_threshold,
                            min_area=min_area,
                            debug_plot_path=debug_plot_path)
    write_sources(sources, sources_path)
