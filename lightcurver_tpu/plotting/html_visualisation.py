"""Self-contained interactive HTML light-curve report.

Injects the photometry table as JSON into a vanilla-JS/SVG template
(reference plotting/html_visualisation.py:4-23 + its
plot_curves_template.html; this template is our own, dependency-free).
"""

import json
from pathlib import Path

import numpy as np

_TEMPLATE_PATH = Path(__file__).parent / "plot_curves_template.html"


def generate_lightcurve_html(df, out_path):
    """Write an interactive HTML plot of per-source magnitudes vs MJD."""
    # a single non-finite MJD would make the JS extent() NaN and blank
    # the whole SVG (the matplotlib path filters these too)
    df = df[np.isfinite(np.asarray(df["mjd"], dtype=float))]
    # suffix-strip, not split("_")[0]: labels may contain underscores.
    # Set-based: drop a candidate only when it is a derived column of
    # another present source (same rule as
    # utilities/lightcurves_postprocessing._point_source_names)
    names = {c[:-len("_mag")] for c in df.columns if c.endswith("_mag")}
    derived = {f"{m}_{suffix}" for m in names
               for suffix in ("d", "scatter", "count")}
    sources = sorted(names - derived)
    payload = {"mjd": [float(v) for v in df["mjd"]], "sources": {}}
    for ps in sources:
        mags = [None if not np.isfinite(v) else float(v)
                for v in df[f"{ps}_mag"]]
        errs_col = f"{ps}_d_mag"
        errs = ([None if not np.isfinite(v) else float(v)
                 for v in df[errs_col]] if errs_col in df.columns
                else [None] * len(mags))
        payload["sources"][ps] = {"mag": mags, "err": errs}
    html = _TEMPLATE_PATH.read_text()
    html = html.replace("/*__LIGHTCURVE_DATA__*/",
                        f"const DATA = {json.dumps(payload)};")
    Path(out_path).write_text(html)
