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
- the Pan-STARRS detection-cluster + band selection heuristic
  (reference utilities/absolute_magnitudes_from_panstarrs.py:84-149),
  run on masked-Table stand-ins covering every branch

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

# dependency ROOTS the reference imports that are not installed here and
# play no role in the functions under test.  A meta-path finder stubs
# every module under these roots on demand (astropy.nddata, erfa, ... —
# maintaining an explicit submodule list broke every time a new
# reference module was pinned); everything else imports for real, so
# installed packages' optional-dependency probes (scipy's uarray,
# pandas' pytz) behave normally.
STUB_ROOTS = frozenset({
    "astropy", "erfa", "ccdproc", "photutils", "astroquery",
    "astroalign", "astroscrappy", "sep", "shapely", "ephem", "starred",
    "widefield_plate_solver", "ruamel",
})


def install_reference_stubs():
    """Make every module under STUB_ROOTS import as a MagicMock."""
    import importlib.abc
    import importlib.machinery
    from unittest import mock

    class _StubLoader(importlib.abc.Loader):
        def create_module(self, spec):
            m = mock.MagicMock()
            m.__name__ = spec.name
            m.__path__ = []
            m.__spec__ = spec
            return m

        def exec_module(self, module):
            pass

    class _StubFinder(importlib.abc.MetaPathFinder):
        def find_spec(self, name, path=None, target=None):
            if name.split(".")[0] in STUB_ROOTS:
                return importlib.machinery.ModuleSpec(
                    name, _StubLoader(), is_package=True)
            return None

    sys.meta_path.insert(0, _StubFinder())


class _FakeRow:
    """One row of a masked astropy Table: missing cells evaluate falsy.

    astroquery's MAST results are masked Tables; the reference's band
    availability check is plain truthiness of the cell (reference
    utilities/absolute_magnitudes_from_panstarrs.py:117), which works
    because np.ma.masked is falsy.  ``None`` in the scenario rows maps
    to np.ma.masked here (and to NaN in the pandas frames our own
    implementation consumes).
    """

    def __init__(self, row):
        self._row = row

    def __getitem__(self, key):
        value = self._row.get(key)
        return np.ma.masked if value is None else value


class _FakeTable:
    """Minimal astropy-Table stand-in for the selection heuristic:
    column access -> ndarray, boolean-mask indexing, integer row
    access."""

    def __init__(self, rows):
        self._rows = rows

    def __len__(self):
        return len(self._rows)

    def __getitem__(self, key):
        if isinstance(key, str):
            return np.array([r[key] for r in self._rows])
        if isinstance(key, (int, np.integer)):
            return _FakeRow(self._rows[key])
        return _FakeTable([r for r, keep in zip(self._rows, key) if keep])


def _ps_row(obj_id, n_detections, **mags):
    """A PS1 mean-object row; band kwargs g/r/i/z/y + gerr/rerr/...;
    unspecified bands are missing (None)."""
    row = {"objID": obj_id, "nDetections": n_detections}
    for b in "grizy":
        row[f"{b}MeanPSFMag"] = mags.get(b)
        row[f"{b}MeanPSFMagErr"] = mags.get(b + "err")
    return row


def panstarrs_scenarios():
    """Deterministic Pan-STARRS selection scenarios (recorder + test).

    Covers every branch of the reference's
    photometric_selection_heuristic (reference
    utilities/absolute_magnitudes_from_panstarrs.py:84-149): the
    unmerged-detection nDetections filter, the exactly-one-survivor
    requirement, per-band availability, and the c/o composite bands.
    """
    full = dict(g=16.2, gerr=0.011, r=15.8, rerr=0.012, i=15.5,
                ierr=0.021, z=15.4, zerr=0.032, y=15.3, yerr=0.054)
    return [
        {"name": "single_r", "band": "r_panstarrs",
         "rows": [_ps_row(101, 50, **full)]},
        # PS1's unmerged duplicate clusters: nDetections 5 and 2 are
        # below 0.2 * 120 and must be filtered, leaving one survivor
        {"name": "unmerged_filter_g", "band": "g_panstarrs",
         "rows": [_ps_row(201, 120, **full),
                  _ps_row(202, 5, g=17.0, gerr=0.3),
                  _ps_row(203, 2, g=17.5, gerr=0.4)]},
        # two comparable detections survive the filter -> ambiguous
        {"name": "ambiguous_none", "band": "r_panstarrs",
         "rows": [_ps_row(301, 100, **full),
                  _ps_row(302, 80, **full)]},
        {"name": "empty_none", "band": "r_panstarrs", "rows": []},
        {"name": "composite_c", "band": "c_panstarrs",
         "rows": [_ps_row(501, 40, g=16.9, gerr=0.013, r=16.1,
                          rerr=0.017)]},
        {"name": "composite_o", "band": "o_panstarrs",
         "rows": [_ps_row(601, 40, r=16.1, rerr=0.017, i=15.7,
                          ierr=0.019)]},
        # requested band not covered by the detection
        {"name": "missing_band_none", "band": "z_panstarrs",
         "rows": [_ps_row(701, 40, g=16.2, gerr=0.011, r=15.8,
                          rerr=0.012)]},
        # composite needs BOTH constituents
        {"name": "composite_missing_none", "band": "c_panstarrs",
         "rows": [_ps_row(801, 40, g=16.2, gerr=0.011)]},
    ]


def panstarrs_sentinel_scenarios():
    """PS1 sentinel rows where the implementations DELIBERATELY diverge.

    MAST sometimes serves -999.0 as a plain (unmasked) float for
    missing PS1 photometry.  The reference's availability check is cell
    truthiness (reference
    utilities/absolute_magnitudes_from_panstarrs.py:118), so -999.0 is
    "available" and flows into the stored magnitude, while an exact 0.0
    magnitude is "missing".  Our implementation validates the values
    (finite, mag > -100, err > 0) instead.  These scenarios are
    recorded with the reference's OWN code to pin its behavior, and the
    matching test asserts our documented divergence (PARITY.md,
    "Pan-STARRS sentinel handling") — NOT equality.
    """
    return [
        # requested band carried as a -999 sentinel: reference stores
        # mag = mag_err = -999; we reject the band
        {"name": "sentinel_neg999_requested", "band": "r_panstarrs",
         "rows": [_ps_row(901, 60, r=-999.0, rerr=-999.0)]},
        # valid magnitude, sentinel ERROR: the reference checks only the
        # magnitude cell and stores mag_err = -999; we reject
        {"name": "sentinel_neg999_err_only", "band": "r_panstarrs",
         "rows": [_ps_row(902, 60, r=15.8, rerr=-999.0)]},
        # composite c with a sentinel g constituent: the reference
        # blends the sentinel into the combination; we reject
        {"name": "sentinel_composite_c", "band": "c_panstarrs",
         "rows": [_ps_row(903, 60, g=-999.0, gerr=-999.0, r=16.1,
                          rerr=0.017)]},
        # exact 0.0 magnitude with a valid error: falsy for the
        # reference (band "missing"); a valid value for us
        {"name": "sentinel_zero_mag", "band": "r_panstarrs",
         "rows": [_ps_row(904, 60, r=0.0, rerr=0.05)]},
    ]


def user_config_scenarios():
    """Synthetic user-config YAML payloads covering every derivation
    branch of the reference's get_user_config (reference
    structure/user_config.py:11-85): ROI-name/coordinate extraction,
    raw_dirs str-vs-list promotion, derived workdir paths + the mkdir
    side effect, stars_to_* string->character-list expansion, the
    gaia/panstarrs survey selection (incl. the declination refusal and
    the unknown-band refusal), and the constraints/astrometry defaults.
    """
    base = {
        "ROI": {"myquasar": {"coordinates": [141.25, 2.5]}},
        "raw_dirs": "/data/raw",
        "workdir": None,                  # recorder/test substitute tmp
        "stars_to_use_psf": "abcd",
        "stars_to_use_norm": ["a", "c"],
        "stars_to_exclude_psf": "bd",
        "stars_to_exclude_norm": [],
        "photometric_band": "r_sdss",
    }
    return [
        {"name": "gaia_base", "config": dict(base)},
        {"name": "raw_dirs_list",
         "config": {**base, "raw_dirs": ["/data/a", "/data/b"],
                    "photometric_band": "V_T"}},
        {"name": "panstarrs_ok",
         "config": {**base, "photometric_band": "r_panstarrs",
                    "constraints_on_frame_columns_for_roi":
                        {"seeing_arcseconds": [0.0, 1.5]},
                    "fix_point_source_astrometry": True}},
        {"name": "panstarrs_too_south",
         "config": {**base, "photometric_band": "i_panstarrs",
                    "ROI": {"south": {"coordinates": [141.25, -45.0]}}}},
        {"name": "unknown_band",
         "config": {**base, "photometric_band": "u_sdss"}},
    ]


# derived keys both implementations must agree on, recorded verbatim
USER_CONFIG_SHARED_KEYS = (
    "roi_name", "ROI_ra_deg", "ROI_dec_deg", "photometric_band",
    "reference_absolute_photometric_survey", "stars_to_use_psf",
    "stars_to_use_norm", "stars_to_exclude_psf", "stars_to_exclude_norm",
    "fix_point_source_astrometry", "constraints_on_frame_columns_for_roi",
    "constraints_on_normalization_coeff",
)
# derived Path keys, recorded relative to the workdir
USER_CONFIG_PATH_KEYS = (
    "database_path", "plots_dir", "logs_dir", "frames_dir",
    "regions_path", "psfs_path",
)


def run_user_config(get_user_config_fn, scenario, workdir):
    """Run a get_user_config implementation on one scenario and return
    a JSON-comparable dict (shared by the recorder and the test)."""
    import os
    import tempfile

    import yaml

    payload = dict(scenario["config"])
    payload["workdir"] = str(workdir)
    fd, cfg_path = tempfile.mkstemp(suffix=".yaml")
    try:
        with os.fdopen(fd, "w") as f:
            yaml.safe_dump(payload, f)
        old = os.environ.get("LIGHTCURVER_CONFIG")
        os.environ["LIGHTCURVER_CONFIG"] = cfg_path
        try:
            config = get_user_config_fn()
        except RuntimeError as e:
            return {"error": f"RuntimeError: {e}"}
        finally:
            if old is None:
                os.environ.pop("LIGHTCURVER_CONFIG", None)
            else:
                os.environ["LIGHTCURVER_CONFIG"] = old
    finally:
        os.unlink(cfg_path)

    out = {k: config[k] for k in USER_CONFIG_SHARED_KEYS}
    wd = pathlib.Path(workdir)
    for k in USER_CONFIG_PATH_KEYS:
        out[k] = str(pathlib.Path(config[k]).relative_to(wd))
    out["raw_dirs"] = [str(p) for p in config["raw_dirs"]]
    # the mkdir side effect: directories created under the workdir
    out["dirs_created"] = sorted(p.name for p in wd.iterdir()
                                 if p.is_dir())
    return out


def gaia_query_scenarios():
    """Gaia/Vizier star-query construction scenarios (recorder + test).

    The ADQL text built by the reference's find_gaia_stars_in_circle /
    _in_polygon (reference utilities/gaia.py:28-217) IS the calibration
    -star selection contract: table names (gaiadr3.gaia_source vs the
    Vizier I/355 mirror with its renamed columns), quality-cut WHERE
    fragments and their order, and the CONTAINS geometry.  Queries are
    compared whitespace-normalized (' '.join(q.split())) — the two
    implementations format the surrounding SELECT differently but must
    agree on every token.
    """
    circle = {"center": (141.25, 2.5), "radius": 0.1}
    poly = [(10.0, -1.0), (10.2, -1.0), (10.2, -0.8), (10.0, -0.8)]
    return [
        {"name": "circle_gaia_all", "region": "circle", "args": (circle,),
         "kwargs": {"gaia_provider": "gaia",
                    "astrometric_excess_noise_max": 2.0,
                    "gmag_range": (16.0, 20.0),
                    "min_phot_g_mean_flux_over_error": 100.0}},
        {"name": "circle_vizier_all", "region": "circle",
         "args": (circle,),
         "kwargs": {"gaia_provider": "vizier",
                    "astrometric_excess_noise_max": 2.0,
                    "gmag_range": (16.0, 20.0),
                    "min_phot_g_mean_flux_over_error": 100.0}},
        {"name": "circle_gaia_nofilter", "region": "circle",
         "args": (circle,), "kwargs": {"gaia_provider": "gaia"}},
        {"name": "polygon_gaia_gmag", "region": "polygon",
         "args": (poly,),
         "kwargs": {"gaia_provider": "gaia",
                    "gmag_range": (15.0, 21.0)}},
        {"name": "polygon_vizier_aen_floe", "region": "polygon",
         "args": (poly,),
         "kwargs": {"gaia_provider": "vizier",
                    "astrometric_excess_noise_max": 3.5,
                    "min_phot_g_mean_flux_over_error": 50.0}},
    ]


def capture_gaia_queries(gaia_module):
    """Run the query builders with run_query intercepted; return
    {scenario: normalized ADQL} (shared by the recorder and the test)."""
    captured = {}
    original = gaia_module.run_query

    def spy(gaia_provider, adql_query):
        captured["q"] = " ".join(adql_query.split())
        return None

    gaia_module.run_query = spy
    try:
        out = {}
        for sc in gaia_query_scenarios():
            fn = (gaia_module.find_gaia_stars_in_circle
                  if sc["region"] == "circle"
                  else gaia_module.find_gaia_stars_in_polygon)
            fn(*sc["args"], **sc["kwargs"])
            out[sc["name"]] = captured.pop("q")
        return out
    finally:
        gaia_module.run_query = original


def workflow_graph_scenarios():
    """Task-graph orderings for the workflow manager (recorder + test).

    'out_of_order' declares dependents BEFORE their dependencies: the
    reference's build_dependency_graph (reference
    pipeline/workflow_manager.py:129-137) OVERWRITES a pre-created
    dependency node's 'next' edges when the dependency's own task row
    arrives later, so its "topological sort" emits 'e' before 'c'/'d'
    — not a topological order at all.  Recorded to pin the divergence:
    ours preserves the edges and emits a valid order (asserted in the
    test).  The shipped 12-task YAML declares tasks in dependency
    order, where both implementations agree exactly.
    """
    return {
        "out_of_order": [
            {"name": "e", "dependencies": ["c", "d"]},
            {"name": "c", "dependencies": ["a"]},
            {"name": "b", "dependencies": []},
            {"name": "d", "dependencies": ["a", "b"]},
            {"name": "a", "dependencies": []},
            {"name": "f", "dependencies": ["b"]},
        ],
        "cycle": [
            {"name": "x", "dependencies": ["y"]},
            {"name": "y", "dependencies": ["x"]},
        ],
    }


def run_topo(workflow_manager_class, tasks):
    """Build + topologically sort a task list on an uninitialized
    WorkflowManager (no config/DB side effects); returns the order or
    {'error': message}."""
    wm = workflow_manager_class.__new__(workflow_manager_class)
    wm.pipe_config = {"tasks": tasks}
    wm.task_graph = {}
    wm.build_dependency_graph()
    try:
        return wm.topological_sort()
    except Exception as e:
        return {"error": str(e)}


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
    sys.path.insert(0, str(reference_dir))
    install_reference_stubs()

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

    # Pan-STARRS selection heuristic, run by the REFERENCE's own code
    # on masked-Table stand-ins (astroquery/astropy stubbed)
    import lightcurver.utilities.absolute_magnitudes_from_panstarrs \
        as refps

    ps_out = {}
    for sc in panstarrs_scenarios():
        refps.get_user_config = (
            lambda band=sc["band"]: {"photometric_band": band})
        got = refps.photometric_selection_heuristic(_FakeTable(sc["rows"]))
        ps_out[sc["name"]] = None if got is None else {
            "band": got["band"], "mag": float(got["mag"]),
            "mag_err": float(got["mag_err"]),
            "catalog_ID": int(got["catalog_ID"])}
    out["panstarrs_selection"] = ps_out

    sent_out = {}
    for sc in panstarrs_sentinel_scenarios():
        refps.get_user_config = (
            lambda band=sc["band"]: {"photometric_band": band})
        got = refps.photometric_selection_heuristic(_FakeTable(sc["rows"]))
        sent_out[sc["name"]] = None if got is None else {
            "band": got["band"], "mag": float(got["mag"]),
            "mag_err": float(got["mag_err"]),
            "catalog_ID": int(got["catalog_ID"])}
    out["panstarrs_selection_sentinel"] = sent_out

    # user-config derivation semantics, run by the REFERENCE's own code
    # (pyyaml is real; astropy's SkyCoord is stubbed and excluded from
    # the recorded keys)
    import tempfile

    from lightcurver.structure.user_config import get_user_config

    uc_out = {}
    for sc in user_config_scenarios():
        with tempfile.TemporaryDirectory() as wd:
            uc_out[sc["name"]] = run_user_config(get_user_config, sc, wd)
    out["user_config"] = uc_out

    # Gaia/Vizier ADQL construction, run by the REFERENCE's own code
    # with run_query intercepted (no network)
    import lightcurver.utilities.gaia as refgaia

    out["gaia_queries"] = capture_gaia_queries(refgaia)

    # workflow-manager task ordering, run by the REFERENCE's own code:
    # the shipped 12-task DAG plus the out-of-order/cycle edge cases
    import yaml as _yaml

    from lightcurver.pipeline.workflow_manager import WorkflowManager

    graph_path = (pathlib.Path(reference_dir) / "lightcurver" / "pipeline"
                  / "pipeline_dependency_graph.yaml")
    shipped = _yaml.safe_load(graph_path.read_text())
    wf_out = {"shipped_order": run_topo(WorkflowManager, shipped["tasks"]),
              "shipped_tasks": [
                  {"name": t["name"],
                   "dependencies": sorted(t["dependencies"])}
                  for t in shipped["tasks"]]}
    for name, tasks in workflow_graph_scenarios().items():
        wf_out[name] = run_topo(WorkflowManager, tasks)
    out["workflow_ordering"] = wf_out

    FIXTURE.parent.mkdir(parents=True, exist_ok=True)
    FIXTURE.write_text(json.dumps(out, indent=1))
    print(f"wrote {FIXTURE}")


if __name__ == "__main__":
    main(*sys.argv[1:])
