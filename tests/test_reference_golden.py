"""Golden-value parity on committed fixtures.

Two layers (same inputs: tests/fixtures/golden_inputs.npz):

1. self_golden.json — recorded by THIS implementation
   (tools/record_self_golden.py) and committed: catches numerical drift
   of the core (kernels, optimizers, backends) release over release.
2. reference_golden.json — recorded by the REFERENCE+STARRED stack
   (tools/record_reference_golden.py, needs an environment with
   starred-astro installed; not buildable in this hermetic CI, so the
   test SKIPS when the file is absent).  When present, asserts sub-mmag
   flux agreement and matching chi2, the reference's own parity bar
   (reference tests/test_starred_calls/test_starred_calls.py:58-81).
"""

import json
import pathlib

import numpy as np
import pytest

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="module")
def our_outputs():
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parents[1] / "tools"))
    from record_self_golden import compute_outputs

    return compute_outputs()


def test_matches_committed_self_golden(our_outputs):
    """Regression pin: the core reproduces its own recorded outputs."""
    golden = json.loads((FIXTURES / "self_golden.json").read_text())
    assert our_outputs["psf_chi2"] == pytest.approx(
        golden["psf_chi2"], rel=1e-3)
    for key in ("psf_fwhm_x", "psf_fwhm_y"):
        assert our_outputs[key] == pytest.approx(golden[key], rel=1e-3)
    np.testing.assert_allclose(our_outputs["phot_fluxes"],
                               golden["phot_fluxes"], rtol=1e-4)
    np.testing.assert_allclose(our_outputs["phot_chi2_per_frame"],
                               golden["phot_chi2_per_frame"], rtol=1e-3)


def test_matches_reference_golden(our_outputs):
    """Sub-mmag parity vs the recorded reference (STARRED) outputs."""
    path = FIXTURES / "reference_golden.json"
    if not path.exists():
        pytest.skip(
            "REFERENCE PARITY UNVERIFIED: reference_golden.json not "
            "recorded — starred-astro is not installable in this "
            "environment (no wheel, no network).  The sub-mmag parity "
            "claim rests on the float64 self-oracle and the committed "
            "self-golden until tools/record_reference_golden.py (or "
            "the record_reference_golden.yml workflow) runs where "
            "starred installs")
    golden = json.loads(path.read_text())

    # PSF quality: same chi2 regime and same Moffat solution
    assert our_outputs["psf_chi2"] == pytest.approx(
        golden["psf_chi2"], rel=0.05)
    for key in ("psf_fwhm_x", "psf_fwhm_y"):
        assert our_outputs[key] == pytest.approx(golden[key], rel=0.02)

    # fluxes: sub-mmag (1 mmag ~ 0.092% in flux)
    ours = np.asarray(our_outputs["phot_fluxes"])
    ref = np.asarray(golden["phot_fluxes"])
    dmag = 2.5 * np.abs(np.log10(ours / ref))
    assert float(dmag.max()) < 1e-3, f"flux disagreement {dmag} mag"
    np.testing.assert_allclose(our_outputs["phot_chi2_per_frame"],
                               golden["phot_chi2_per_frame"], rtol=0.05)


def _cols_close(ours, golden, rtol=1e-9, atol=1e-12):
    """Compare dataframe-as-dict fixtures column by column (NaN == NaN)."""
    for col, want in golden.items():
        assert col in ours.columns, f"missing column {col}"
        got = np.asarray(ours[col], dtype=float)
        want = np.asarray([np.nan if v is None else v for v in want],
                          dtype=float)
        np.testing.assert_allclose(got, want, rtol=rtol, atol=atol,
                                   equal_nan=True, err_msg=col)


@pytest.fixture(scope="module")
def utilities_golden():
    path = FIXTURES / "reference_utilities_golden.json"
    return json.loads(path.read_text())


@pytest.fixture(scope="module")
def utilities_inputs():
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parents[1] / "tools"))
    from record_reference_utilities_golden import make_inputs

    return make_inputs()


def test_grouping_matches_reference(utilities_golden, utilities_inputs):
    """Nightly grouping == the ACTUAL reference implementation's output.

    Fixture recorded by tools/record_reference_utilities_golden.py
    running the reference's group_observations (reference
    utilities/lightcurves_postprocessing.py:8) on the same inputs.
    """
    from lightcurver_tpu.utilities.lightcurves_postprocessing import (
        group_observations)

    grouped = group_observations(utilities_inputs["phot_df"])
    _cols_close(grouped, utilities_golden["grouped"], rtol=1e-9)


def test_magnitudes_match_reference(utilities_golden, utilities_inputs):
    """Flux->mag incl. asymmetric-error NaN branches == the reference."""
    from lightcurver_tpu.utilities.lightcurves_postprocessing import (
        convert_flux_to_magnitude)

    mags = convert_flux_to_magnitude(utilities_inputs["phot_df"])
    _cols_close(mags, utilities_golden["magnitudes"], rtol=1e-9)


def test_normalization_matches_reference(utilities_golden,
                                         utilities_inputs):
    """The SLSQP normalization recipe scored by OUR cost/std == reference.

    Same pipeline (median-normalize, pivot, SLSQP with mean-1
    constraint, inverse-variance combine) with our
    cost_function_scatter_in_frame / weighted_std — the coefficients
    must match the reference-scored run to optimizer tolerance.
    """
    import sys

    from scipy.optimize import minimize

    sys.path.insert(0, str(pathlib.Path(__file__).parents[1] / "tools"))
    from record_reference_utilities_golden import normalization_pipeline

    from lightcurver_tpu.processes.normalization_calculation import (
        cost_function_scatter_in_frame, weighted_std)

    scales, coeff, err = normalization_pipeline(
        utilities_inputs["norm_df"], cost_function_scatter_in_frame,
        weighted_std, minimize)
    np.testing.assert_allclose(scales,
                               utilities_golden["norm_star_scales"],
                               rtol=1e-6)
    np.testing.assert_allclose(coeff,
                               utilities_golden["norm_coefficients"],
                               rtol=1e-6)
    np.testing.assert_allclose(err, utilities_golden["norm_errors"],
                               rtol=1e-5)


def test_seeing_matches_reference(utilities_golden, utilities_inputs):
    """COSMOULINE histogram-peak seeing == the reference, all regimes."""
    from lightcurver_tpu.processes.frame_characterization import (
        estimate_seeing)

    for key, arr in (("seeing_many", "fwhm_many"),
                     ("seeing_few", "fwhm_few"),
                     ("seeing_none", "fwhm_none")):
        got = estimate_seeing({"FWHM": utilities_inputs[arr]})
        assert got == pytest.approx(utilities_golden[key], rel=1e-9), key


def test_naming_and_coordinates_match_reference(utilities_golden,
                                                utilities_inputs):
    from lightcurver_tpu.utilities.image_coordinates import (
        rescale_image_coordinates)
    from lightcurver_tpu.utilities.star_naming import generate_star_names

    assert generate_star_names(utilities_inputs["n_names"]) \
        == utilities_golden["star_names"]
    got = rescale_image_coordinates(utilities_inputs["xy"].copy(),
                                    utilities_inputs["image_shape"])
    np.testing.assert_allclose(got, utilities_golden["rescaled_xy"],
                               rtol=1e-12)


def test_panstarrs_selection_matches_reference(utilities_golden,
                                               monkeypatch):
    """PS1 detection-cluster + band selection == the ACTUAL reference.

    Fixture recorded by tools/record_reference_utilities_golden.py
    running the reference's photometric_selection_heuristic (reference
    utilities/absolute_magnitudes_from_panstarrs.py:84-149) on
    masked-Table stand-ins; our implementation consumes the same
    scenarios as pandas frames (missing cells NaN instead of masked)
    and must land the identical keep/reject decisions, magnitudes and
    composite-band combinations.
    """
    import sys

    import pandas as pd

    sys.path.insert(0, str(pathlib.Path(__file__).parents[1] / "tools"))
    from record_reference_utilities_golden import panstarrs_scenarios

    import lightcurver_tpu.utilities.absolute_magnitudes_from_panstarrs \
        as ps

    golden = utilities_golden["panstarrs_selection"]
    for sc in panstarrs_scenarios():
        monkeypatch.setattr(
            ps, "get_user_config",
            lambda band=sc["band"]: {"photometric_band": band})
        got = ps.photometric_selection_heuristic(pd.DataFrame(sc["rows"]))
        want = golden[sc["name"]]
        if want is None:
            assert got is None, sc["name"]
            continue
        assert got is not None, sc["name"]
        assert got["band"] == want["band"], sc["name"]
        assert got["mag"] == pytest.approx(want["mag"], rel=1e-12)
        assert got["mag_err"] == pytest.approx(want["mag_err"], rel=1e-12)
        assert int(got["catalog_ID"]) == want["catalog_ID"]


def test_panstarrs_sentinel_divergence_documented(utilities_golden,
                                                  monkeypatch):
    """PS1 -999 sentinels: pin the reference's recorded behavior AND our
    deliberate divergence.

    MAST can serve -999.0 as a plain float for missing PS1 photometry.
    The fixture (recorded by running the REFERENCE's own
    photometric_selection_heuristic, reference
    utilities/absolute_magnitudes_from_panstarrs.py:118-143) shows the
    reference's truthiness check passing the sentinel through: it would
    store mag = -999, mag_err = -999, and even blend a sentinel into a
    composite (c-band: -481.299).  Ours validates values (finite,
    mag > -100, err > 0) and rejects those rows; conversely an exact
    0.0 magnitude is falsy ("missing") to the reference but a valid
    measurement to us.  Documented in PARITY.md ("Pan-STARRS sentinel
    handling"); this test fails if EITHER side's behavior drifts.
    """
    import sys

    import pandas as pd

    sys.path.insert(0, str(pathlib.Path(__file__).parents[1] / "tools"))
    from record_reference_utilities_golden import (
        panstarrs_sentinel_scenarios)

    import lightcurver_tpu.utilities.absolute_magnitudes_from_panstarrs \
        as ps

    golden = utilities_golden["panstarrs_selection_sentinel"]
    # the recorded REFERENCE behavior: sentinels pass its truthiness cut
    assert golden["sentinel_neg999_requested"]["mag"] == -999.0
    assert golden["sentinel_neg999_err_only"]["mag_err"] == -999.0
    assert golden["sentinel_composite_c"]["mag"] == pytest.approx(
        0.49 * -999.0 + 0.51 * 16.1, rel=1e-12)
    assert golden["sentinel_zero_mag"] is None

    ours = {}
    for sc in panstarrs_sentinel_scenarios():
        monkeypatch.setattr(
            ps, "get_user_config",
            lambda band=sc["band"]: {"photometric_band": band})
        ours[sc["name"]] = ps.photometric_selection_heuristic(
            pd.DataFrame(sc["rows"]))
    # our deliberate divergence: reject every -999 sentinel row ...
    assert ours["sentinel_neg999_requested"] is None
    assert ours["sentinel_neg999_err_only"] is None
    assert ours["sentinel_composite_c"] is None
    # ... and accept an exact 0.0 magnitude with a valid error
    assert ours["sentinel_zero_mag"] is not None
    assert ours["sentinel_zero_mag"]["mag"] == 0.0
    assert ours["sentinel_zero_mag"]["mag_err"] == pytest.approx(0.05)


def test_user_config_derivation_matches_reference(utilities_golden,
                                                  tmp_path):
    """Config-derivation semantics == the ACTUAL reference.

    Fixture recorded by tools/record_reference_utilities_golden.py
    running the reference's get_user_config (reference
    structure/user_config.py:11-85) on synthetic YAML payloads: ROI
    name/coordinate extraction, raw_dirs promotion, derived
    workdir-relative paths plus the plots/logs/frames mkdir side
    effect, stars_to_* character expansion, gaia-vs-panstarrs survey
    selection with the declination and unknown-band refusals (exact
    error strings), and the constraints/astrometry defaults.  Our
    additive keys (psf_dft_pad, checkpoints_dir, ...) are outside the
    compared set by construction.
    """
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parents[1] / "tools"))
    from record_reference_utilities_golden import (run_user_config,
                                                   user_config_scenarios)

    from lightcurver_tpu.structure.user_config import get_user_config

    golden = utilities_golden["user_config"]
    for i, sc in enumerate(user_config_scenarios()):
        wd = tmp_path / f"wd{i}"
        wd.mkdir()
        got = run_user_config(get_user_config, sc, wd)
        assert got == golden[sc["name"]], sc["name"]


def test_gaia_queries_match_reference(utilities_golden):
    """Our Gaia/Vizier ADQL == the reference's, token for token.

    Fixture recorded by running the reference's own
    find_gaia_stars_in_circle/_in_polygon (reference
    utilities/gaia.py:28-217) with run_query intercepted: table names,
    quality-cut WHERE fragments and order, CONTAINS geometry, and the
    Vizier column renames all pinned.  Queries are compared
    whitespace-normalized (the shared capture helper does this).
    """
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parents[1] / "tools"))
    from record_reference_utilities_golden import capture_gaia_queries

    import lightcurver_tpu.utilities.gaia as our_gaia

    ours = capture_gaia_queries(our_gaia)
    golden = utilities_golden["gaia_queries"]
    assert set(ours) == set(golden)
    for name in golden:
        assert ours[name] == golden[name], name


def test_workflow_shipped_dag_matches_reference(utilities_golden):
    """The 12-task DAG and its execution order == the reference's.

    shipped_tasks/shipped_order recorded by running the reference's own
    WorkflowManager.build_dependency_graph + topological_sort (reference
    pipeline/workflow_manager.py:129-166) on its shipped YAML.
    """
    import sys

    import yaml

    sys.path.insert(0, str(pathlib.Path(__file__).parents[1] / "tools"))
    from record_reference_utilities_golden import run_topo

    from lightcurver_tpu.pipeline.workflow_manager import WorkflowManager

    golden = utilities_golden["workflow_ordering"]
    dag_path = (pathlib.Path(__file__).parents[1] / "lightcurver_tpu"
                / "pipeline" / "pipeline_dependency_graph.yaml")
    ours_tasks = yaml.safe_load(dag_path.read_text())["tasks"]
    assert [{"name": t["name"], "dependencies": sorted(t["dependencies"])}
            for t in ours_tasks] == golden["shipped_tasks"]
    assert run_topo(WorkflowManager, ours_tasks) == golden["shipped_order"]


def test_workflow_ordering_divergence_documented(utilities_golden):
    """Pin the reference's DAG bugs and assert we diverge correctly.

    The reference's build_dependency_graph (reference
    pipeline/workflow_manager.py:129-137) OVERWRITES a node created
    earlier as someone's dependency, dropping its 'next' edges.  Two
    recorded consequences on synthetic graphs:

    - out_of_order (dependents declared before dependencies): the
      reference emits 'e' BEFORE its dependencies 'c'/'d' — not a
      topological order.  Ours must emit a valid one.
    - cycle (x<->y): the lost edge makes the reference's cycle check
      pass, so it silently returns ['x', 'y'] and would EXECUTE a
      cyclic pipeline.  Ours must refuse.

    The shipped YAML declares tasks in dependency order, where both
    agree exactly (test above) — the divergence is bug-for-bug only.
    """
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parents[1] / "tools"))
    from record_reference_utilities_golden import (run_topo,
                                                   workflow_graph_scenarios)

    from lightcurver_tpu.pipeline.workflow_manager import WorkflowManager

    golden = utilities_golden["workflow_ordering"]
    scenarios = workflow_graph_scenarios()

    # the reference's recorded result is NOT a topological order ...
    deps = {t["name"]: t["dependencies"]
            for t in scenarios["out_of_order"]}
    ref_pos = {n: i for i, n in enumerate(golden["out_of_order"])}
    assert sorted(ref_pos) == sorted(deps)
    assert any(ref_pos[d] > ref_pos[n]
               for n, ds in deps.items() for d in ds), \
        "reference output became topological; divergence note is stale"

    # ... ours is: same task set, every dependency before its dependent
    ours = run_topo(WorkflowManager, scenarios["out_of_order"])
    assert sorted(ours) == sorted(deps)
    our_pos = {n: i for i, n in enumerate(ours)}
    for n, ds in deps.items():
        for d in ds:
            assert our_pos[d] < our_pos[n], (d, n)

    # cycle: reference silently returns a bogus order; ours raises
    assert golden["cycle"] == ["x", "y"]
    result = run_topo(WorkflowManager, scenarios["cycle"])
    assert isinstance(result, dict), "our sort accepted a cyclic graph"
    assert "cycle" in result["error"].lower()


# ---------------------------------------------------------------------
# Independent cross-implementation oracle (tools/independent_oracle.py):
# torch + float64 + scipy's Fortran L-BFGS-B — the same optimizer
# library the reference's STARRED stack drives — re-implementing the
# documented model equations with none of the core's machinery.  This
# is the standing substitute for the unrecordable STARRED head-to-head
# (test_matches_reference_golden skip): two independent implementations
# agreeing on the committed golden inputs to far below the sub-mmag bar.
# ---------------------------------------------------------------------


@pytest.fixture(scope="module")
def oracle():
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parents[1] / "tools"))
    import independent_oracle

    return independent_oracle


@pytest.fixture(scope="module")
def golden_inputs():
    return np.load(FIXTURES / "golden_inputs.npz")


def test_oracle_render_matches_core(oracle, golden_inputs):
    """The two forward-model implementations agree at float32 precision
    on random parameters (the core is float32; the oracle float64)."""
    import jax.numpy as jnp

    from lightcurver_tpu.core.deconv.model import DeconvModel

    rng = np.random.RandomState(0)
    N, n, s = 4, 16, 2
    m = n * s
    psf = rng.rand(N, m, m).astype(np.float32) + 1.0
    a = rng.rand(N) * 100
    c_x, c_y = 0.3, -0.2
    dx = rng.randn(N) * 0.5
    dy = rng.randn(N) * 0.5
    mean = rng.randn(N) * 0.1

    model = DeconvModel(psf, s, n, N, 1)
    kwargs = {
        "kwargs_analytic": {
            "a": jnp.asarray(a, jnp.float32),
            "c_x": jnp.asarray([c_x], jnp.float32),
            "c_y": jnp.asarray([c_y], jnp.float32),
            "dx": jnp.asarray(dx, jnp.float32),
            "dy": jnp.asarray(dy, jnp.float32),
            "alpha": jnp.zeros(N, jnp.float32),
        },
        "kwargs_background": {"h": jnp.zeros(m * m, jnp.float32),
                              "mean": jnp.asarray(mean, jnp.float32)},
        "kwargs_sersic": {},
    }
    ours = np.asarray(model.model(kwargs))
    theirs = oracle.render_photometry_model(psf, s, a, c_x, c_y, dx, dy,
                                            mean=mean)
    assert np.abs(ours - theirs).max() / np.abs(ours).max() < 1e-5


def test_oracle_photometry_parity(oracle, golden_inputs, our_outputs):
    """Independent torch/scipy joint fit lands on the same fluxes as the
    core's AdaBelief+GLS fit: measured 3e-6 mag (0.003 mmag) — the
    sub-mmag bar with 300x margin — and chi2 to ~1e-6 relative."""
    z = golden_inputs
    res = oracle.fit_photometry(z["phot_data"], z["phot_noise"],
                                z["phot_psf"],
                                int(z["subsampling_factor"]))
    assert res["scipy_result"].success

    ours = np.asarray(our_outputs["phot_fluxes"])
    dmag = 2.5 * np.abs(np.log10(res["fluxes"] / ours))
    assert float(dmag.max()) < 1e-4, f"flux disagreement {dmag} mag"
    np.testing.assert_allclose(res["chi2_per_frame"],
                               our_outputs["phot_chi2_per_frame"],
                               rtol=1e-3)


def test_oracle_moffat_parity(oracle, golden_inputs, our_outputs):
    """Independent scipy-L-BFGS-B Moffat fit reproduces the core's
    phase-1 FWHM solution (measured 0.3%; asserted 1%)."""
    z = golden_inputs
    res = oracle.fit_moffat(z["psf_stars"], z["psf_noise"],
                            int(z["subsampling_factor"]))
    assert res["scipy_result"].success
    assert res["fwhm_x"] == pytest.approx(our_outputs["psf_fwhm_x"],
                                          rel=0.01)
    assert res["fwhm_y"] == pytest.approx(our_outputs["psf_fwhm_y"],
                                          rel=0.01)
    # the oracle stops at the analytic phase; the core's recorded chi2
    # includes the pixel-grid phase, which can only improve the fit
    assert res["chi2"] < 2.0
    assert our_outputs["psf_chi2"] <= res["chi2"] * 1.05


@pytest.mark.slow
def test_oracle_psf_grid_phase_parity(oracle, golden_inputs, our_outputs):
    """Independent phase 2 (free pixel grid, starlet-l1 with the core's
    closed-form W as the shared problem constant, own AdaBelief)
    reaches the same final chi2 regime as the core's build_psf
    (measured 0.358 vs 0.394 — 9%; asserted 15%), completing the
    two-phase PSF chain cross-check."""
    import jax.numpy as jnp
    import numpy as np

    from lightcurver_tpu.core.psf.build import (
        _propagate_noise_to_grid_weights)
    from lightcurver_tpu.core.psf.model import PSFModel

    z = golden_inputs
    s = int(z["subsampling_factor"])
    image, noisemap = z["psf_stars"], z["psf_noise"]
    n_stars, n_pix = image.shape[0], image.shape[-1]

    mof = oracle.fit_moffat(image, noisemap, s)
    scale = float(np.nanmax(image))
    model = PSFModel(n_stars, n_pix, s)
    a0 = np.clip(np.nansum(image / scale, axis=(1, 2)), 1e-3, None)
    W = np.asarray(_propagate_noise_to_grid_weights(
        model, noisemap / scale, jnp.mean(jnp.asarray(a0))))

    res = oracle.fit_psf_grid(image, noisemap, s, mof["fwhm_x"],
                              mof["fwhm_y"], mof["beta"], W, lam=1.0,
                              n_iter=2000, lr=5e-4)
    # the grid phase must IMPROVE on the analytic phase ...
    assert res["chi2"] < mof["chi2"]
    # ... and land in the core's final-chi2 regime
    assert res["chi2"] == pytest.approx(our_outputs["psf_chi2"],
                                        rel=0.15)
    # the fitted narrow PSF is a unit-sum positive-core profile
    assert res["narrow_psf"].sum() == pytest.approx(1.0, abs=1e-6)
