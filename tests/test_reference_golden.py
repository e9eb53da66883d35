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
            "reference_golden.json not recorded: starred-astro is not "
            "installable in this environment (no wheel, no network); "
            "run tools/record_reference_golden.py where it is")
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
