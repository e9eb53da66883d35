"""Record golden outputs from the REFERENCE implementation (STARRED).

Run this in an environment where the reference stack is installed
(``pip install starred-astro``) — it is NOT runnable in the hermetic
build/CI environment here (no starred wheel, no network), which is why
the resulting ``tests/fixtures/reference_golden.json`` ships as a
recorded artifact; tests/test_reference_golden.py skips the comparison
when the file is absent.

The calls mirror the reference's usage exactly:
- build_psf: reference processes/psf_modelling.py:164-171
- setup_model/Loss/Optimizer joint star photometry:
  reference processes/star_photometry.py:23-151

Inputs come from tests/fixtures/golden_inputs.npz (committed; generate
with tools/make_golden_inputs.py) so both implementations see identical
bytes.

Usage: python tools/record_reference_golden.py
"""

import json
import pathlib

import numpy as np

FIXTURES = pathlib.Path(__file__).resolve().parents[1] / "tests" / "fixtures"


def main():
    z = np.load(FIXTURES / "golden_inputs.npz")
    s = int(z["subsampling_factor"])
    out = {}

    # ---- narrow PSF fit (STARRED build_psf) -----------------------------
    from starred.procedures.psf_routines import build_psf

    result = build_psf(
        image=np.asarray(z["psf_stars"], np.float64),
        noisemap=np.asarray(z["psf_noise"], np.float64),
        subsampling_factor=s,
        n_iter_analytic=100, n_iter_adabelief=1000,
        guess_method_star_position="center")
    out["psf_chi2"] = float(result["chi2"])
    out["psf_fwhm_x"] = float(
        result["kwargs_psf"]["kwargs_moffat"]["fwhm_x"])
    out["psf_fwhm_y"] = float(
        result["kwargs_psf"]["kwargs_moffat"]["fwhm_y"])

    # ---- joint star photometry (STARRED setup_model + Loss + optim) -----
    from starred.deconvolution.deconvolution import setup_model
    from starred.deconvolution.loss import Loss
    from starred.deconvolution.parameters import ParametersDeconv
    from starred.optim.optimization import Optimizer

    data = np.asarray(z["phot_data"], np.float64)
    noise = np.asarray(z["phot_noise"], np.float64)
    psf = np.asarray(z["phot_psf"], np.float64)
    scale = float(np.nanmax(data))
    d, sig = data / scale, noise / scale
    model, kwargs_init, kwargs_up, kwargs_down, kwargs_fixed = setup_model(
        d, sig**2, psf, np.array([0.0]), np.array([0.0]), s)
    # pin the pixel channel + pedestals, like star_photometry.py:74-87
    kwargs_fixed["kwargs_background"]["h"] = \
        kwargs_init["kwargs_background"]["h"]
    kwargs_fixed["kwargs_background"]["mean"] = \
        kwargs_init["kwargs_background"]["mean"]
    kwargs_fixed["kwargs_analytic"]["alpha"] = \
        kwargs_init["kwargs_analytic"]["alpha"]
    parameters = ParametersDeconv(kwargs_init, kwargs_fixed,
                                  kwargs_up=kwargs_up,
                                  kwargs_down=kwargs_down)
    loss = Loss(d, model, parameters, sig**2,
                regularization_terms="l1_starlet",
                regularization_strength_scales=3.0,
                regularization_strength_hf=3.0)
    optim = Optimizer(loss, parameters, method="adabelief")
    optim.minimize(max_iterations=2000, init_learning_rate=1e-3,
                   schedule_learning_rate=True, restart_from_init=True)
    kw = parameters.best_fit_values(as_kwargs=True)
    modelled = np.asarray(model.model(kw))
    chi2 = np.nansum((d - modelled) ** 2 / sig**2,
                     axis=(1, 2)) / d.shape[-1] ** 2
    out["phot_fluxes"] = (
        scale * np.asarray(kw["kwargs_analytic"]["a"])).tolist()
    out["phot_chi2_per_frame"] = np.asarray(chi2).tolist()

    target = FIXTURES / "reference_golden.json"
    target.write_text(json.dumps(out, indent=2))
    print(f"wrote {target}")


if __name__ == "__main__":
    main()
