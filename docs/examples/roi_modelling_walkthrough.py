"""Interactive walkthrough: joint ROI modelling with the core API.

The equivalent of the reference's example notebook
(docs/example_starred_notebooks/example_roi_modelling.ipynb) for this
framework: drive the numerical core directly — outside the pipeline —
the way you would from a notebook. Self-contained: a synthetic
multi-epoch scene stands in for the pipeline's prepared cutouts HDF5
(swap the `make_roi_scene` block for the `h5py.File` block below to run
on real products).

Run:  python docs/examples/roi_modelling_walkthrough.py
"""

from copy import deepcopy

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")  # notebook-friendly; drop on TPU

from lightcurver_tpu.core.deconv.model import setup_model          # noqa: E402
from lightcurver_tpu.core.deconv.loss import Loss, Prior           # noqa: E402
from lightcurver_tpu.core.params import Params                     # noqa: E402
from lightcurver_tpu.core.optimize import Optimizer                # noqa: E402
from lightcurver_tpu.core.noise import propagate_noise             # noqa: E402
from lightcurver_tpu.core.fisher import get_flux_uncertainties     # noqa: E402
from lightcurver_tpu.utilities.synthetic import make_roi_scene     # noqa: E402

# %% Importation of data ----------------------------------------------------
# From a pipeline product you would do:
#   with h5py.File("cutouts_<hash>_<roi>.h5") as f:
#       data, noisemap, psf = f["data"][...], f["noisemap"][...], f["psf"][...]
#       seeings, mjds = f["seeing"][...], f["mjd"][...]
# Here: 40 synthetic epochs of two blended point sources.
scene = make_roi_scene(n_epochs=40, n_pix=24, s=2, n_sources=2, seed=3,
                       noise_sigma=0.05, flux_range=(100.0, 250.0))
data = np.asarray(scene["data"])
sigma_2 = np.asarray(scene["sigma_2"])
psf = np.asarray(scene["psf"])

# scale to unit peak, like the pipeline (roi_modelling.py): the
# regularization strengths below assume unit-scale data
scale = float(np.nanmax(data))
data = data / scale
sigma_2 = sigma_2 / scale**2
noisemap = np.sqrt(sigma_2)
n_epochs, n_pix = data.shape[0], data.shape[-1]
s = scene["s"]

# per-epoch seeing measured from the PSFs themselves (flux-weighted RMS
# radius) — from a pipeline product you would read f["seeing"] instead
yy, xx = np.mgrid[0:psf.shape[-1], 0:psf.shape[-1]]
c0 = (psf.shape[-1] - 1) / 2.0
r2 = (xx - c0) ** 2 + (yy - c0) ** 2
seeings = np.sqrt((psf * r2).sum(axis=(1, 2)) / psf.sum(axis=(1, 2)))

# two epochs per night (30 min apart), nights one day apart
mjds = (60000.0 + np.repeat(np.arange(n_epochs // 2), 2)
        + np.tile([0.0, 0.02], n_epochs // 2))

# sanity check the relative normalization: total flux per cutout
flux_per_frame = data.sum(axis=(1, 2))
print(f"flux per frame: {flux_per_frame.mean():.1f} "
      f"+- {flux_per_frame.std():.1f}")

# %% Deconvolution of the best frames ---------------------------------------
# fit the best-seeing subset first to nail astrometry + background
best = np.argsort(seeings)[:8]
best_data, best_sigma2, best_psf = data[best], sigma_2[best], psf[best]

# initial guesses: positions in CENTER-ORIGIN data pixels
xs, ys = np.asarray(scene["xs"]), np.asarray(scene["ys"])
model, kwargs_init, kwargs_up, kwargs_down, _ = setup_model(
    best_data, best_sigma2, best_psf, xs, ys, s)

# stage 1: only translations + fluxes free (everything else fixed)
kwargs_fixed = deepcopy(kwargs_init)
del kwargs_fixed["kwargs_analytic"]["dx"]
del kwargs_fixed["kwargs_analytic"]["dy"]
del kwargs_fixed["kwargs_analytic"]["a"]
params = Params(kwargs_init, kwargs_fixed, kwargs_up, kwargs_down)
loss = Loss(best_data, model, params, best_sigma2,
            regularization_strength_flux_uniformity=1.0)
Optimizer(loss, params, method="l-bfgs-b").minimize(max_iterations=100)
kwargs_partial1 = params.best_fit_values(as_kwargs=True)
print("stage 1 (translations) done")

# stage 2: free everything relevant, starlet-regularized background
kwargs_fixed = deepcopy(kwargs_partial1)
for key in ("a", "c_x", "c_y", "dx", "dy"):
    del kwargs_fixed["kwargs_analytic"][key]
del kwargs_fixed["kwargs_background"]["h"]
del kwargs_fixed["kwargs_background"]["mean"]
params = Params(kwargs_partial1, kwargs_fixed, kwargs_up, kwargs_down)
W = propagate_noise(model, np.sqrt(best_sigma2), kwargs_partial1,
                    num_samples=200, upsampling_factor=s)[0]
loss = Loss(best_data, model, params, best_sigma2,
            regularization_terms="l1_starlet",
            regularization_strength_scales=1.0,
            regularization_strength_hf=1.0,
            regularization_strength_positivity=100.0, W=W,
            prior=Prior(prior_analytic=[
                ["c_x", xs, 0.5 * np.ones_like(xs)],
                ["c_y", ys, 0.5 * np.ones_like(ys)]]))
Optimizer(loss, params, method="adabelief").minimize(
    max_iterations=800, init_learning_rate=1e-2)
kwargs_best_frames = params.best_fit_values(as_kwargs=True)
print("stage 2 (best frames) done")

# carry the refined background + astrometry into the full fit
init_background = np.asarray(kwargs_best_frames["kwargs_background"]["h"])
init_cx = np.asarray(kwargs_best_frames["kwargs_analytic"]["c_x"])
init_cy = np.asarray(kwargs_best_frames["kwargs_analytic"]["c_y"])

# %% Deconvolution of all frames --------------------------------------------
model, kwargs_init, kwargs_up, kwargs_down, _ = setup_model(
    data, sigma_2, psf, init_cx, init_cy, s)
kwargs_init["kwargs_background"]["h"] = init_background

kwargs_fixed = deepcopy(kwargs_init)
del kwargs_fixed["kwargs_analytic"]["dx"]
del kwargs_fixed["kwargs_analytic"]["dy"]
del kwargs_fixed["kwargs_analytic"]["a"]
params = Params(kwargs_init, kwargs_fixed, kwargs_up, kwargs_down)
loss = Loss(data, model, params, sigma_2,
            regularization_strength_flux_uniformity=1.0)
Optimizer(loss, params, method="l-bfgs-b").minimize(max_iterations=100)
kwargs_partial = params.best_fit_values(as_kwargs=True)

kwargs_fixed = {"kwargs_analytic": {
    "alpha": kwargs_partial["kwargs_analytic"]["alpha"]},
    "kwargs_sersic": {}}
params = Params(kwargs_partial, kwargs_fixed, kwargs_up, kwargs_down)
W = propagate_noise(model, noisemap, kwargs_partial, num_samples=200,
                    upsampling_factor=s)[0]
loss = Loss(data, model, params, sigma_2,
            regularization_terms="l1_starlet",
            regularization_strength_scales=1.0,
            regularization_strength_hf=1.0,
            regularization_strength_positivity=100.0,
            # discourage the background from absorbing point-source
            # flux (the production setting; without it blended-source
            # fluxes bias low)
            regularization_strength_pts_source=0.01, W=W)
Optimizer(loss, params, method="adabelief").minimize(
    max_iterations=1500, init_learning_rate=1e-3)
kwargs_final = params.best_fit_values(as_kwargs=True)

# exact GLS flux polish at the fitted positions/background — the model
# is linear in the fluxes, so this removes the optimizer's convergence
# tail (the pipeline always applies it)
import jax.numpy as jnp                                            # noqa: E402

from lightcurver_tpu.core.fisher import linear_flux_solve          # noqa: E402

kwargs_final = linear_flux_solve(kwargs_final, jnp.asarray(data),
                                 jnp.asarray(sigma_2), model)
print("full joint fit done")

# %% Quality control ---------------------------------------------------------
modelled = np.asarray(model.model(kwargs_final))
chi2_per_frame = ((data - modelled) ** 2 / sigma_2).sum(axis=(1, 2)) \
    / n_pix**2
print(f"reduced chi2 per frame: median {np.median(chi2_per_frame):.3f}, "
      f"max {chi2_per_frame.max():.3f}")

# %% Fisher flux uncertainties + light curves --------------------------------
d_a = get_flux_uncertainties(kwargs=kwargs_final, kwargs_up=kwargs_up,
                             kwargs_down=kwargs_down, data=data,
                             noisemap=noisemap, model=model)
a = scale * np.asarray(kwargs_final["kwargs_analytic"]["a"])
M = len(xs)
curves = {f"{label}_flux": a[i::M]
          for i, label in enumerate("AB"[:M])}
curves.update({f"{label}_d_flux": scale * np.asarray(d_a)[i::M]
               for i, label in enumerate("AB"[:M])})

# %% Nightly grouping + magnitudes (pipeline post-processing utilities) ------
import pandas as pd                                                # noqa: E402

from lightcurver_tpu.utilities.lightcurves_postprocessing import (  # noqa: E402
    convert_flux_to_magnitude, group_observations)

df = pd.DataFrame({"mjd": mjds, **curves, "zeropoint": 25.0})
nightly = group_observations(df)
mags = convert_flux_to_magnitude(nightly)
print(mags[[c for c in mags.columns if "mag" in c or c == "mjd"]]
      .head().to_string())

# recovered fluxes vs the injected truth
true_a = np.asarray(scene["a_true"]).reshape(n_epochs, M)
rel = curves["A_flux"] / true_a[:, 0] - 1
print(f"source A flux recovery: median {np.median(rel):+.3%}")
assert np.median(chi2_per_frame) < 1.5
assert abs(np.median(rel)) < 0.05
print("walkthrough OK")
