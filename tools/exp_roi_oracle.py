"""One-off: ROI-deconvolution parity between the core and the oracle.

Runs the core's stage-2-style joint fit (AdaBelief + GLS polish, the
bench.py::run_roi_deconv configuration) and tools/independent_oracle.py's
torch fit on the SAME problem (same scene, same init, same bounds, same
regularization constants), and prints the flux agreement.

Usage: JAX_PLATFORMS=cpu python tools/exp_roi_oracle.py
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))


def main(n_epochs=10, n_pix=32, s=2, n_sources=3, n_iter_core=2000,
         n_iter_oracle=6000, noise_sigma=0.3, seed=3, production=False,
         lr_core=1e-2, lr_oracle=1e-2):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from lightcurver_tpu.core.deconv.loss import Loss
    from lightcurver_tpu.core.deconv.model import setup_model
    from lightcurver_tpu.core.fisher import linear_flux_solve
    from lightcurver_tpu.core.optimize import run_adabelief
    from lightcurver_tpu.core.params import Params
    from lightcurver_tpu.utilities.synthetic import make_roi_scene

    import independent_oracle as oracle

    scene = make_roi_scene(n_epochs=n_epochs, n_pix=n_pix, s=s,
                           n_sources=n_sources, seed=seed,
                           noise_sigma=noise_sigma)
    data, sigma_2, psf = scene["data"], scene["sigma_2"], scene["psf"]

    model, kwargs_init, kwargs_up, kwargs_down, _ = setup_model(
        data, sigma_2, psf, scene["xs"], scene["ys"], s)
    params = Params(kwargs_init, {"kwargs_sersic": {}}, kwargs_up,
                    kwargs_down)
    reg = dict(regularization_terms="l1_starlet",
               regularization_strength_scales=1.0,
               regularization_strength_hf=1.0,
               regularization_strength_positivity=100.0)
    W = None
    if production:
        # the processes/roi_modelling.py stage-2 configuration: noise-
        # propagated starlet weights + point-source proximity +
        # flux-uniformity regs (the degeneracy-pinning terms)
        from lightcurver_tpu.core.noise import propagate_noise

        W = np.asarray(propagate_noise(
            model, np.sqrt(sigma_2), kwargs_init,
            wavelet_type_list=["starlet"], method="SLIT",
            num_samples=500, seed=1, likelihood_type="chi2",
            upsampling_factor=s)[0])
        reg.update(regularization_strength_pts_source=0.01,
                   regularization_strength_flux_uniformity=10.0,
                   W=W)
    loss = Loss(data, model, params, sigma_2, **reg)

    t0 = time.time()
    best, _, hist = run_adabelief(loss.loss_fn, params.free0,
                                  params.lower, params.upper,
                                  n_iter_core, init_learning_rate=lr_core,
                                  schedule_learning_rate=not production,
                                  consts=loss.consts)
    params.set_best(best)
    kwargs = params.best_fit_values(as_kwargs=True)
    kwargs = linear_flux_solve(kwargs, jnp.asarray(data),
                               jnp.asarray(sigma_2), model,
                               model.consts())
    core_s = time.time() - t0
    core_flux = np.asarray(kwargs["kwargs_analytic"]["a"]).reshape(
        n_epochs, n_sources)
    modelled = np.asarray(model.model(kwargs))
    core_chi2 = float(np.nansum((data - modelled) ** 2 / sigma_2)
                      / modelled.size)
    core_loss = float(loss.loss_fn(
        {"kwargs_analytic": {k: jnp.asarray(v) for k, v in
                             kwargs["kwargs_analytic"].items()},
         "kwargs_background": {k: jnp.asarray(v) for k, v in
                               kwargs["kwargs_background"].items()},
         "kwargs_sersic": {}}, loss.consts))

    # oracle on the same problem definition
    def np_tree(kw):
        return {g: {k: np.asarray(v, np.float64) for k, v in d.items()}
                for g, d in kw.items() if g != "kwargs_sersic"}

    extra = {}
    if production:
        extra = dict(lambda_pts=0.01,
                     pts_weights=np.asarray(loss.consts["pts_weights"]),
                     lambda_flux_uni=10.0, W=W)
    t0 = time.time()
    res = oracle.fit_roi(data, sigma_2, psf, s, np_tree(kwargs_init),
                         np_tree(kwargs_down), np_tree(kwargs_up),
                         lambda_scales=1.0, lambda_hf=1.0,
                         lambda_pos=100.0, n_iter=n_iter_oracle,
                         lr=lr_oracle, **extra)
    oracle_s = time.time() - t0
    oracle_flux = res["fluxes"]

    dmag = 2.5 * np.abs(np.log10(oracle_flux / core_flux))
    true_flux = scene.get("a_true")
    print(f"core: {core_s:.1f}s chi2={core_chi2:.4f} loss={core_loss:.3f}")
    print(f"oracle: {oracle_s:.1f}s chi2={res['reduced_chi2']:.4f} "
          f"loss={res['loss']:.3f}")
    print("dmag matrix (epochs x sources):")
    print(np.array2string(dmag, precision=6))
    print("max dmag:", float(dmag.max()), "mag")
    if true_flux is not None:
        tf = np.asarray(true_flux)
        print("core vs truth (rel):",
              float(np.abs(core_flux / tf - 1).max()))
        print("oracle vs truth (rel):",
              float(np.abs(oracle_flux / tf - 1).max()))


if __name__ == "__main__":
    main()
