"""Compiled-cost regression guards (hermetic, CPU).

The joint-deconvolution iteration is HBM-bound on TPU; its round-2
optimization campaign (rank-1 modulated matmuls, stacked stage-1
contraction, the all-real raw-spectrum pipeline — see ops/dft.py and
core/deconv/model.py) is invisible to output-correctness tests.  This
guard pins the XLA cost-analysis byte count of one value_and_grad so a
refactor that silently falls back to the premultiplied/complex path
(~25% more bytes at this scale, ~1.3x wall time at the 1000-epoch
flagship) fails loudly.
"""

import jax
import numpy as np


def test_deconv_value_and_grad_bytes_budget():
    from lightcurver_tpu import ops
    from lightcurver_tpu.core.deconv.loss import Loss
    from lightcurver_tpu.core.deconv.model import setup_model
    from lightcurver_tpu.core.params import Params
    from lightcurver_tpu.utilities.synthetic import make_roi_scene

    prev = ops.get_irfft_backend()
    ops.set_irfft_backend("mxu")
    try:
        scene = make_roi_scene(n_epochs=50, n_pix=32, s=2, n_sources=4)
        model, ki, ku, kd, _ = setup_model(
            scene["data"], scene["sigma_2"], scene["psf"], scene["xs"],
            scene["ys"], scene["s"])
        params = Params(ki, {"kwargs_sersic": {}}, ku, kd)
        loss = Loss(scene["data"], model, params, scene["sigma_2"],
                    regularization_terms="l1_starlet",
                    regularization_strength_scales=1.0,
                    regularization_strength_hf=1.0,
                    regularization_strength_positivity=100.0)
        vg = jax.jit(jax.value_and_grad(loss.loss_fn))
        comp = vg.lower(params.free0, loss.consts).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):  # older jax returns a per-device list
            ca = ca[0]
        gbytes = float(ca["bytes accessed"])
        # measured 103 MB with the all-real pipeline (2026-08, jax in
        # this image); the premultiplied/complex fallback costs ~25%
        # more (~129 MB) — the threshold sits BETWEEN the two so that
        # exact regression fails loudly, with ~12% headroom for jax
        # version noise on the fast path
        assert gbytes < 115e6, f"{gbytes/1e6:.1f} MB per value_and_grad"

        # and the fast path must actually be active: the t-layout key
        # is what routes model.model through _model_all_real
        assert "t_re" in loss.consts and "dft_mats" in loss.consts
    finally:
        ops.set_irfft_backend(prev)


def test_star_fit_phase_cost_emits_finite_figures():
    """The bench.py star-roofline extras must not silently break.

    star_fit_phase_cost builds the per-iteration value_and_grad of the
    batched star fit (tools/star_roofline.py, bench.py
    ``star_vg_bytes_per_iter``); a refactor of core/deconv/batched that
    changes its private surface would otherwise only fail on TPU at
    driver time.
    """
    from lightcurver_tpu import ops
    from lightcurver_tpu.utilities.benchmarking import star_fit_phase_cost

    prev = ops.get_irfft_backend()
    ops.set_irfft_backend("mxu")
    try:
        (vg_bytes, vg_flops), (vg, free, consts) = star_fit_phase_cost(
            n_stars=2, n_epochs=4, n_pix=8, s=2)
        assert np.isfinite(vg_bytes) and vg_bytes > 0
        assert np.isfinite(vg_flops) and vg_flops > 0
        value, grad = jax.jit(vg)(free, consts)
        assert value.shape == (2,)
        assert np.all(np.isfinite(np.asarray(value)))
    finally:
        ops.set_irfft_backend(prev)
