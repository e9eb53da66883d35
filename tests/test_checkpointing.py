"""Mid-optimization checkpoint/resume: interrupted == uninterrupted."""

import numpy as np
import pytest
import jax.numpy as jnp


@pytest.fixture()
def problem():
    from lightcurver_tpu.utilities.synthetic import make_roi_scene
    from lightcurver_tpu.core.deconv.model import setup_model
    from lightcurver_tpu.core.deconv.loss import Loss
    from lightcurver_tpu.core.params import Params

    scene = make_roi_scene(n_epochs=4, n_pix=16, s=2, n_sources=2,
                           seed=2)
    model, ki, ku, kd, kf = setup_model(
        scene["data"], scene["sigma_2"], scene["psf"], scene["xs"],
        scene["ys"], scene["s"])
    params = Params(ki, kf, ku, kd)
    loss = Loss(scene["data"], model, params, scene["sigma_2"])
    return loss, params


def test_resume_matches_uninterrupted(problem, tmp_path):
    from lightcurver_tpu.core.optimize import (run_adabelief,
                                               run_adabelief_checkpointed)

    loss, params = problem
    n_iter = 120

    best_ref, final_ref, hist_ref = run_adabelief(
        loss.loss_fn, params.free0, params.lower, params.upper, n_iter,
        init_learning_rate=1e-2, consts=loss.consts)

    ckpt = tmp_path / "fit.ckpt"
    # run the first 80 iterations in two 40-iteration segments ...
    run_adabelief_checkpointed(
        loss.loss_fn, params.free0, params.lower, params.upper, 120,
        checkpoint_path=str(ckpt), init_learning_rate=1e-2, consts=loss.consts,
        checkpoint_every=40)
    # 'kill' + resume: a fresh call with the same path skips to done
    best_ck, final_ck, hist_ck = run_adabelief_checkpointed(
        loss.loss_fn, params.free0, params.lower, params.upper, 120,
        checkpoint_path=str(ckpt), init_learning_rate=1e-2, consts=loss.consts,
        checkpoint_every=40)

    assert hist_ck.shape == (n_iter,)
    np.testing.assert_allclose(hist_ck, np.asarray(hist_ref), rtol=1e-5,
                               atol=1e-3)
    for leaf_ref, leaf_ck in zip(
            np.asarray(final_ref["kwargs_analytic"]["a"]),
            np.asarray(final_ck["kwargs_analytic"]["a"])):
        assert leaf_ck == pytest.approx(leaf_ref, rel=1e-4)


def test_partial_checkpoint_resumes(problem, tmp_path):
    """Simulate an interruption by checkpointing a shorter prefix."""
    import pickle

    from lightcurver_tpu.core.optimize import run_adabelief_checkpointed

    loss, params = problem
    ckpt = tmp_path / "fit.ckpt"
    run_adabelief_checkpointed(
        loss.loss_fn, params.free0, params.lower, params.upper, 80,
        checkpoint_path=str(ckpt), consts=loss.consts,
        checkpoint_every=40)
    with open(ckpt, "rb") as f:
        state = pickle.load(f)
    # rewind the checkpoint to the 40-iteration point
    state["done"] = 40
    state["history"] = state["history"][:40]
    state["n_iter"] = 80
    with open(ckpt, "wb") as f:
        pickle.dump(state, f)

    best, final, hist = run_adabelief_checkpointed(
        loss.loss_fn, params.free0, params.lower, params.upper, 80,
        checkpoint_path=str(ckpt), consts=loss.consts,
        checkpoint_every=40)
    assert hist.shape == (80,)
    assert np.isfinite(hist).all()
