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


def test_killed_optimizer_fit_resumes_exactly(problem, tmp_path,
                                              monkeypatch):
    """GENUINE mid-run kill of run_adabelief_checkpointed: the second
    segment's checkpoint write raises, leaving a one-segment (iter-40)
    state on disk; the resumed run must reproduce the uninterrupted
    trajectory exactly.  (An earlier test rewound a FINISHED
    checkpoint's done marker instead — that leaves an iteration-80
    carry labeled done=40, an inconsistent state no real kill
    produces, so it could only assert shapes.)"""
    import numpy as real_np

    from lightcurver_tpu.core.optimize import (run_adabelief,
                                               run_adabelief_checkpointed)

    loss, params = problem
    best_ref, final_ref, hist_ref = run_adabelief(
        loss.loss_fn, params.free0, params.lower, params.upper, 120,
        init_learning_rate=1e-2, consts=loss.consts)

    ckpt = tmp_path / "fit.ckpt"
    calls = {"n": 0}
    orig_savez = real_np.savez

    def bomb(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise KeyboardInterrupt("simulated kill")
        return orig_savez(*args, **kwargs)

    monkeypatch.setattr(real_np, "savez", bomb)
    with pytest.raises(KeyboardInterrupt):
        run_adabelief_checkpointed(
            loss.loss_fn, params.free0, params.lower, params.upper, 120,
            checkpoint_path=str(ckpt), init_learning_rate=1e-2,
            consts=loss.consts, checkpoint_every=40)
    monkeypatch.setattr(real_np, "savez", orig_savez)
    assert ckpt.exists()
    with np.load(ckpt) as z:
        assert int(z["done"]) == 40  # exactly one segment survived

    best, final, hist = run_adabelief_checkpointed(
        loss.loss_fn, params.free0, params.lower, params.upper, 120,
        checkpoint_path=str(ckpt), init_learning_rate=1e-2,
        consts=loss.consts, checkpoint_every=40)
    assert hist.shape == (120,)
    np.testing.assert_allclose(hist, np.asarray(hist_ref), rtol=1e-5,
                               atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(final["kwargs_analytic"]["a"]),
        np.asarray(final_ref["kwargs_analytic"]["a"]), rtol=1e-4)


@pytest.fixture()
def star_batch():
    from lightcurver_tpu.utilities.synthetic import make_star_stamps

    data, noise, psf = [], [], []
    for sidx in range(3):
        st = make_star_stamps(n_stars=4, n_pix=16, s=2, seed=sidx,
                              fwhm_x=2.6, fwhm_y=2.6)
        data.append(st["data"])
        noise.append(st["sigma"])
        m = st["psf_true"].shape[-1]
        psf.append(np.broadcast_to(st["psf_true"], (4, m, m)))
    return np.stack(data), np.stack(noise), np.stack(psf)


def test_batched_star_fit_checkpoint_matches_unsegmented(star_batch,
                                                         tmp_path):
    """The segmented batched star fit equals the single-program fit."""
    from lightcurver_tpu.core.deconv.batched import fit_stars_batched

    data, noise, psf = star_batch
    ref = fit_stars_batched(data, noise, psf, 2, n_iter=200)
    out = fit_stars_batched(data, noise, psf, 2, n_iter=200,
                            checkpoint_path=str(tmp_path / "stars.ckpt"),
                            checkpoint_every=80)
    np.testing.assert_allclose(out["fluxes"], ref["fluxes"], rtol=1e-5)
    np.testing.assert_allclose(out["loss_history"], ref["loss_history"],
                               rtol=1e-5, atol=1e-4)


def test_killed_batched_fit_resumes_exactly(star_batch, tmp_path,
                                            monkeypatch):
    """Kill the batched fit after its first segment (genuine interrupt),
    re-run, and get the uninterrupted result."""
    from lightcurver_tpu.core.deconv import batched

    data, noise, psf = star_batch
    ref = batched.fit_stars_batched(data, noise, psf, 2, n_iter=200)

    ckpt = tmp_path / "stars.ckpt"
    calls = {"n": 0}
    orig = batched._segment_stars

    def bomb(*args, **kwargs):
        if calls["n"] >= 1:
            raise KeyboardInterrupt("simulated kill")
        calls["n"] += 1
        return orig(*args, **kwargs)

    monkeypatch.setattr(batched, "_segment_stars", bomb)
    with pytest.raises(KeyboardInterrupt):
        batched.fit_stars_batched(data, noise, psf, 2, n_iter=200,
                                  checkpoint_path=str(ckpt),
                                  checkpoint_every=80)
    monkeypatch.setattr(batched, "_segment_stars", orig)
    assert ckpt.exists()
    with np.load(ckpt) as z:
        assert int(z["done"]) == 80  # one segment survived

    resumed = batched.fit_stars_batched(data, noise, psf, 2, n_iter=200,
                                        checkpoint_path=str(ckpt),
                                        checkpoint_every=80)
    np.testing.assert_allclose(resumed["fluxes"], ref["fluxes"],
                               rtol=1e-5)
    np.testing.assert_allclose(resumed["loss_history"],
                               ref["loss_history"], rtol=1e-5, atol=1e-4)


def test_checkpoint_refuses_changed_inputs(star_batch, tmp_path,
                                           monkeypatch):
    """A checkpoint from a killed fit must NOT resume against modified
    input data (e.g. re-run PSF modelling): refuse, never silently
    continue from a carry optimized for the old data."""
    from lightcurver_tpu.core.deconv import batched

    data, noise, psf = star_batch
    ckpt = tmp_path / "stars.ckpt"
    calls = {"n": 0}
    orig = batched._segment_stars

    def bomb(*args, **kwargs):
        if calls["n"] >= 1:
            raise KeyboardInterrupt("simulated kill")
        calls["n"] += 1
        return orig(*args, **kwargs)

    monkeypatch.setattr(batched, "_segment_stars", bomb)
    with pytest.raises(KeyboardInterrupt):
        batched.fit_stars_batched(data, noise, psf, 2, n_iter=160,
                                  checkpoint_path=str(ckpt),
                                  checkpoint_every=80)
    monkeypatch.setattr(batched, "_segment_stars", orig)
    with pytest.raises(ValueError, match="different input data"):
        batched.fit_stars_batched(data * 1.01, noise, psf, 2, n_iter=160,
                                  checkpoint_path=str(ckpt),
                                  checkpoint_every=80)
    # unchanged inputs still resume fine
    out = batched.fit_stars_batched(data, noise, psf, 2, n_iter=160,
                                    checkpoint_path=str(ckpt),
                                    checkpoint_every=80)
    assert np.isfinite(out["fluxes"]).all()


def test_run_checkpointed_digest_mismatch_raises(problem, tmp_path):
    from lightcurver_tpu.core.optimize import (arrays_digest,
                                               run_adabelief_checkpointed)

    loss, params = problem
    ckpt = tmp_path / "fit.ckpt"
    d1 = arrays_digest(np.ones(4))
    run_adabelief_checkpointed(
        loss.loss_fn, params.free0, params.lower, params.upper, 40,
        checkpoint_path=str(ckpt), consts=loss.consts,
        checkpoint_every=20, inputs_digest=d1)
    with pytest.raises(ValueError, match="different input data"):
        run_adabelief_checkpointed(
            loss.loss_fn, params.free0, params.lower, params.upper, 40,
            checkpoint_path=str(ckpt), consts=loss.consts,
            checkpoint_every=20,
            inputs_digest=arrays_digest(np.zeros(4)))


def test_checkpoint_is_not_pickle_and_n_iter_mismatch_raises(
        problem, tmp_path):
    """Checkpoints are plain npz (no code execution on load) and a
    checkpoint recorded for a different n_iter is refused, not silently
    discarded (advisor round-1 finding)."""
    from lightcurver_tpu.core.optimize import run_adabelief_checkpointed

    loss, params = problem
    ckpt = tmp_path / "fit.ckpt"
    run_adabelief_checkpointed(
        loss.loss_fn, params.free0, params.lower, params.upper, 40,
        checkpoint_path=str(ckpt), consts=loss.consts,
        checkpoint_every=20)
    # the file is a zip/npz, not a pickle stream
    with open(ckpt, "rb") as f:
        assert f.read(2) == b"PK"
    with pytest.raises(ValueError, match="n_iter"):
        run_adabelief_checkpointed(
            loss.loss_fn, params.free0, params.lower, params.upper, 60,
            checkpoint_path=str(ckpt), consts=loss.consts,
            checkpoint_every=20)


def test_stale_checkpoint_is_discarded_at_task_level(star_batch,
                                                     tmp_path):
    """The pipeline tasks re-derive their inputs, so a resume refusal
    (inputs changed under the same checkpoint key) discards the stale
    checkpoint and restarts — the previous behaviour wedged every
    re-run until the user deleted the file by hand."""
    import logging

    from lightcurver_tpu.core.deconv.batched import fit_stars_batched
    from lightcurver_tpu.utilities.checkpoints import \
        run_discarding_stale_checkpoint

    data, noise, psf = star_batch
    ckpt = tmp_path / "stale.ckpt"
    # a completed fit leaves its checkpoint on disk (tasks delete it)
    fit_stars_batched(data, noise, psf, 2, n_iter=100,
                      checkpoint_path=str(ckpt), checkpoint_every=50)
    assert ckpt.exists()
    changed = data * np.float32(1.01)  # same shapes, different content
    logger = logging.getLogger("test.stale_ckpt")

    def run():
        return fit_stars_batched(changed, noise, psf, 2, n_iter=100,
                                 checkpoint_path=str(ckpt),
                                 checkpoint_every=50)

    # the bare call refuses (core semantics, unchanged) ...
    with pytest.raises(ValueError, match="different input data"):
        run()
    # ... the task-level wrapper recovers and completes
    out = run_discarding_stale_checkpoint(run, ckpt, logger)
    assert np.isfinite(out["fluxes"]).all()
    # unrelated errors still propagate
    def boom():
        raise ValueError("unrelated")
    with pytest.raises(ValueError, match="unrelated"):
        run_discarding_stale_checkpoint(boom, ckpt, logger)


def test_corrupted_checkpoint_is_discarded_at_task_level(star_batch,
                                                         tmp_path):
    """A truncated/garbage checkpoint file must surface as the typed
    CheckpointMismatch (so the task wrapper discards it), not as a raw
    np.load/zipfile error that wedges every re-run."""
    import logging

    from lightcurver_tpu.core.deconv.batched import fit_stars_batched
    from lightcurver_tpu.core.optimize import CheckpointMismatch
    from lightcurver_tpu.utilities.checkpoints import \
        run_discarding_stale_checkpoint

    data, noise, psf = star_batch
    ckpt = tmp_path / "garbage.ckpt"
    ckpt.write_bytes(b"this is not an npz file at all")

    def run():
        return fit_stars_batched(data, noise, psf, 2, n_iter=100,
                                 checkpoint_path=str(ckpt),
                                 checkpoint_every=50)

    with pytest.raises(CheckpointMismatch, match="unreadable"):
        run()
    out = run_discarding_stale_checkpoint(
        run, ckpt, logging.getLogger("test.garbage_ckpt"))
    assert np.isfinite(out["fluxes"]).all()


def test_stage2_digest_covers_loss_configuration():
    """The ROI stage-2 checkpoint digest must change when the OBJECTIVE
    changes — regularization scalars, astrometry handling, free/frozen
    background, point-source positions — not just when the pixel data
    change.  Resuming a carry against a different objective would
    silently blend two different fits."""
    from lightcurver_tpu.processes.roi_modelling import \
        stage2_checkpoint_digest

    rng = np.random.default_rng(0)
    data = rng.normal(size=(3, 8, 8))
    noise = np.abs(rng.normal(size=(3, 8, 8))) + 0.1
    psf = np.abs(rng.normal(size=(3, 16, 16)))
    cx, cy = np.array([0.5, -1.0]), np.array([0.2, 1.3])
    cfg = {"further_optimize_background": True}
    reg = {"regularization_strength_scales": 1.0,
           "regularization_strength_hf": 1.0}

    base = stage2_checkpoint_digest(cfg, reg, False, data, noise, psf,
                                    cx, cy)
    # deterministic across calls (and across dict insertion order)
    reg_reordered = dict(reversed(list(reg.items())))
    assert stage2_checkpoint_digest(cfg, reg_reordered, False, data,
                                    noise, psf, cx, cy) == base

    # every objective knob perturbs the digest
    assert stage2_checkpoint_digest(
        cfg, {**reg, "regularization_strength_scales": 2.0}, False,
        data, noise, psf, cx, cy) != base
    assert stage2_checkpoint_digest(cfg, reg, True, data, noise, psf,
                                    cx, cy) != base
    assert stage2_checkpoint_digest(cfg, reg, 0.5, data, noise, psf,
                                    cx, cy) != base
    assert stage2_checkpoint_digest(
        {"further_optimize_background": False}, reg, False, data,
        noise, psf, cx, cy) != base
    assert stage2_checkpoint_digest(cfg, reg, False, data, noise, psf,
                                    cx + 0.1, cy) != base
    # and the data identity still matters
    assert stage2_checkpoint_digest(cfg, reg, False, data + 1e-3,
                                    noise, psf, cx, cy) != base

    # the starting background and the fixed rotations are part of the
    # objective too (starting_background file / header angles changed
    # between runs must refuse the resume)
    h = np.ones(16)
    alpha = np.zeros(3)
    base_h = stage2_checkpoint_digest(cfg, reg, False, data, noise, psf,
                                      cx, cy, starting_h=h, alpha=alpha)
    assert base_h != base
    assert stage2_checkpoint_digest(cfg, reg, False, data, noise, psf,
                                    cx, cy, starting_h=h + 1e-4,
                                    alpha=alpha) != base_h
    assert stage2_checkpoint_digest(cfg, reg, False, data, noise, psf,
                                    cx, cy, starting_h=h,
                                    alpha=alpha + 0.1) != base_h
