"""Epoch-sharded deconvolution: single-chip vs multi-chip equivalence.

Runs on the 8-virtual-CPU-device backend from conftest.py, mirroring the
driver's dryrun_multichip validation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def toy():
    import __graft_entry__ as ge

    return ge._toy_problem(n_epochs=8, n_pix=16, s=2, n_sources=2)


def test_dryrun_multichip_executes():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles_single_chip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    modelled, chi2 = jax.jit(fn)(*args)
    assert modelled.shape == (8, 16, 16)
    assert np.isfinite(float(chi2))


def test_sharded_fit_matches_single_device(toy):
    """The epoch-sharded fit must agree with the single-device fit."""
    from lightcurver_tpu.parallel.mesh import epoch_mesh
    from lightcurver_tpu.parallel.deconv import fit_deconv_sharded
    from lightcurver_tpu.core.deconv.model import setup_model
    from lightcurver_tpu.core.deconv.loss import Loss
    from lightcurver_tpu.core.params import Params
    from lightcurver_tpu.core.optimize import run_adabelief

    data, sigma_2, psf, xs, ys, s = toy
    n_iter = 150

    # single device
    model, kwargs_init, kwargs_up, kwargs_down, kwargs_fixed = setup_model(
        data, sigma_2, psf, xs, ys, s)
    params = Params(kwargs_init, kwargs_fixed, kwargs_up, kwargs_down)
    loss = Loss(data, model, params, sigma_2)
    best, _, hist_single = run_adabelief(
        loss.loss_fn, params.free0, params.lower, params.upper, n_iter,
        init_learning_rate=1e-2, consts=loss.consts)
    params.set_best(best)
    kwargs_single = params.best_fit_values(as_kwargs=True)

    # sharded over 8 devices
    mesh = epoch_mesh(8)
    kwargs_sharded, _, hist_sharded = fit_deconv_sharded(
        data, sigma_2, psf, xs, ys, s, mesh, n_iter=n_iter,
        init_learning_rate=1e-2)

    assert hist_sharded.shape == (n_iter,)
    np.testing.assert_allclose(
        np.asarray(hist_sharded), np.asarray(hist_single),
        rtol=2e-4, atol=1e-3)
    a_1 = np.asarray(kwargs_single["kwargs_analytic"]["a"])
    a_8 = np.asarray(kwargs_sharded["kwargs_analytic"]["a"])
    np.testing.assert_allclose(a_8, a_1, rtol=1e-3, atol=1e-3)


def test_pad_epoch_stacks():
    from lightcurver_tpu.parallel.deconv import pad_epoch_stacks

    data = np.ones((5, 4, 4), np.float32)
    sigma_2 = np.ones((5, 4, 4), np.float32)
    psf = np.full((5, 8, 8), 0.25, np.float32)
    data_p, sigma_2_p, psf_p, epoch_w = pad_epoch_stacks(
        data, sigma_2, psf, 8)
    assert data_p.shape == (8, 4, 4)
    assert data_p[5:].sum() == 0.0
    assert (sigma_2_p[5:] == 1e16).all()
    # dummy PSFs repeat the last real epoch (well-conditioned spectra)
    np.testing.assert_array_equal(psf_p[5:], np.broadcast_to(
        psf[-1], (3, 8, 8)))
    np.testing.assert_array_equal(epoch_w, [1, 1, 1, 1, 1, 0, 0, 0])


def test_pad_strip_kwargs_roundtrip():
    from lightcurver_tpu.parallel.deconv import (pad_epoch_kwargs,
                                                 strip_epoch_kwargs)

    n, n_pad, M = 5, 3, 2
    kwargs = {
        "kwargs_analytic": {
            "a": np.arange(n * M, dtype=np.float32),
            "c_x": np.array([1.0, 2.0], np.float32),
            "dx": np.arange(n, dtype=np.float32),
        },
        "kwargs_background": {"mean": np.zeros(n, np.float32),
                              "h": np.zeros(16, np.float32)},
    }
    padded = pad_epoch_kwargs(kwargs, n, n_pad, M)
    assert padded["kwargs_analytic"]["a"].size == (n + n_pad) * M
    assert padded["kwargs_analytic"]["dx"].shape == (n + n_pad,)
    # shared leaves untouched
    np.testing.assert_array_equal(padded["kwargs_analytic"]["c_x"],
                                  kwargs["kwargs_analytic"]["c_x"])
    assert padded["kwargs_background"]["h"].size == 16
    # dummy fluxes sit at the per-source mean (uniformity-reg neutral)
    a_pad = np.asarray(padded["kwargs_analytic"]["a"]).reshape(-1, M)
    np.testing.assert_allclose(
        a_pad[n:], np.broadcast_to(a_pad[:n].mean(axis=0), (n_pad, M)))
    stripped = strip_epoch_kwargs(padded, n, n_pad, M)
    for grp in kwargs:
        for k in kwargs[grp]:
            np.testing.assert_array_equal(np.asarray(stripped[grp][k]),
                                          np.asarray(kwargs[grp][k]))


@pytest.mark.parametrize("n_epochs", [10, 87])
def test_sharded_fit_pads_non_divisible(n_epochs):
    """Any epoch count shards: 10 and 87 epochs on the 8-device mesh
    reproduce the single-device fit (dummy epochs exactly masked).

    87 is the reference's own tutorial dataset size
    (reference docs/mkdocs/contents/tutorial.md:166-169) — the round-1
    implementation silently fell back to a single device here."""
    import __graft_entry__ as ge
    from lightcurver_tpu.parallel.mesh import epoch_mesh
    from lightcurver_tpu.parallel.deconv import fit_deconv_sharded
    from lightcurver_tpu.core.deconv.model import setup_model
    from lightcurver_tpu.core.deconv.loss import Loss
    from lightcurver_tpu.core.params import Params
    from lightcurver_tpu.core.optimize import run_adabelief

    data, sigma_2, psf, xs, ys, s = ge._toy_problem(
        n_epochs=n_epochs, n_pix=12, s=2, n_sources=2)
    n_iter = 60

    model, kwargs_init, kwargs_up, kwargs_down, kwargs_fixed = setup_model(
        data, sigma_2, psf, xs, ys, s)
    params = Params(kwargs_init, kwargs_fixed, kwargs_up, kwargs_down)
    loss = Loss(data, model, params, sigma_2)
    best, _, hist_single = run_adabelief(
        loss.loss_fn, params.free0, params.lower, params.upper, n_iter,
        init_learning_rate=1e-2, consts=loss.consts)
    params.set_best(best)
    kwargs_single = params.best_fit_values(as_kwargs=True)

    mesh = epoch_mesh(8)
    kwargs_sharded, model_out, hist_sharded = fit_deconv_sharded(
        data, sigma_2, psf, xs, ys, s, mesh, n_iter=n_iter,
        init_learning_rate=1e-2)

    # zero-weight masking is exact: the padded loss history IS the
    # unpadded one (up to reduction-order noise)
    assert hist_sharded.shape == (n_iter,)
    np.testing.assert_allclose(np.asarray(hist_sharded),
                               np.asarray(hist_single),
                               rtol=2e-4, atol=1e-3)
    # returned kwargs/model are real-epoch sized
    a_s = np.asarray(kwargs_sharded["kwargs_analytic"]["a"])
    assert a_s.size == n_epochs * 2
    assert model_out.n_epochs == n_epochs
    np.testing.assert_allclose(
        a_s, np.asarray(kwargs_single["kwargs_analytic"]["a"]),
        rtol=1e-3, atol=1e-3)
    assert kwargs_sharded["kwargs_analytic"]["dx"].shape == (n_epochs,)


def test_sharded_fit_with_mxu_backend(toy):
    """The MXU-DFT consts (replicated matrices) shard correctly."""
    from lightcurver_tpu import ops
    from lightcurver_tpu.parallel.mesh import epoch_mesh
    from lightcurver_tpu.parallel.deconv import fit_deconv_sharded

    data, sigma_2, psf, xs, ys, s = toy
    ops.set_irfft_backend("mxu")
    try:
        mesh = epoch_mesh(8)
        kwargs, _, hist = fit_deconv_sharded(
            data, sigma_2, psf, xs, ys, s, mesh, n_iter=60,
            init_learning_rate=1e-2)
    finally:
        ops.set_irfft_backend("fft")
    assert hist.shape == (60,)
    assert np.isfinite(hist).all()
    a = np.asarray(kwargs["kwargs_analytic"]["a"])
    assert np.isfinite(a).all()


def test_sharded_step_collective_traffic_is_epoch_independent():
    """ICI traffic of the epoch-sharded step is O(shared params), not O(N).

    The design (SURVEY §2.4/§5): per-epoch parameters and data shard
    along the epoch axis; only the SHARED background/astrometry
    gradients cross chips.  The compiled HLO must therefore contain a
    single fused gradient all-reduce — no all-gathers, no per-epoch
    collectives — whose payload does not grow with the epoch count.
    """
    import re

    import jax

    from lightcurver_tpu import ops
    from lightcurver_tpu.core.deconv.loss import Loss
    from lightcurver_tpu.core.deconv.model import setup_model
    from lightcurver_tpu.core.params import Params
    from lightcurver_tpu.parallel.deconv import (pad_epoch_stacks,
                                                 shard_consts,
                                                 shard_pytree,
                                                 sharded_deconv_step)
    from lightcurver_tpu.parallel.mesh import epoch_mesh
    from lightcurver_tpu.utilities.synthetic import make_roi_scene

    n_dev = jax.device_count()

    def collective_bytes(n_epochs):
        prev = ops.get_irfft_backend()
        ops.set_irfft_backend("mxu")
        try:
            mesh = epoch_mesh(n_dev)
            scene = make_roi_scene(n_epochs=n_epochs, n_pix=16, s=2,
                                   n_sources=2)
            data, sigma_2, psf, w = pad_epoch_stacks(
                scene["data"], scene["sigma_2"], scene["psf"], n_dev)
            model, ki, ku, kd, _ = setup_model(
                data, sigma_2, psf, scene["xs"], scene["ys"], scene["s"])
            params = Params(ki, {"kwargs_sersic": {}}, ku, kd)
            for name in ("free0", "fixed", "lower", "upper"):
                setattr(params, name,
                        shard_pytree(mesh, getattr(params, name)))
            loss = Loss(data, model, params, sigma_2, epoch_weights=w,
                        regularization_terms="l1_starlet",
                        regularization_strength_scales=1.0,
                        regularization_strength_hf=1.0,
                        regularization_strength_positivity=100.0)
            loss.consts = shard_consts(mesh, loss.consts)
            step, opt0 = sharded_deconv_step(loss, params)
            hlo = step.lower(params.free0, opt0, loss.consts,
                             params.lower,
                             params.upper).compile().as_text()
        finally:
            ops.set_irfft_backend(prev)

        assert not re.search(r"all-gather\(|all-to-all\(", hlo)
        reduces = [ln for ln in hlo.splitlines()
                   if re.search(r" all-reduce\(", ln)]
        assert len(reduces) == 1, reduces
        total = 0
        for shape in re.findall(r"f32\[([0-9,]*)\]", reduces[0]):
            n = 1
            for d in shape.split(","):
                if d:
                    n *= int(d)
            total += 4 * n
        return total

    b_small = collective_bytes(2 * n_dev)
    b_large = collective_bytes(6 * n_dev)
    assert b_small == b_large, (b_small, b_large)
    # and the payload is a few copies of the shared parameters (h
    # gradient in spectral form + source positions + scalars), far from
    # any per-epoch array
    m2 = (16 * 2) ** 2
    assert b_large < 8 * 4 * m2, b_large


def test_loss_irfft_backend_override(toy):
    """The sharded entry points force the matmul-DFT render regardless
    of the global flag (a partitioned FFT op all-gathers the full
    epoch stack); pin the Loss-level override they rely on."""
    from lightcurver_tpu import ops
    from lightcurver_tpu.core.deconv.loss import Loss
    from lightcurver_tpu.core.deconv.model import setup_model
    from lightcurver_tpu.core.params import Params

    assert ops.get_irfft_backend() == "fft"  # the suite-wide default
    data, sigma_2, psf, xs, ys, s = toy
    model, ki, ku, kd, kf = setup_model(data, sigma_2, psf, xs, ys, s)
    params = Params(ki, kf, ku, kd)
    forced = Loss(data, model, params, sigma_2, irfft_backend="mxu")
    assert "dft_mats" in forced.consts
    assert "t_re" in forced.consts  # the all-real raw-spectrum path
    default = Loss(data, model, params, sigma_2)
    assert "dft_mats" not in default.consts

    # starlet override: the sharded entry points force 'xla' because
    # the Pallas starlet has no partitioning rule.  _build_loss_fn is
    # lru-cached on the backend, so function identity proves which
    # backend a Loss traced.
    assert ops.get_backend() == "xla"
    ops.set_backend("pallas")
    try:
        forced_xla = Loss(data, model, params, sigma_2,
                          starlet_backend="xla")
        assert forced_xla.loss_fn is default.loss_fn
        unforced = Loss(data, model, params, sigma_2)
        assert unforced.loss_fn is not default.loss_fn
    finally:
        ops.set_backend("xla")


def test_sharded_overhead_tool_hlo_parser():
    """tools/sharded_overhead.py feeds BENCH_r*.json — pin its parser.

    The wall-overhead bench field is only trustworthy if the tool's
    all-reduce byte accounting reads compiled HLO correctly; exercise
    scalar-shaped, tuple-shaped and non-f32 result forms.
    """
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parents[1] / "tools"))
    from sharded_overhead import allreduce_bytes

    hlo = "\n".join([
        "%ar0 = f32[4225]{0} all-reduce(f32[4225]{0} %x), replica_groups",
        "%ar1 = (f32[64]{0}, f32[64]{0}) all-reduce(%a, %b), to_apply",
        "%ar2 = bf16[2,8]{1,0} all-reduce(bf16[2,8]{1,0} %y)",
        "%add = f32[10]{0} add(f32[10]{0} %p, f32[10]{0} %q)",
    ])
    expected = 4225 * 4 + 2 * 64 * 4 + 16 * 2
    assert allreduce_bytes(hlo) == expected
    assert allreduce_bytes("%add = f32[10] add(%p, %q)") == 0
