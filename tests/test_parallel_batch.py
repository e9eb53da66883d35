"""Batch-axis (frame/star) sharding: multi-device vs single-device parity.

Mirrors test_parallel.py for the two NON-ROI hot tasks: the batched PSF
fit shards its frame axis and the batched star photometry its star axis
across the 8-virtual-CPU-device mesh from conftest.py.  Per-batch-entry
math is independent, so the sharded results must match the unsharded
ones and the compiled step must contain NO collectives.
"""

import re

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def psf_frames():
    from lightcurver_tpu.utilities.synthetic import make_star_stamps

    # 5 frames: deliberately NOT divisible by the 8-device mesh
    frames = [make_star_stamps(n_stars=4, n_pix=20, s=2, seed=10 + i,
                               fwhm_x=2.4 + 0.2 * i, fwhm_y=2.6)
              for i in range(5)]
    return (np.stack([f["data"] for f in frames]),
            np.stack([f["sigma"] for f in frames]))


@pytest.fixture(scope="module")
def star_set():
    from lightcurver_tpu.utilities.synthetic import make_star_stamps

    data, noise, psf = [], [], []
    for sidx in range(5):  # 5 stars: not divisible by 8 either
        st = make_star_stamps(n_stars=6, n_pix=16, s=2, seed=20 + sidx,
                              fwhm_x=2.6, fwhm_y=2.6)
        data.append(st["data"])
        noise.append(st["sigma"])
        m = st["psf_true"].shape[-1]
        psf.append(np.broadcast_to(st["psf_true"], (6, m, m)))
    return np.stack(data), np.stack(noise), np.stack(psf)


# every parity test below compares against the SAME unsharded fit at the
# SAME n_iter=80 budget: one reference fit and one compiled trip count
# for the whole module instead of five (the scan length is static, so
# every distinct n_iter is a separate XLA program)
STAR_N_ITER = 80


@pytest.fixture(scope="module")
def star_ref(star_set):
    from lightcurver_tpu.core.deconv.batched import fit_stars_batched

    data, noise, psf = star_set
    return fit_stars_batched(data, noise, psf, 2, n_iter=STAR_N_ITER,
                             mesh=None)


def test_pad_batch_arrays_pads_and_shards():
    from lightcurver_tpu.parallel.batch import (batch_mesh,
                                                pad_batch_arrays,
                                                strip_batch)

    mesh = batch_mesh(8)
    a = np.arange(5 * 3, dtype=np.float32).reshape(5, 3)
    b = np.arange(5, dtype=np.float32)
    (a_s, b_s), n_pad = pad_batch_arrays(mesh, a, b)
    assert n_pad == 3
    assert a_s.shape == (8, 3) and b_s.shape == (8,)
    # padding repeats the LAST real entry
    np.testing.assert_array_equal(np.asarray(a_s)[5:],
                                  np.broadcast_to(a[-1], (3, 3)))
    # each device holds exactly one batch entry
    assert len(a_s.sharding.device_set) == 8
    out = strip_batch({"x": np.asarray(a_s)}, n_pad)
    np.testing.assert_array_equal(out["x"], a)


def test_pad_batch_arrays_rejects_mismatched_axes():
    from lightcurver_tpu.parallel.batch import batch_mesh, pad_batch_arrays

    mesh = batch_mesh(8)
    with pytest.raises(ValueError, match="inconsistent leading batch"):
        pad_batch_arrays(mesh, np.zeros((5, 2)), np.zeros((4,)))


def test_psf_batch_sharded_matches_unsharded(psf_frames):
    """Frame-sharded PSF fits reproduce the single-device bucket."""
    from lightcurver_tpu.core.psf.batched import build_psf_batched
    from lightcurver_tpu.parallel.batch import batch_mesh

    data, sigma = psf_frames
    kw = dict(n_iter_analytic=20, n_iter_adabelief=80)
    ref = build_psf_batched(data, sigma, 2, mesh=None, **kw)
    shd = build_psf_batched(data, sigma, 2, mesh=batch_mesh(8), **kw)

    # the SPMD-partitioned executable fuses (and so rounds) differently
    # from the single-device one; ulp-level differences amplify along
    # the optimizer trajectory, so parity is at CONVERGENCE level —
    # same minimum, not the same float path (iterations 0-2 of the
    # history ARE bit-identical; measured divergence ~0.3% by iter 100)
    assert shd["narrow_psf"].shape == ref["narrow_psf"].shape
    np.testing.assert_allclose(shd["chi2"], ref["chi2"], rtol=2e-2)
    # grid pixels are noise-regularized and still moving at this short
    # budget — a 0.3% trajectory split leaves a few % of peak there
    peak = ref["full_psf"].max()
    np.testing.assert_allclose(shd["full_psf"] / peak,
                               ref["full_psf"] / peak, atol=3e-2)
    np.testing.assert_allclose(shd["kwargs_moffat"]["fwhm_x"],
                               ref["kwargs_moffat"]["fwhm_x"], rtol=1e-2)
    np.testing.assert_allclose(shd["loss_history_pixels"],
                               ref["loss_history_pixels"], rtol=3e-2)
    # the first iterations, before rounding noise amplifies, are exact
    np.testing.assert_allclose(shd["loss_history_analytic"][:, :3],
                               ref["loss_history_analytic"][:, :3],
                               rtol=1e-5)


def test_star_photometry_sharded_matches_unsharded(star_set, star_ref):
    """Star-sharded joint photometry reproduces the single-device fit."""
    from lightcurver_tpu.core.deconv.batched import fit_stars_batched
    from lightcurver_tpu.parallel.batch import batch_mesh

    data, noise, psf = star_set
    ref = star_ref
    shd = fit_stars_batched(data, noise, psf, 2, mesh=batch_mesh(8),
                            n_iter=STAR_N_ITER)

    # convergence-level parity (see the PSF test above for why not
    # bitwise); fluxes are the payload — hold them tighter
    assert shd["fluxes"].shape == ref["fluxes"].shape
    np.testing.assert_allclose(shd["fluxes"], ref["fluxes"], rtol=2e-3)
    np.testing.assert_allclose(shd["fluxes_uncertainties"],
                               ref["fluxes_uncertainties"], rtol=1e-2)
    np.testing.assert_allclose(shd["chi2_per_frame"],
                               ref["chi2_per_frame"], rtol=1e-2)
    np.testing.assert_allclose(shd["loss_history"], ref["loss_history"],
                               rtol=2e-2)


def test_auto_mesh_is_used_by_default(star_set, star_ref):
    """mesh="auto" on a multi-device backend shards without opting in —
    the production tasks (processes/psf_modelling.py,
    processes/star_photometry.py) pick the pod up for free."""
    from lightcurver_tpu.parallel.batch import auto_batch_mesh

    mesh = auto_batch_mesh()
    assert mesh is not None and mesh.size == jax.device_count()

    from lightcurver_tpu.core.deconv.batched import fit_stars_batched

    data, noise, psf = star_set
    out_auto = fit_stars_batched(data, noise, psf, 2, n_iter=STAR_N_ITER)
    np.testing.assert_allclose(out_auto["fluxes"], star_ref["fluxes"],
                               rtol=2e-3)


def _collective_ops(hlo):
    """Data-moving collectives in an HLO dump.

    A scalar ``pred[]`` all-reduce is exempt: it is the termination
    predicate of the vmapped L-BFGS while-loop (each device's frames
    may converge at different iterations; the global loop must agree),
    an O(1)-byte control signal, not data traffic.
    """
    return [ln for ln in hlo.splitlines()
            if re.search(r"all-reduce\(|all-gather\(|all-to-all\(|"
                         r"collective-permute\(", ln)
            and not re.search(r"pred\[\] all-reduce\(", ln)]


def test_psf_batch_sharded_step_has_no_collectives(psf_frames):
    """Pure data parallelism: the partitioned PSF program moves ZERO
    bytes over ICI — scaling is linear in chips by construction.

    Pinned on the PRODUCTION TPU render backend ('mxu', the
    DFT-as-matmul path auto-selected on TPU): matmuls partition
    trivially along the batch dim.  The 'fft' fallback does NOT have
    this property — XLA SPMD cannot partition the FFT op's batch dims
    and inserts an all-gather around every transform — which is one
    more reason the MXU-DFT is the TPU path."""
    from lightcurver_tpu.core.psf import batched as B
    from lightcurver_tpu.parallel.batch import batch_mesh, pad_batch_arrays

    data, sigma = psf_frames
    mesh = batch_mesh(8)
    masks = np.isfinite(data)
    coords = np.zeros(data.shape[:2] + (2,), np.float32)
    fwhm0 = np.full((data.shape[0],), 3.0, np.float32)
    arrays, n_pad = pad_batch_arrays(mesh, data.astype(np.float32),
                                     sigma.astype(np.float32), masks,
                                     coords, fwhm0)
    keys = jax.device_put(
        jax.random.split(jax.random.PRNGKey(0), data.shape[0] + n_pad),
        arrays[0].sharding)
    lowered = B._fit_frames.lower(
        *arrays, keys, data.shape[1], data.shape[-1], 2, False, 5, 10,
        1.0, 5e-4, "mxu", "high")
    hlo = lowered.compile().as_text()
    assert _collective_ops(hlo) == [], _collective_ops(hlo)[:5]


def test_star_batch_sharded_step_has_no_collectives(star_set):
    from lightcurver_tpu.core.deconv import batched as B
    from lightcurver_tpu.parallel.batch import batch_mesh, pad_batch_arrays

    data, noise, psf = star_set
    mesh = batch_mesh(8)
    (data_d, noise_d, psf_d), n_pad = pad_batch_arrays(
        mesh, data.astype(np.float32), noise.astype(np.float32),
        psf.astype(np.float32))
    keys = jax.device_put(
        jax.random.split(jax.random.PRNGKey(0), data.shape[0] + n_pad),
        data_d.sharding)
    lowered = B._fit_stars.lower(
        data_d, noise_d, psf_d, keys, data.shape[1], data.shape[-1], 2,
        10, False, False, 1e-3, "mxu", "high")
    hlo = lowered.compile().as_text()
    assert _collective_ops(hlo) == [], _collective_ops(hlo)[:5]


def test_star_photometry_sharded_checkpoint_roundtrip(star_set, star_ref,
                                                      tmp_path):
    """The segmented/checkpointed batched fit also runs sharded."""
    from lightcurver_tpu.core.deconv.batched import fit_stars_batched
    from lightcurver_tpu.parallel.batch import batch_mesh

    data, noise, psf = star_set
    ckpt = tmp_path / "stars.ckpt"
    out = fit_stars_batched(data, noise, psf, 2, n_iter=STAR_N_ITER,
                            mesh=batch_mesh(8),
                            checkpoint_path=str(ckpt),
                            checkpoint_every=30)
    assert ckpt.exists()
    np.testing.assert_allclose(out["fluxes"], star_ref["fluxes"],
                               rtol=2e-3)
    assert out["loss_history"].shape == (5, STAR_N_ITER)


def test_star_photometry_2d_mesh_matches_unsharded(star_set, star_ref):
    """(batch, epoch) mesh: 5 stars on 8 devices -> a (2, 4) mesh
    shards each star's epoch axis too.  Stars pad 5->6, epochs pad
    6->8 with standard dummy epochs; both pads strip from the result
    and XLA's per-star cross-shard reductions reproduce the
    single-device fit."""
    from lightcurver_tpu.core.deconv.batched import fit_stars_batched
    from lightcurver_tpu.parallel.batch import batch_epoch_mesh

    data, noise, psf = star_set
    ref = star_ref
    mesh = batch_epoch_mesh(2, 4)
    shd = fit_stars_batched(data, noise, psf, 2, n_iter=STAR_N_ITER,
                            mesh=mesh)

    assert shd["fluxes"].shape == ref["fluxes"].shape
    np.testing.assert_allclose(shd["fluxes"], ref["fluxes"], rtol=2e-3)
    np.testing.assert_allclose(shd["chi2_per_frame"],
                               ref["chi2_per_frame"], rtol=1e-2)
    np.testing.assert_allclose(shd["loss_history"], ref["loss_history"],
                               rtol=2e-2)
    assert shd["residuals"].shape == ref["residuals"].shape


def test_auto_fit_mesh_selection():
    """Few stars -> 2-D (batch, epoch) mesh; many -> 1-D batch mesh."""
    from lightcurver_tpu.parallel.batch import (BATCH_AXIS, EPOCH_AXIS,
                                                auto_fit_mesh)

    n_dev = jax.device_count()
    many = auto_fit_mesh(4 * n_dev)
    assert many.axis_names == (BATCH_AXIS,) and many.size == n_dev
    few = auto_fit_mesh(2)
    assert few.axis_names == (BATCH_AXIS, EPOCH_AXIS)
    assert few.shape[BATCH_AXIS] == 2
    assert few.size == n_dev
    one = auto_fit_mesh(1)
    assert one.shape[BATCH_AXIS] == 1 and one.size == n_dev


def test_star_photometry_2d_mesh_with_global_background(star_set):
    """The starlet-global-background path (MC weights, shared h) also
    survives 2-D sharding — its per-star reductions include the
    background gradient."""
    from lightcurver_tpu.core.deconv.batched import fit_stars_batched
    from lightcurver_tpu.parallel.batch import batch_epoch_mesh

    data, noise, psf = star_set
    kw = dict(n_iter=80, starlet_global_background=True)
    ref = fit_stars_batched(data, noise, psf, 2, mesh=None, **kw)
    shd = fit_stars_batched(data, noise, psf, 2,
                            mesh=batch_epoch_mesh(2, 4), **kw)
    np.testing.assert_allclose(shd["fluxes"], ref["fluxes"], rtol=5e-3)
    assert np.isfinite(shd["starlet_background"]).all()


def test_epoch_axis_key_set_matches_result_shapes(star_set):
    """Contract pin: EPOCH_AXIS_RESULT_KEYS (core/deconv/batched) names
    EXACTLY the fit_stars_batched result arrays whose axis 1 is the
    epoch axis — strip_epoch_axis trusts it to remove epoch padding, so
    a new per-epoch result key that is not added to the set would leak
    dummy epochs into multi-device results."""
    from lightcurver_tpu.core.deconv.batched import (
        EPOCH_AXIS_RESULT_KEYS, fit_stars_batched)

    data, noise, psf = star_set
    n_epochs = data.shape[1]
    # n_iter != n_epochs so a (star, iter) leaf cannot alias the test
    out = fit_stars_batched(data, noise, psf, 2, n_iter=n_epochs + 3,
                            mesh=None)

    epoch_axis_keys = {k for k, v in out.items()
                       if getattr(v, "ndim", 0) >= 2
                       and v.shape[1] == n_epochs}
    assert epoch_axis_keys == set(EPOCH_AXIS_RESULT_KEYS)
