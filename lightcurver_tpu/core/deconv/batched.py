"""Batched (vmapped-over-stars) joint PSF photometry.

The reference measures each reference star with its own serial 2000-
iteration fit (processes/star_photometry.py:257); here the whole fit of
one star — scaling, initialization, AdaBelief loop, per-frame chi2,
closed-form Fisher flux errors — is a pure function vmapped over the
star axis and jitted once, so a field's worth of stars runs as a single
device program.  Stars with unequal epoch counts are padded with
zero-weight dummy epochs (noise 1e7).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .model import DeconvModel, pad_psf_to
from .loss import _build_loss_fn
from ..optimize import adabelief_scan
from ..noise import _mc_starlet_noise
from ..starlet import n_starlet_scales
from .. import convolution as conv
from ..fisher import _diag_fisher


def _prepare_one_star(data, noisemap, psf, key, n_epochs, image_size, s,
                      uniform_background_per_epoch,
                      starlet_global_background, dft_mats=None,
                      dft_precision=None):
    """Setup of one star's fit: (free0, lower, upper, consts, scale).

    Star-independent constants (the DFT matrices) are NOT included in
    the returned consts — under vmap they would be materialized once
    PER STAR; the callers merge one shared copy.  They ARE accepted as
    ``dft_mats`` (a broadcast closure constant under vmap) so the
    per-star spectra and MC weights compute as MXU matmuls: the FFT op
    is slow on TPU and XLA SPMD cannot partition its batch dims, so
    the FFT path would all-gather the full star stack on every device
    when the star axis is sharded (parallel/batch.py).
    """
    model = DeconvModel.for_eval(s, image_size, n_epochs, 1)
    m = model.m

    # dummy padding epochs are uniformly noise >= 1e7 (the documented
    # convention); a real epoch always has SOME pixel below 1e6.  The
    # mask drives exact loss weighting and keeps the Monte-Carlo noise
    # weights / mean PSF spectrum uncontaminated by padding (a star
    # padded to several times its real epoch count would otherwise get
    # its background regularization inflated by orders of magnitude).
    real_epoch = (noisemap < 1e6).any(axis=(1, 2))
    n_real = jnp.maximum(real_epoch.sum(), 1)

    scale = jnp.nanmax(data)
    scale = jnp.where(jnp.isfinite(scale) & (scale > 0), scale, 1.0)
    d = data / scale
    sig = noisemap / scale
    sigma_2 = sig**2

    # flux init: stamp sum minus a border-median background estimate
    borders = jnp.nanmean(jnp.stack([
        jnp.nanmedian(d[:, :1, :], axis=(1, 2)),
        jnp.nanmedian(d[:, :, :1], axis=(1, 2)),
        jnp.nanmedian(d[:, -1:, :], axis=(1, 2)),
        jnp.nanmedian(d[:, :, -1:], axis=(1, 2)),
    ]), axis=0)
    borders = jnp.nan_to_num(borders)
    a0 = jnp.nansum(d, axis=(1, 2)) - d[0].size * borders

    psf_pad = pad_psf_to(psf, m)
    psf_sum = psf_pad.sum(axis=(-2, -1), keepdims=True)
    # all-zero padded PSFs (dummy epochs) must not 0/0 into NaN spectra
    # — NaN would poison the SHARED parameters' gradients via the
    # nansum VJP and the whole star's fit would return its init
    psf_pad = psf_pad / jnp.where(psf_sum > 0, psf_sum, 1.0)
    spectra = model.spectra(psf_pad, dft_mats=dft_mats)
    spectra.update(model.spectra_real(psf_pad, dft_mats=dft_mats))

    free = {
        "kwargs_analytic": {
            "a": a0,
            "c_x": jnp.zeros(1, jnp.float32),
            "c_y": jnp.zeros(1, jnp.float32),
            "dx": jnp.zeros(n_epochs, jnp.float32),
            "dy": jnp.zeros(n_epochs, jnp.float32),
        },
        "kwargs_background": {},
        "kwargs_sersic": {},
    }
    fixed = {
        "kwargs_analytic": {"alpha": jnp.zeros(n_epochs, jnp.float32)},
        "kwargs_background": {},
        "kwargs_sersic": {},
    }
    if uniform_background_per_epoch:
        free["kwargs_background"]["mean"] = jnp.zeros(n_epochs,
                                                      jnp.float32)
    else:
        fixed["kwargs_background"]["mean"] = jnp.zeros(n_epochs,
                                                       jnp.float32)
    if starlet_global_background:
        free["kwargs_background"]["h"] = jnp.zeros(m * m, jnp.float32)
    else:
        fixed["kwargs_background"]["h"] = jnp.zeros(m * m, jnp.float32)

    inf = jnp.inf
    bound5 = 5.0
    lower = jax.tree_util.tree_map(lambda x: jnp.full_like(x, -inf), free)
    upper = jax.tree_util.tree_map(lambda x: jnp.full_like(x, inf), free)
    for name in ("c_x", "c_y", "dx", "dy"):
        lower["kwargs_analytic"][name] = jnp.full_like(
            free["kwargs_analytic"][name], -bound5)
        upper["kwargs_analytic"][name] = jnp.full_like(
            free["kwargs_analytic"][name], bound5)

    consts = {
        "data": d, "sigma_2": sigma_2, "fixed": fixed,
        "epoch_w": real_epoch.astype(jnp.float32),
        "lambda_scales": jnp.float32(3.0), "lambda_hf": jnp.float32(3.0),
        "lambda_pos": jnp.float32(0.0), "lambda_pts": jnp.float32(0.0),
        "lambda_flux_uni": jnp.float32(0.0),
        "pts_weights": jnp.zeros((1, 1), jnp.float32),
        **spectra,
    }
    if starlet_global_background:
        # statistics over REAL epochs only (padding excluded)
        sig_real = jnp.where(real_epoch[:, None, None], sig, jnp.nan)
        w = real_epoch.astype(spectra["ps_hat"].real.dtype)[:, None, None]
        mean_ps_hat = (spectra["ps_hat"] * w).sum(axis=0) / n_real
        consts["W"] = _mc_starlet_noise(
            jnp.nanmedian(sig_real, axis=0), mean_ps_hat,
            m, s, 200, n_starlet_scales(m), key, dft_mats,
            dft_precision=dft_precision)
    else:
        consts["W"] = jnp.ones((n_starlet_scales(m) + 1, m, m),
                               jnp.float32)
        # h is fixed at zero: its render is identically zero — the model
        # skips the whole per-iteration h convolution chain.  A scalar
        # zero broadcasts in the final add, costing nothing per star
        # (a full (n_epochs, n, n) zeros array would be re-read every
        # AdaBelief step of every star)
        consts["fixed_h_render"] = jnp.zeros((), jnp.float32)
    return free, lower, upper, consts, scale


def _star_loss_fn(n_epochs, image_size, s, starlet_global_background,
                  dft_precision, starlet_backend="xla"):
    model = DeconvModel.for_eval(s, image_size, n_epochs, 1)
    return _build_loss_fn(model.config(),
                          starlet_global_background,  # use_starlet
                          False, False, False, (),
                          starlet_backend=starlet_backend,
                          dft_precision=dft_precision)


def _finalize_one_star(best, history, consts, scale, n_epochs, image_size,
                       s):
    """Merge + GLS flux polish + chi2 + Fisher errors for one star."""
    model = DeconvModel.for_eval(s, image_size, n_epochs, 1)
    m = model.m
    d, sigma_2, fixed = consts["data"], consts["sigma_2"], consts["fixed"]
    spectra = {"ps_hat": consts["ps_hat"], "grid_hat": consts["grid_hat"]}
    if "dft_mats" in consts:
        # keep the GLS polish and Fisher basis on the matmul inverse:
        # the FFT op is slow on TPU and forces an all-gather when the
        # star axis is sharded
        spectra["dft_mats"] = consts["dft_mats"]
    if "fixed_h_render" in consts:
        # h is fixed at zero: keep skipping its render chain in the
        # polish baseline and the residual render too (bit-identical —
        # the fixed render IS the h channel's value)
        spectra["fixed_h_render"] = consts["fixed_h_render"]

    kwargs = {**best, "kwargs_analytic": {**best["kwargs_analytic"],
                                          **fixed["kwargs_analytic"]}}
    kwargs["kwargs_background"] = {**best.get("kwargs_background", {}),
                                   **fixed["kwargs_background"]}
    # exact GLS flux polish at the fitted positions/background: removes
    # the optimizer's convergence tail on the (linear) flux axis
    from ..fisher import linear_flux_solve

    kwargs = linear_flux_solve(kwargs, d, sigma_2, model, spectra)
    modelled = model.model(kwargs, spectra)
    residuals = d - modelled
    chi2_per_frame = jnp.nansum(residuals**2 / sigma_2,
                                axis=(1, 2)) / image_size**2
    basis = model.point_source_basis(kwargs, spectra)
    flux_err = _diag_fisher(basis, sigma_2)[:, 0]
    h = kwargs["kwargs_background"]["h"].reshape(m, m)

    return {
        "fluxes": scale * kwargs["kwargs_analytic"]["a"],
        "fluxes_uncertainties": scale * flux_err,
        "chi2_per_frame": chi2_per_frame,
        # mean over REAL epochs only: zero-weight padding epochs have
        # ~0 chi2 and would dilute the scalar toward zero
        "chi2": (jnp.nansum(chi2_per_frame * consts["epoch_w"])
                 / jnp.maximum(consts["epoch_w"].sum(), 1)),
        "loss_history": history,
        "residuals": scale * residuals,
        "starlet_background": scale * h,
    }


# result keys above whose LEADING axis is the epoch axis (batched: axis
# 1).  parallel/batch.strip_epoch_axis strips epoch padding by this set
# (extent-based detection would misfire when n_iter == n_epochs), so a
# new per-epoch key MUST be added here or padded dummy epochs leak into
# multi-device results; tests/test_parallel_batch.py pins the contract.
EPOCH_AXIS_RESULT_KEYS = frozenset({"fluxes", "fluxes_uncertainties",
                                    "chi2_per_frame", "residuals"})


def _shared_consts(image_size, s, irfft_backend):
    """Star-independent consts (currently: the MXU DFT matrices)."""
    if irfft_backend != "mxu":
        return {}
    from ...ops.dft import make_dft_mats

    m = image_size * s
    return {"dft_mats": make_dft_mats(2 * m, m, pool=s)}


def _fit_one_star(data, noisemap, psf, key, n_epochs, image_size, s,
                  n_iter, uniform_background_per_epoch,
                  starlet_global_background, lr, irfft_backend,
                  dft_precision, starlet_backend="xla"):
    """Pure single-star joint fit (fully traceable)."""
    shared = _shared_consts(image_size, s, irfft_backend)
    free, lower, upper, consts, scale = _prepare_one_star(
        data, noisemap, psf, key, n_epochs, image_size, s,
        uniform_background_per_epoch, starlet_global_background,
        dft_mats=shared.get("dft_mats"), dft_precision=dft_precision)
    consts = {**consts, **shared}
    loss_fn = _star_loss_fn(n_epochs, image_size, s,
                            starlet_global_background, dft_precision,
                            starlet_backend)
    best, _, history = adabelief_scan(
        loss_fn, free, consts, lower, upper, n_iter, lr, True)
    return _finalize_one_star(best, history, consts, scale, n_epochs,
                              image_size, s)


@functools.partial(
    jax.jit,
    static_argnames=("n_epochs", "image_size", "s", "n_iter",
                     "uniform_background_per_epoch",
                     "starlet_global_background", "irfft_backend",
                     "dft_precision", "starlet_backend"))
def _fit_stars(data, noisemap, psf, keys, n_epochs, image_size, s, n_iter,
               uniform_background_per_epoch, starlet_global_background,
               lr, irfft_backend, dft_precision, starlet_backend="xla"):
    fit = functools.partial(
        _fit_one_star, n_epochs=n_epochs, image_size=image_size, s=s,
        n_iter=n_iter,
        uniform_background_per_epoch=uniform_background_per_epoch,
        starlet_global_background=starlet_global_background, lr=lr,
        irfft_backend=irfft_backend, dft_precision=dft_precision,
        starlet_backend=starlet_backend)
    return jax.vmap(fit)(data, noisemap, psf, keys)


# ---- segmented (checkpointable) variant ------------------------------------
# Same math as _fit_stars, but the AdaBelief loop runs in host-level
# segments so the optimizer carry can be written to disk between them:
# a killed multi-thousand-iteration batched fit resumes instead of
# restarting (the reference has no mid-fit checkpointing, SURVEY §5).

@functools.partial(
    jax.jit,
    static_argnames=("n_epochs", "image_size", "s",
                     "uniform_background_per_epoch",
                     "starlet_global_background", "irfft_backend",
                     "dft_precision"))
def _prepare_stars(data, noisemap, psf, keys, n_epochs, image_size, s,
                   uniform_background_per_epoch,
                   starlet_global_background, irfft_backend,
                   dft_precision=None):
    shared = _shared_consts(image_size, s, irfft_backend)
    prep = functools.partial(
        _prepare_one_star, n_epochs=n_epochs, image_size=image_size, s=s,
        uniform_background_per_epoch=uniform_background_per_epoch,
        starlet_global_background=starlet_global_background,
        dft_mats=shared.get("dft_mats"), dft_precision=dft_precision)
    return jax.vmap(prep)(data, noisemap, psf, keys)


@functools.partial(jax.jit, static_argnames=("n_iter",))
def _init_carry_stars(free0, n_iter, lr):
    from ..optimize import make_adabelief

    opt = make_adabelief(n_iter, lr, True)

    def one(free):
        return (free, opt.init(free), free,
                jnp.asarray(jnp.inf, jnp.float32))

    return jax.vmap(one)(free0)


@functools.partial(
    jax.jit,
    static_argnames=("n_epochs", "image_size", "s",
                     "starlet_global_background", "n_iter", "length",
                     "dft_precision", "starlet_backend"))
def _segment_stars(carry, consts, shared, lower, upper, lr, n_epochs,
                   image_size, s, starlet_global_background, n_iter,
                   length, dft_precision, starlet_backend="xla"):
    from ..optimize import make_adabelief, adabelief_step_fn

    loss_fn = _star_loss_fn(n_epochs, image_size, s,
                            starlet_global_background, dft_precision,
                            starlet_backend)
    opt = make_adabelief(n_iter, lr, True)

    def seg(carry, consts, lower, upper, shared):
        step = adabelief_step_fn(loss_fn, opt, {**consts, **shared},
                                 lower, upper)
        return jax.lax.scan(step, carry, None, length=length)

    # shared (star-independent) consts broadcast with in_axes=None: ONE
    # device copy instead of one per star
    return jax.vmap(seg, in_axes=(0, 0, 0, 0, None))(
        carry, consts, lower, upper, shared)


@functools.partial(jax.jit,
                   static_argnames=("n_epochs", "image_size", "s"))
def _finalize_stars(best, history, consts, shared, scale, n_epochs,
                    image_size, s):
    def fin(best, history, consts, scale, shared):
        return _finalize_one_star(best, history, {**consts, **shared},
                                  scale, n_epochs, image_size, s)

    return jax.vmap(fin, in_axes=(0, 0, 0, 0, None))(
        best, history, consts, scale, shared)


def _fit_stars_checkpointed(data, noisemap, psf, keys, n_epochs,
                            image_size, s, n_iter,
                            uniform_background_per_epoch,
                            starlet_global_background, lr,
                            irfft_backend, dft_precision,
                            starlet_backend="xla", *,
                            checkpoint_path, checkpoint_every,
                            inputs_digest=None):
    """Host-segmented batched fit with npz checkpoints (leaves only —
    structure rebuilt from a fresh carry, never unpickled).  A stored
    ``inputs_digest`` that differs from the current one refuses to
    resume (the upstream data changed under the checkpoint).

    Checkpoint I/O note: each segment rewrites the carry plus the FULL
    cumulative loss history (npz cannot append), so checkpoint write
    volume grows quadratically with the segment count — negligible at
    the production segment counts (n_iter/checkpoint_every <~ 40), so
    the single self-contained file is kept over per-segment shards."""
    import os

    from ..optimize import (CheckpointMismatch, _check_ckpt_digest,
                            _load_ckpt_carry, materialize_tree,
                            save_checkpoint)

    free0, lower, upper, consts, scale = _prepare_stars(
        data, noisemap, psf, keys, n_epochs, image_size, s,
        uniform_background_per_epoch, starlet_global_background,
        irfft_backend, dft_precision=dft_precision)
    shared = _shared_consts(image_size, s, irfft_backend)
    carry = _init_carry_stars(free0, n_iter, lr)
    treedef = jax.tree_util.tree_structure(carry)

    def load_state():
        with np.load(checkpoint_path) as z:
            stored = int(z["n_iter"])
            if stored != n_iter:
                raise CheckpointMismatch(
                    f"checkpoint {checkpoint_path} was recorded for "
                    f"n_iter={stored}, requested {n_iter}; delete it to "
                    "restart")
            _check_ckpt_digest(
                checkpoint_path,
                z["inputs_digest"] if "inputs_digest" in z else None,
                inputs_digest)
            fresh = carry
            loaded = _load_ckpt_carry(z, treedef, lambda: fresh,
                                      checkpoint_path)
            return loaded, int(z["done"]), [np.asarray(z["history"])]

    start, histories = 0, []
    if os.path.exists(checkpoint_path):
        try:
            carry, start, histories = load_state()
        except CheckpointMismatch:
            raise
        except Exception as e:  # noqa: BLE001 — truncated/garbage file
            raise CheckpointMismatch(
                f"checkpoint {checkpoint_path} is unreadable "
                f"({type(e).__name__}: {e}); delete it to restart") from e

    if int(checkpoint_every) <= 0:
        raise ValueError(
            f"checkpoint_every must be positive, got {checkpoint_every} "
            "(a non-positive segment length would loop forever)")
    done = start
    while done < n_iter:
        length = min(int(checkpoint_every), n_iter - done)
        carry, hist = _segment_stars(
            carry, consts, shared, lower, upper, lr, n_epochs,
            image_size, s, starlet_global_background, n_iter, length,
            dft_precision, starlet_backend)
        # vmapped scan ys: (S, len); star-sharded on a mesh -> gather
        histories.append(materialize_tree(hist))
        done += length
        save_checkpoint(checkpoint_path, carry, n_iter, done,
                        np.concatenate(histories, axis=1),
                        inputs_digest=inputs_digest)

    _, _, best, _ = carry
    history = np.concatenate(histories, axis=1)[:, :n_iter]
    return _finalize_stars(best, jnp.asarray(history), consts, shared,
                           scale, n_epochs, image_size, s)


def fit_stars_batched(data, noisemap, psf, subsampling_factor,
                      n_iter=2000, uniform_background_per_epoch=False,
                      starlet_global_background=False, lr=1e-3, seed=0,
                      checkpoint_path=None, checkpoint_every=500,
                      mesh="auto", fetch="numpy"):
    """Joint PSF photometry of many stars in one compiled program.

    Args:
        data, noisemap: (S, N, n, n) — S stars, N epochs each (pad
            missing epochs with data 0 / noise 1e7; padding epochs are
            detected from the noise level and exactly masked out of the
            loss and the regularization statistics).
        psf: (S, N, mp, mp) narrow PSFs.  Pad missing epochs by
            REPEATING any real PSF (all-zero pads are tolerated — the
            normalization guards the 0/0 — but a real PSF keeps the
            dummy epochs' spectra well-conditioned).
        subsampling_factor: int s.
        checkpoint_path: when set, the AdaBelief loop runs in
            ``checkpoint_every``-iteration segments with the optimizer
            carry checkpointed to this path (resume on re-call); when
            None (default) the whole fit is one compiled program.
        fetch: "numpy" (default) materializes every result leaf to
            host numpy before returning.  "device" returns the result
            tree unmaterialized (jitted dispatch is asynchronous), so a
            caller fitting several buckets can dispatch the next one
            while the previous bucket's device->host transfer and
            store overlap the device compute — the same pattern as
            ``build_psf_batched(fetch="device")`` / the pipelined PSF
            store in processes/psf_modelling.py.  Not compatible with
            ``checkpoint_path`` (segments synchronize anyway).
        mesh: "auto" (default) picks the production mesh for the star
            count (parallel/batch.auto_fit_mesh): a 1-D ``batch`` mesh
            when there are at least as many stars as devices (per-star
            fits are independent: collective-free pure data
            parallelism), a 2-D (``batch``, ``epoch``) mesh when stars
            are fewer than devices — the monitoring configuration of a
            handful of stars x hundreds of epochs — so spare chips
            shard each star's epoch axis instead of idling (XLA
            inserts the per-star cross-shard reductions).  None forces
            single-device; explicit meshes of either shape are
            accepted.  Star counts that do not divide the batch extent
            are padded with duplicate stars, epoch counts that do not
            divide the epoch extent with standard dummy epochs; both
            pads are stripped from the result.

    Returns:
        dict of stacked per-star results (numpy), matching the
        single-star ``do_one_star_forward_modelling`` surface.
    """
    data = np.asarray(data, dtype=np.float32)
    noisemap = np.asarray(noisemap, dtype=np.float32)
    # JOINT sanitization: a NaN datum with finite noise must not enter
    # the fit (or the GLS polish / Fisher errors) as a zero-flux
    # measurement at full weight — bad pixels get data 0 AND noise 1e7
    # (per-pixel inflation cannot flip an epoch to dummy: epoch
    # detection requires ALL pixels >= 1e6)
    bad = ~(np.isfinite(data) & np.isfinite(noisemap))
    data = np.where(bad, np.float32(0.0), data)
    noisemap = np.where(bad, np.float32(1e7), noisemap)
    # the PSF must be finite too: a single NaN PSF pixel would propagate
    # through the spectra into NaN models, and the nansum VJP would emit
    # NaN cotangents into the SHARED parameters (the same failure mode
    # the all-zero-pad guard in _prepare_one_star prevents) — the star
    # would silently return its init and the GLS polish would NaN
    psf = np.nan_to_num(np.asarray(psf, dtype=np.float32))
    n_stars, n_epochs_real, image_size = data.shape[:3]
    from ...ops import get_dft_precision, get_irfft_backend
    from ...parallel.batch import (EPOCH_AXIS, auto_fit_mesh,
                                   pad_epoch_axis,
                                   shard_star_fit_arrays, strip_batch,
                                   strip_epoch_axis)

    if mesh == "auto":
        mesh = auto_fit_mesh(n_stars)
    # keys are split for the REAL star count and padded like the data
    # (splitting for the padded count would change the real stars' keys)
    keys = np.asarray(jax.random.split(jax.random.PRNGKey(seed),
                                       n_stars))
    n_epoch_pad = 0
    if mesh is not None and mesh.size > 1:
        if EPOCH_AXIS in mesh.axis_names:
            data, noisemap, psf, n_epoch_pad = pad_epoch_axis(
                data, noisemap, psf, mesh.shape[EPOCH_AXIS])
        (data_d, noise_d, psf_d, keys), n_pad = shard_star_fit_arrays(
            mesh, data, noisemap, psf, keys)
    else:
        data_d, noise_d, psf_d = (jnp.asarray(data),
                                  jnp.asarray(noisemap),
                                  jnp.asarray(psf))
        n_pad = 0
    n_epochs = n_epochs_real + n_epoch_pad

    # a sharded mesh forces the matmul-DFT backend: the FFT op cannot
    # be partitioned (XLA all-gathers around it, and the XLA:CPU fft
    # thunk rejects partitioner-produced layouts outright)
    irfft_backend = "mxu" if (mesh is not None and mesh.size > 1) \
        else get_irfft_backend()
    # the starlet backend travels as a STATIC argument read OUTSIDE
    # the trace (module convention: flipping ops.set_backend retraces
    # instead of silently reusing the stale program).  On a sharded
    # mesh the Pallas starlet is forced off: it has no partitioning
    # rule, so a partitioned program containing it fails to compile
    # (same guard as irfft_backend above)
    from ...ops import get_backend as _get_starlet_backend

    starlet_backend = "xla" if (mesh is not None and mesh.size > 1) \
        else _get_starlet_backend()
    args = (data_d, noise_d, psf_d, keys,
            int(n_epochs), int(image_size), int(subsampling_factor),
            int(n_iter), bool(uniform_background_per_epoch),
            bool(starlet_global_background), float(lr),
            irfft_backend, get_dft_precision(), starlet_backend)
    if checkpoint_path is None:
        out = _fit_stars(*args)
    else:
        from ..optimize import arrays_digest

        # the digest also covers the fit flags: a flag flip changes the
        # carry structure/meaning under unchanged data, and must refuse
        # the resume with the friendly digest message (the structural
        # check in _load_ckpt_carry is the backstop)
        flag_bytes = np.frombuffer(
            (f"{bool(uniform_background_per_epoch)}:"
             f"{bool(starlet_global_background)}:{float(lr)}:"
             f"{starlet_backend}").encode(),
            dtype=np.uint8)
        out = _fit_stars_checkpointed(
            *args, checkpoint_path=checkpoint_path,
            checkpoint_every=checkpoint_every,
            inputs_digest=arrays_digest(data, noisemap, psf, flag_bytes))
    from ...parallel.batch import gather_to_host

    # "auto" was already resolved to a Mesh or None above
    out = gather_to_host(mesh, out)
    out = strip_epoch_axis(strip_batch(out, n_pad), n_epoch_pad)
    if fetch == "device":
        # strips are lazy slices; nothing has forced a transfer yet
        return out
    return jax.tree_util.tree_map(np.asarray, out)
