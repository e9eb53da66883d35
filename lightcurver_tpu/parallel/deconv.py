"""Epoch-sharded joint deconvolution: pjit over a 1-D ``epoch`` mesh.

The joint multi-epoch fit couples per-epoch parameters (fluxes ``a``,
pointing offsets ``dx/dy``, rotations ``alpha``, pedestals ``mean``) to
shared parameters (pixelated background ``h``, source sky positions
``c_x/c_y``) through a sum of per-epoch chi² terms plus regularization on
``h``.  That structure maps onto a TPU pod slice as:

- data / noise / per-epoch PSF spectra / per-epoch params: SHARDED along
  the ``epoch`` mesh axis,
- ``h``, ``c_x``, ``c_y``: REPLICATED; their gradients are an implicit
  all-reduce that XLA lowers to a psum over ICI.

No shard_map is needed — the loss is written as plain batched jnp ops
(core/deconv/model.py), so committed input shardings plus XLA's sharding
propagation produce the collective schedule.  The reference has no analog
(it stacks all epochs on one device, reference
processes/roi_modelling.py:154-178); this module is what makes the
1000-epoch configuration feasible.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.deconv.model import setup_model
from ..core.deconv.loss import Loss
from ..core.params import Params
from .mesh import EPOCH_AXIS

# kwargs leaves with a leading epoch dimension ('a' is epoch-major flat)
_PER_EPOCH_KEYS = frozenset({"a", "dx", "dy", "alpha", "mean"})


def _key_name(path):
    last = path[-1]
    return getattr(last, "key", getattr(last, "name", None))


def param_shardings(mesh, tree):
    """Per-leaf NamedShardings: per-epoch leaves on ``epoch``, rest replicated."""
    epoch = NamedSharding(mesh, P(EPOCH_AXIS))
    repl = NamedSharding(mesh, P())

    def spec(path, leaf):
        del leaf
        return epoch if _key_name(path) in _PER_EPOCH_KEYS else repl

    return jax.tree_util.tree_map_with_path(spec, tree)


def shard_pytree(mesh, tree):
    """device_put a kwargs pytree with :func:`param_shardings`."""
    return jax.device_put(tree, param_shardings(mesh, tree))


def pad_epoch_stacks(data, sigma_2, psf, n_devices, var_pad=1e16):
    """Pad (data, sigma_2, psf) epoch stacks to a multiple of n_devices.

    Dummy epochs get zero data, huge noise variance and a copy of the
    last real epoch's PSF (so spectra stay well-conditioned).  Returns
    ``(data_p, sigma_2_p, psf_p, epoch_w)`` where ``epoch_w`` is the
    (N_padded,) 1/0 mask that core Loss applies to every per-epoch term
    — dummy epochs contribute EXACTLY zero, so a padded fit reproduces
    the unpadded one bit-for-bit on the real epochs.
    """
    n = data.shape[0]
    n_pad = (-n) % int(n_devices)
    epoch_w = np.concatenate(
        [np.ones(n, np.float32), np.zeros(n_pad, np.float32)])
    if n_pad == 0:
        return data, sigma_2, psf, epoch_w
    zeros = np.zeros((n_pad,) + data.shape[1:], dtype=np.float32)
    data_p = np.concatenate([np.asarray(data, np.float32), zeros])
    sigma_2_p = np.concatenate(
        [np.asarray(sigma_2, np.float32), np.full_like(zeros, var_pad)])
    psf_p = np.concatenate(
        [np.asarray(psf, np.float32),
         np.repeat(np.asarray(psf, np.float32)[-1:], n_pad, axis=0)])
    return data_p, sigma_2_p, psf_p, epoch_w


_PER_EPOCH_VEC = frozenset({"dx", "dy", "alpha", "mean"})


def pad_epoch_kwargs(kwargs, n_real, n_pad, n_sources):
    """Extend per-epoch leaves of a kwargs pytree by n_pad dummy epochs.

    ``a`` (epoch-major flat, length n_real * n_sources) is padded with
    each source's mean flux so the masked flux-uniformity and positivity
    terms are untouched; ``dx/dy/alpha/mean`` pad with zeros.  Leaves of
    other names/shapes pass through unchanged.
    """
    if n_pad == 0:
        return kwargs
    out = {}
    for k, v in kwargs.items():
        if isinstance(v, dict):
            out[k] = pad_epoch_kwargs(v, n_real, n_pad, n_sources)
        elif k == "a" and np.size(v) == n_real * n_sources:
            a = np.asarray(v, np.float32).reshape(n_real, n_sources)
            fill = np.broadcast_to(a.mean(axis=0), (n_pad, n_sources))
            out[k] = jnp.asarray(
                np.concatenate([a, fill]).ravel())
        elif k in _PER_EPOCH_VEC and np.shape(v) == (n_real,):
            out[k] = jnp.asarray(np.concatenate(
                [np.asarray(v, np.float32), np.zeros(n_pad, np.float32)]))
        else:
            out[k] = v
    return out


def strip_epoch_kwargs(kwargs, n_real, n_pad, n_sources):
    """Inverse of :func:`pad_epoch_kwargs`: drop the dummy epochs."""
    if n_pad == 0:
        return kwargs
    n_all = n_real + n_pad
    out = {}
    for k, v in kwargs.items():
        if isinstance(v, dict):
            out[k] = strip_epoch_kwargs(v, n_real, n_pad, n_sources)
        elif k == "a" and np.size(v) == n_all * n_sources:
            out[k] = jnp.asarray(np.asarray(v).reshape(
                n_all, n_sources)[:n_real].ravel())
        elif k in _PER_EPOCH_VEC and np.shape(v) == (n_all,):
            out[k] = jnp.asarray(np.asarray(v)[:n_real])
        else:
            out[k] = v
    return out


_EPOCH_CONST_KEYS = frozenset({"data", "sigma_2", "ps_hat", "grid_hat",
                               "t_re", "t_im", "epoch_w",
                               "fixed_h_render"})


def shard_consts(mesh, consts):
    """Place a Loss consts bundle onto the mesh.

    Epoch-stacked arrays (data, noise variance, per-epoch PSF spectra) are
    sharded along ``epoch``; regularization weights are replicated; the
    ``fixed`` parameter pytree follows the per-leaf parameter rules.
    """
    epoch = NamedSharding(mesh, P(EPOCH_AXIS))
    repl = NamedSharding(mesh, P())
    out = {}
    for key, val in consts.items():
        if key == "fixed":
            out[key] = shard_pytree(mesh, val)
        elif key in _EPOCH_CONST_KEYS:
            out[key] = jax.device_put(val, epoch)
        else:
            out[key] = jax.device_put(val, repl)
    return out


def sharded_deconv_step(loss, params, learning_rate=1e-3):
    """One jitted AdaBelief train step over whatever mesh the inputs live on.

    Returns ``(step_fn, opt_state0)`` where
    ``step_fn(free, opt_state, consts, lower, upper) ->
    (free, opt_state, loss_value)``.  The bounds travel as ARGUMENTS —
    never closure constants — per the TPU consts contract
    (core/optimize.py module docstring).  Used by the multi-chip dry
    run and by callers that need custom stepping; the production path
    is :func:`fit_deconv_sharded`.
    """
    opt = optax.adabelief(learning_rate=learning_rate)
    opt_state0 = opt.init(params.free0)

    @jax.jit
    def step(free, opt_state, consts, lower, upper):
        value, grad = jax.value_and_grad(loss.loss_fn)(free, consts)
        updates, opt_state = opt.update(grad, opt_state, free)
        free = optax.apply_updates(free, updates)
        free = jax.tree_util.tree_map(jnp.clip, free, lower, upper)
        return free, opt_state, value

    return step, opt_state0


def fit_deconv_sharded(data, sigma_2, psf, xs, ys, subsampling_factor, mesh,
                       kwargs_fixed=None, n_iter=2000, initial_a=None,
                       init_learning_rate=1e-2, loss_kwargs=None):
    """End-to-end epoch-sharded joint deconvolution fit.

    Args:
        data, sigma_2: (N, n, n) stamps and noise variance.
        psf: (N, mp, mp) per-epoch narrow PSFs.
        xs, ys: (M,) initial source positions (data px, center origin).
        subsampling_factor: int s.
        mesh: 1-D mesh from :func:`..parallel.mesh.epoch_mesh`; any N
            works — non-divisible epoch counts are padded internally with
            zero-weight dummy epochs (:func:`pad_epoch_stacks`) whose
            loss contribution is exactly masked out, and stripped from
            the returned kwargs.
        kwargs_fixed: fixed-parameter spec (default: the setup_model one).
        n_iter: AdaBelief iterations (loss history has exactly this many
            entries, matching the reference optimizer contract).
        loss_kwargs: extra keyword args forwarded to core Loss
            (regularization strengths, W, prior, ...).

    Returns:
        (kwargs_best, model, loss_history) — kwargs and model are sized
        for the REAL epoch count.
    """
    n_real = data.shape[0]
    n_sources = np.atleast_1d(np.asarray(xs)).size
    data_p, sigma_2_p, psf_p, epoch_w = pad_epoch_stacks(
        np.asarray(data, np.float32), np.asarray(sigma_2, np.float32),
        np.asarray(psf, np.float32), mesh.size)
    n_pad = data_p.shape[0] - n_real
    if initial_a is not None and n_pad:
        initial_a = np.asarray(initial_a, np.float32).ravel()
        if initial_a.size == n_real * n_sources:
            initial_a = np.asarray(pad_epoch_kwargs(
                {"a": initial_a}, n_real, n_pad, n_sources)["a"])
    if kwargs_fixed is not None and n_pad:
        kwargs_fixed = pad_epoch_kwargs(kwargs_fixed, n_real, n_pad,
                                        n_sources)
    model_p, kwargs_init, kwargs_up, kwargs_down, default_fixed = setup_model(
        data_p, sigma_2_p, psf_p, xs, ys, subsampling_factor,
        initial_a=initial_a)

    params = Params(kwargs_init,
                    kwargs_fixed if kwargs_fixed is not None else default_fixed,
                    kwargs_up, kwargs_down)
    params.free0 = shard_pytree(mesh, params.free0)
    params.fixed = shard_pytree(mesh, params.fixed)
    params.lower = shard_pytree(mesh, params.lower)
    params.upper = shard_pytree(mesh, params.upper)

    loss_kwargs = dict(loss_kwargs or {})
    if mesh.size > 1:
        # the FFT op cannot be batch-partitioned (XLA all-gathers the
        # full epoch stack around every transform); force the matmul-DFT
        # render so the sharded program stays collective-free apart
        # from the shared-gradient psum (same guard as the batched
        # PSF/star entry points).  The Pallas starlet likewise has no
        # partitioning rule — keep the XLA transform in the partitioned
        # program regardless of the global flag.
        loss_kwargs.setdefault("irfft_backend", "mxu")
        loss_kwargs.setdefault("starlet_backend", "xla")
    loss = Loss(data_p, model_p, params, sigma_2_p, epoch_weights=epoch_w,
                **loss_kwargs)
    # assign BACK to the loss: keeping the unsharded bundle referenced
    # would pin a full-N copy of data + spectra on one device for the
    # whole fit
    consts = loss.consts = shard_consts(mesh, loss.consts)

    from ..core.optimize import run_adabelief

    best, _, history = run_adabelief(
        loss.loss_fn, params.free0, params.lower, params.upper, n_iter,
        init_learning_rate=init_learning_rate, consts=consts)
    params.set_best(best)
    from .batch import gather_to_host

    # multi-host: epoch-sharded result leaves span non-addressable
    # devices; every process gathers before materializing (no-op on a
    # single process)
    kwargs_best = strip_epoch_kwargs(
        gather_to_host(mesh, params.best_fit_values(as_kwargs=True)),
        n_real, n_pad, n_sources)
    if n_pad:
        from ..core.deconv.model import DeconvModel

        model = DeconvModel(psf, subsampling_factor, data.shape[-1],
                            n_real, n_sources)
    else:
        model = model_p
    return kwargs_best, model, np.asarray(history)
