"""Fixed-iteration optimizers as jitted lax.scan loops.

Two methods, mirroring the reference's Optimizer(method='adabelief' |
'l-bfgs-b') usage (reference processes/star_photometry.py:113-122,
processes/roi_modelling.py:278,326-334):

- AdaBelief (optax) with optional exponential learning-rate decay,
- bounded L-BFGS: optax.lbfgs with zoom linesearch + projection onto the
  box bounds after each step (the reference relies on scipy's Fortran
  L-BFGS-B; a jit-compatible projected quasi-Newton replaces it).

Both run EXACTLY n_iter iterations and return a loss history with EXACTLY
n_iter entries — the reference pins this contract in
tests/test_starred_calls/test_starred_calls.py:58 (no early stopping).

The whole loop (not just one step) is compiled: a full 2000-iteration
joint deconvolution is a single XLA program, so per-step host latency is
zero and the scan body fuses.

TPU contract: the loss is ``loss_fn(free, consts)`` and every array it
touches (data, noise maps, PSF spectra, regularization weights, fixed
parameters) must arrive through the ``consts`` pytree, which is a runtime
ARGUMENT of the compiled program.  Arrays captured as closure constants
get embedded into the HLO and drive this environment's TPU compiler into
pathological behaviour (minutes-to-hours compiles / UNIMPLEMENTED) —
measured, not theoretical.
"""

import functools

import jax
import jax.numpy as jnp
import optax


def _project(params, lower, upper):
    return jax.tree_util.tree_map(jnp.clip, params, lower, upper)


def make_adabelief(n_iter, init_learning_rate, schedule_learning_rate):
    """The optax AdaBelief transform used everywhere (one construction
    point so the lr schedule of a segmented/checkpointed run spans the
    FULL n_iter, matching the uninterrupted trajectory)."""
    if schedule_learning_rate:
        lr = optax.exponential_decay(init_learning_rate, max(n_iter, 1),
                                     0.01)
    else:
        lr = init_learning_rate
    return optax.adabelief(learning_rate=lr)


def adabelief_step_fn(loss_fn, opt, consts, lower, upper):
    """One best-tracking projected AdaBelief step, as a lax.scan body.

    Carry: (params, opt_state, best_params, best_loss).
    """
    vg = jax.value_and_grad(loss_fn)

    def step(carry, _):
        params, opt_state, best_params, best_loss = carry
        value, grad = vg(params, consts)
        improved = value < best_loss
        best_loss = jnp.where(improved, value, best_loss)
        best_params = jax.tree_util.tree_map(
            lambda b, p: jnp.where(improved, p, b), best_params, params)
        updates, opt_state = opt.update(grad, opt_state, params)
        params = _project(optax.apply_updates(params, updates), lower, upper)
        return (params, opt_state, best_params, best_loss), value

    return step


def adabelief_scan(loss_fn, free0, consts, lower, upper, n_iter,
                   init_learning_rate, schedule_learning_rate):
    """AdaBelief scan body (traceable: vmap/jit/shard_map-compatible).

    Args:
        loss_fn: (free pytree, consts pytree) -> scalar loss (static).
        free0: initial free pytree.
        consts: pytree of arrays the loss needs (runtime argument).
        lower, upper: bounds pytrees matching free0.
        n_iter: static number of iterations.
        init_learning_rate: initial lr.
        schedule_learning_rate: if True, exponential decay to 1% of the
            initial rate over the run (matching the reference's
            schedule_learning_rate=True behaviour).

    Returns:
        (best_free, final_free, loss_history[n_iter])
    """
    opt = make_adabelief(n_iter, init_learning_rate,
                         schedule_learning_rate)
    step = adabelief_step_fn(loss_fn, opt, consts, lower, upper)
    init = (free0, opt.init(free0), free0,
            jnp.asarray(jnp.inf, dtype=jnp.float32))
    (final_params, _, best_params, _), history = jax.lax.scan(
        step, init, None, length=n_iter)
    return best_params, final_params, history


_run_adabelief = jax.jit(
    adabelief_scan,
    static_argnames=("loss_fn", "n_iter", "schedule_learning_rate"))


def adabelief_scan_extended(loss_fn, free0, consts, lower, upper, n_iter,
                            init_learning_rate, schedule_learning_rate,
                            stop_at_loss_increase, min_iterations,
                            n_param_snapshots):
    """AdaBelief with the reference's optional optimizer semantics.

    Used only when the caller requests ``stop_at_loss_increase`` /
    ``min_iterations`` / ``return_param_history`` (reference call sites:
    processes/star_photometry.py:113-122); the default path stays the
    lean :func:`adabelief_scan`.

    - stop_at_loss_increase: once the loss exceeds the previous
      iteration's value (after ``min_iterations``), parameter updates
      FREEZE.  The loss history still has exactly n_iter entries (XLA
      shapes are static) — the tail is constant after the stop; the
      returned ``stopped_at`` gives the effective iteration count.
    - n_param_snapshots > 0: a ring of parameter snapshots taken every
      ``n_iter // n_param_snapshots`` iterations (subsampled history —
      full per-step history of the background grid would be GBs).

    Returns:
        (best_free, final_free, history[n_iter], stopped_at,
         param_snapshots or None, snapshot_iterations or None)
    """
    opt = make_adabelief(n_iter, init_learning_rate,
                         schedule_learning_rate)
    vg = jax.value_and_grad(loss_fn)
    snap_every = max(1, n_iter // n_param_snapshots) \
        if n_param_snapshots else 1
    n_snap = min(n_param_snapshots, n_iter) if n_param_snapshots else 0

    def snap_buf0():
        return jax.tree_util.tree_map(
            lambda x: jnp.zeros((n_snap,) + jnp.shape(x),
                                jnp.result_type(x)), free0)

    def step(carry, it):
        (params, opt_state, best_params, best_loss, prev_loss, stopped,
         stopped_at, buf, buf_it) = carry
        value, grad = vg(params, consts)
        improved = value < best_loss
        best_loss = jnp.where(improved, value, best_loss)
        best_params = jax.tree_util.tree_map(
            lambda b, p: jnp.where(improved, p, b), best_params, params)

        trigger = (jnp.asarray(stop_at_loss_increase)
                   & (it >= min_iterations) & (value > prev_loss))
        newly_stopped = trigger & ~stopped
        stopped_at = jnp.where(newly_stopped, it, stopped_at)
        stopped = stopped | trigger

        updates, opt_state_new = opt.update(grad, opt_state, params)
        params_new = _project(optax.apply_updates(params, updates),
                              lower, upper)
        params = jax.tree_util.tree_map(
            lambda old, new: jnp.where(stopped, old, new), params,
            params_new)
        opt_state = jax.tree_util.tree_map(
            lambda old, new: jnp.where(stopped, old, new), opt_state,
            opt_state_new)

        if n_snap:
            idx = jnp.minimum(it // snap_every, n_snap - 1)
            take = (it % snap_every) == 0
            buf = jax.tree_util.tree_map(
                lambda b, p: jax.lax.dynamic_update_index_in_dim(
                    b, jnp.where(take, p, b[idx]), idx, 0), buf, params)
            buf_it = jax.lax.dynamic_update_index_in_dim(
                buf_it, jnp.where(take, it, buf_it[idx]), idx, 0)

        return (params, opt_state, best_params, best_loss, value,
                stopped, stopped_at, buf, buf_it), value

    init = (free0, opt.init(free0), free0,
            jnp.asarray(jnp.inf, jnp.float32),
            jnp.asarray(jnp.inf, jnp.float32),
            jnp.asarray(False), jnp.asarray(n_iter, jnp.int32),
            snap_buf0() if n_snap else (),
            jnp.zeros(n_snap, jnp.int32) if n_snap else ())
    (final_params, _, best_params, _, _, _, stopped_at, buf,
     buf_it), history = jax.lax.scan(step, init,
                                     jnp.arange(n_iter, dtype=jnp.int32))
    return (best_params, final_params, history, stopped_at,
            buf if n_snap else None, buf_it if n_snap else None)


_run_adabelief_extended = jax.jit(
    adabelief_scan_extended,
    static_argnames=("loss_fn", "n_iter", "schedule_learning_rate",
                     "stop_at_loss_increase", "min_iterations",
                     "n_param_snapshots"))


def run_adabelief(loss_fn, free0, lower, upper, n_iter,
                  init_learning_rate=1e-3, schedule_learning_rate=True,
                  consts=None):
    """AdaBelief with box projection; see module docstring.

    ``loss_fn(free, consts)`` when ``consts`` is given, else a legacy
    single-argument ``loss_fn(free)`` is wrapped (CPU-only paths).

    Returns:
        (best_free, final_free, loss_history[n_iter])
    """
    if consts is None:
        fn, consts = _wrap_legacy(loss_fn), ()
    else:
        fn = loss_fn
    return _run_adabelief(
        loss_fn=fn, free0=free0, consts=consts, lower=lower, upper=upper,
        n_iter=int(n_iter), init_learning_rate=init_learning_rate,
        schedule_learning_rate=bool(schedule_learning_rate))


def lbfgsb_scan(loss_fn, free0, consts, lower, upper, n_iter,
                memory_size=10, max_linesearch_steps=6,
                exact_bounds=True):
    """Projected L-BFGS scan body (traceable; zoom linesearch inside).

    max_linesearch_steps caps the zoom linesearch (optax default 20).
    Measured on the v5e chip the cap does NOT change the average wall
    time (the while_loop exits early anyway) but it bounds the worst
    case; convergence is unchanged
    (tests/test_lbfgsb_scipy_parity.py still reaches scipy's minimum).

    Bound handling (projected quasi-Newton): when the box projection
    actually clips a step, the next iteration's cached linesearch
    value/grad (optax value_and_grad_from_state) refer to the
    pre-projection point.  With ``exact_bounds=True`` (default) the
    pair is recomputed at the projected point via lax.cond — free when
    no bound is active, and only when one IS active does it cost one
    extra loss+grad.  Under vmap the cond batches to a select that pays
    that extra evaluation EVERY iteration, so the vmapped batched-PSF
    caller opts out (bounds are inactive on its production fits; the
    scipy-parity suite bounds the approximation there, and AdaBelief +
    the exact GLS flux polish run afterwards regardless).

    Returns:
        (best_free, final_free, loss_history[n_iter])
    """
    opt = optax.lbfgs(
        memory_size=memory_size,
        linesearch=optax.scale_by_zoom_linesearch(
            max_linesearch_steps=max_linesearch_steps,
            initial_guess_strategy="one"))
    opt_state = opt.init(free0)

    def bound_loss(params):
        return loss_fn(params, consts)

    value_and_grad = optax.value_and_grad_from_state(bound_loss)

    def step(carry, _):
        params, opt_state, best_params, best_loss, clipped_prev = carry
        value, grad = value_and_grad(params, state=opt_state)
        if exact_bounds:
            # the cached pair refers to the pre-projection point when
            # the previous step clipped: recompute at the actual params
            value, grad = jax.lax.cond(
                clipped_prev,
                lambda p: jax.value_and_grad(bound_loss)(p),
                lambda p: (value, grad), params)
        improved = value < best_loss
        best_loss = jnp.where(improved, value, best_loss)
        best_params = jax.tree_util.tree_map(
            lambda b, p: jnp.where(improved, p, b), best_params, params)
        updates, opt_state = opt.update(
            grad, opt_state, params, value=value, grad=grad,
            value_fn=bound_loss)
        raw = optax.apply_updates(params, updates)
        params = _project(raw, lower, upper)
        clipped = jax.tree_util.tree_reduce(
            jnp.logical_or,
            jax.tree_util.tree_map(lambda a, b: jnp.any(a != b), raw,
                                   params),
            jnp.asarray(False))
        return (params, opt_state, best_params, best_loss, clipped), value

    init = (free0, opt_state, free0,
            jnp.asarray(jnp.inf, dtype=jnp.float32),
            jnp.asarray(False))
    (final_params, _, best_params, _, _), history = jax.lax.scan(
        step, init, None, length=n_iter)
    return best_params, final_params, history


_run_lbfgsb = jax.jit(
    lbfgsb_scan, static_argnames=("loss_fn", "n_iter", "memory_size",
                                  "max_linesearch_steps",
                                  "exact_bounds"))


def run_lbfgsb(loss_fn, free0, lower, upper, n_iter, memory_size=10,
               consts=None):
    """Projected L-BFGS with zoom linesearch; see module docstring.

    Returns:
        (best_free, final_free, loss_history[n_iter])
    """
    if consts is None:
        fn, consts = _wrap_legacy(loss_fn), ()
    else:
        fn = loss_fn
    return _run_lbfgsb(loss_fn=fn, free0=free0, consts=consts, lower=lower,
                       upper=upper, n_iter=int(n_iter),
                       memory_size=int(memory_size))


@functools.lru_cache(maxsize=32)
def _wrap_legacy(loss_fn):
    """Adapt a single-argument loss to the (free, consts) signature.

    Cached so repeat calls reuse the jit cache entry; BOUNDED because
    each entry pins the loss closure (and every array it captured) plus
    a jit program — an unbounded cache leaks linearly in a long-lived
    process looping over per-object legacy fits.
    """
    def fn(free, consts):
        del consts
        return loss_fn(free)
    return fn


class Optimizer:
    """API-parity wrapper bundling a Loss, a Params and a method.

    Mirrors the reference's STARRED Optimizer usage
    (processes/star_photometry.py:113-122, processes/roi_modelling.py:278,
    326-334): construct with ``method='adabelief' | 'l-bfgs-b'``, call
    ``minimize(...)``, read ``loss_history``; the bound Params object is
    updated so ``parameters.best_fit_values(as_kwargs=True)`` returns the
    optimized kwargs.
    """

    def __init__(self, loss, parameters, method="adabelief"):
        self.loss = loss
        self.parameters = parameters
        self.method = method
        self.loss_history = None

    def minimize(self, maxiter=None, max_iterations=None, min_iterations=None,
                 init_learning_rate=1e-3, schedule_learning_rate=True,
                 restart_from_init=False, stop_at_loss_increase=False,
                 progress_bar=False, return_param_history=False,
                 checkpoint_path=None, checkpoint_every=500,
                 checkpoint_inputs_digest=None):
        import time

        del progress_bar  # terminal progress is the host logger's job
        n_iter = int(max_iterations if max_iterations is not None else maxiter)
        p = self.parameters
        free0 = p.free0 if restart_from_init else p.best_fit_values(
            as_kwargs=False)
        consts = getattr(self.loss, "consts", None)
        loss_fn = self.loss.loss_fn
        self._checkpoint_path = checkpoint_path
        self._checkpoint_every = checkpoint_every
        self._checkpoint_digest = checkpoint_inputs_digest
        self._stop_at_loss_increase = bool(stop_at_loss_increase)
        self._min_iterations = int(min_iterations or 0)
        self._return_param_history = bool(return_param_history)
        if self.method != "adabelief" and (self._stop_at_loss_increase
                                           or self._return_param_history):
            # loudly reject rather than silently drop (round-1 verdict)
            raise ValueError(
                "stop_at_loss_increase / return_param_history are only "
                "implemented for method='adabelief'")
        if checkpoint_path is not None and (self._stop_at_loss_increase
                                            or self._return_param_history):
            raise ValueError(
                "checkpoint_path cannot be combined with "
                "stop_at_loss_increase / return_param_history (the "
                "extended optimizer path has no checkpointing)")
        t0 = time.time()

        # optional profiler hook: set LIGHTCURVER_JAX_PROFILE_DIR to
        # capture a jax/XLA trace of the optimization
        import contextlib
        import os

        profile_dir = os.environ.get("LIGHTCURVER_JAX_PROFILE_DIR")
        if profile_dir:
            import jax

            profile_cm = jax.profiler.trace(profile_dir)
        else:
            profile_cm = contextlib.nullcontext()
        with profile_cm:
            return self._minimize_inner(
                loss_fn, free0, n_iter, init_learning_rate,
                schedule_learning_rate, consts, return_param_history, t0)

    def _minimize_inner(self, loss_fn, free0, n_iter, init_learning_rate,
                        schedule_learning_rate, consts,
                        return_param_history, t0):
        import time

        p = self.parameters
        stopped_at = None
        param_snaps = snap_iters = None
        use_extended = (self._stop_at_loss_increase
                        or self._return_param_history)
        if self.method == "adabelief" and use_extended:
            if consts is None:
                fn, consts_ = _wrap_legacy(loss_fn), ()
            else:
                fn, consts_ = loss_fn, consts
            best, final, hist, stopped_at, param_snaps, snap_iters = \
                _run_adabelief_extended(
                    loss_fn=fn, free0=free0, consts=consts_,
                    lower=p.lower, upper=p.upper, n_iter=n_iter,
                    init_learning_rate=init_learning_rate,
                    schedule_learning_rate=bool(schedule_learning_rate),
                    stop_at_loss_increase=self._stop_at_loss_increase,
                    min_iterations=self._min_iterations,
                    n_param_snapshots=(
                        64 if self._return_param_history else 0))
        elif self.method == "adabelief":
            if self._checkpoint_path is not None:
                best, final, hist = run_adabelief_checkpointed(
                    loss_fn, free0, p.lower, p.upper, n_iter,
                    checkpoint_path=self._checkpoint_path,
                    init_learning_rate=init_learning_rate,
                    schedule_learning_rate=schedule_learning_rate,
                    consts=consts,
                    checkpoint_every=self._checkpoint_every,
                    inputs_digest=self._checkpoint_digest)
            else:
                best, final, hist = run_adabelief(
                    loss_fn, free0, p.lower, p.upper, n_iter,
                    init_learning_rate=init_learning_rate,
                    schedule_learning_rate=schedule_learning_rate,
                    consts=consts)
        elif self.method in ("l-bfgs-b", "lbfgsb", "l-bfgs"):
            best, final, hist = run_lbfgsb(
                loss_fn, free0, p.lower, p.upper, n_iter, consts=consts)
        else:
            raise ValueError(f"unknown method {self.method!r}")
        runtime = time.time() - t0
        import numpy as np

        hist = np.asarray(hist)
        self.loss_history = hist
        p.set_best(best)
        best_kwargs = p.best_fit_values(as_kwargs=True)
        # all-NaN histories (a degenerate fit) must report logL=nan for
        # per-fit flagging, not crash the whole task on nanargmin
        logL = (float(np.nanmin(hist))
                if hist.size and np.isfinite(hist).any() else float("nan"))
        extra_fields = {"loss_history": hist}
        if stopped_at is not None:
            extra_fields["stopped_at"] = int(stopped_at)
        if return_param_history:
            # subsampled FREE-pytree snapshots (leading snapshot axis)
            # with the iterations they were taken at
            extra_fields["param_history"] = jax.tree_util.tree_map(
                np.asarray, param_snaps)
            extra_fields["param_history_iterations"] = \
                np.asarray(snap_iters)
        return best_kwargs, logL, extra_fields, runtime


def arrays_digest(*arrays):
    """sha256 over the shapes + bytes of host arrays.

    Used to stamp checkpoints with the identity of the fit's inputs, so
    a resume against CHANGED data (re-run PSFs, recalibrated frames) is
    refused instead of silently continuing from a carry optimized
    against the old data.
    """
    import hashlib

    import numpy as np

    h = hashlib.sha256()
    for arr in arrays:
        arr = np.ascontiguousarray(arr)
        h.update(str(arr.shape).encode())
        h.update(str(arr.dtype).encode())
        h.update(arr.tobytes())
    return h.hexdigest()


class CheckpointMismatch(ValueError):
    """A mid-fit checkpoint cannot be resumed against the current fit
    (changed inputs/budget/parameter structure, or a corrupted file).

    ValueError subclass so direct API users' existing handlers keep
    working; the pipeline tasks catch THIS type specifically
    (utilities/checkpoints.run_discarding_stale_checkpoint) to discard
    the stale file and restart — string-matching the message was
    fragile (a corrupted npz raises messages with no path in them)."""


def _check_ckpt_digest(path, stored, expected):
    if expected is None:
        return
    stored = None if stored is None else str(stored)
    if stored != expected:
        raise CheckpointMismatch(
            f"checkpoint {path} was recorded for different input data "
            f"(digest {stored} != {expected}); the upstream products "
            "changed since the interrupted fit — delete the checkpoint "
            "to restart from scratch")


def _load_ckpt_carry(z, treedef, fresh_carry_thunk, path):
    """Validate a stored flat-leaf checkpoint against the CURRENT carry
    structure — leaf count both directions and per-leaf shapes — and
    return the unflattened carry.  Shared by the single-fit and the
    batched-star checkpoint paths so a structure change (a flipped fit
    flag, a different epoch padding) is always a friendly refusal, not
    a raw KeyError or a cryptic XLA shape error."""
    n_leaves = treedef.num_leaves
    try:
        # numpy leaves: on a multi-process mesh they are re-placed via
        # device_put below; single-process, jit ingests them directly
        leaves = [z[f"leaf_{i}"] for i in range(n_leaves)]
    except KeyError as e:
        raise CheckpointMismatch(
            f"checkpoint {path} has fewer carry leaves than this "
            "problem (parameter structure changed, e.g. a fit flag "
            "flipped); refusing to resume — delete the checkpoint to "
            "restart") from e
    # shapes only — eval_shape avoids allocating a full carry
    # (params + optimizer moments) just to validate a resume
    fresh_leaves = jax.tree_util.tree_leaves(
        jax.eval_shape(fresh_carry_thunk))
    for i, (stored, fresh) in enumerate(zip(leaves, fresh_leaves)):
        if tuple(stored.shape) != tuple(fresh.shape):
            raise CheckpointMismatch(
                f"checkpoint {path} leaf {i} has shape "
                f"{tuple(stored.shape)}, expected {tuple(fresh.shape)} "
                "(epoch padding/device count or free-parameter set "
                "changed); refusing to resume — delete the checkpoint "
                "to restart")
    if f"leaf_{n_leaves}" in z:
        raise CheckpointMismatch(
            f"checkpoint {path} has more carry leaves than this "
            "problem (parameter structure changed); refusing to "
            "resume — delete the checkpoint to restart")
    carry = jax.tree_util.tree_unflatten(treedef, leaves)
    if jax.process_count() > 1:
        # the npz leaves are host-local; a cross-process jitted segment
        # rejects host-committed inputs next to mesh-sharded consts, so
        # place the resumed carry on the global mesh with the fresh
        # carry's shardings (every process loaded the same file, so
        # device_put's per-process addressable-shard slicing is
        # consistent)
        fresh = fresh_carry_thunk()
        carry = jax.device_put(
            carry,
            jax.tree_util.tree_map(lambda leaf: leaf.sharding, fresh))
    return carry


@functools.lru_cache(maxsize=8)
def _replicate_jit(mesh):
    """Cached identity-jit gathering a tree to REPLICATED on ``mesh``.

    Cached per mesh so checkpoint segments reuse one compiled gather
    instead of re-tracing a fresh ``jax.jit`` object every call."""
    from jax.sharding import NamedSharding, PartitionSpec

    return jax.jit(lambda t: t,
                   out_shardings=NamedSharding(mesh, PartitionSpec()))


def replicate_tree(tree):
    """Gather process-sharded leaves to replicated sharding (device-side).

    A leaf sharded across processes is not fully addressable and
    ``np.asarray`` on it raises — the checkpoint writers below (and the
    batched star fit's) gather first so mid-fit checkpointing works on
    pods too.  The gather is a COLLECTIVE: on a multi-process mesh
    every process must call this.  Single-process: returned unchanged,
    zero overhead.
    """
    if jax.process_count() > 1:
        from jax.sharding import NamedSharding

        mesh = next(
            (leaf.sharding.mesh for leaf in jax.tree_util.tree_leaves(tree)
             if isinstance(getattr(leaf, "sharding", None), NamedSharding)),
            None)
        if mesh is not None:
            tree = _replicate_jit(mesh)(tree)
    return tree


def materialize_tree(tree):
    """np.asarray every leaf; on multi-process meshes, gather first."""
    import numpy as np

    return jax.tree_util.tree_map(np.asarray, replicate_tree(tree))


def save_checkpoint(path, carry, n_iter, done, history,
                    inputs_digest=None):
    """Write a mid-fit checkpoint: leaves-only npz, atomic replace.

    The SINGLE writer for both the single-fit
    (:func:`run_adabelief_checkpointed`) and batched-star
    (core/deconv/batched._fit_stars_checkpointed) paths — the load side
    is already shared (_load_ckpt_carry/_check_ckpt_digest), and a
    payload-format change applied to only one writer would break
    resumes asymmetrically between them.  Sharded carries gather first
    (multi-host: a COLLECTIVE — every process must call this); only
    process 0 materializes + writes, so ``path`` must live on storage
    every process can read for a pod-scale resume to be consistent.
    """
    import os

    import numpy as np

    gathered = replicate_tree(carry)
    if jax.process_index() != 0:
        return
    leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(gathered)]
    payload = {f"leaf_{i}": leaf for i, leaf in enumerate(leaves)}
    payload["n_iter"] = np.int64(n_iter)
    payload["done"] = np.int64(done)
    payload["history"] = np.asarray(history)
    if inputs_digest is not None:
        payload["inputs_digest"] = np.str_(inputs_digest)
    tmp = str(path) + ".tmp"
    np.savez(tmp, **payload)
    # np.savez appends .npz to names without it
    os.replace(tmp if os.path.exists(tmp) else tmp + ".npz", path)


def run_adabelief_checkpointed(loss_fn, free0, lower, upper, n_iter,
                               checkpoint_path, init_learning_rate=1e-3,
                               schedule_learning_rate=True, consts=None,
                               checkpoint_every=500, inputs_digest=None):
    """AdaBelief in resumable segments with on-disk checkpoints.

    The reference has NO mid-optimization checkpointing — a killed fit
    restarts from zero (SURVEY §5).  Here the scan runs in
    ``checkpoint_every``-iteration segments; after each, the full
    optimizer carry + loss history so far are written to
    ``checkpoint_path`` as a flat ``.npz`` (leaves only — the pytree
    structure is rebuilt from a fresh carry, so loading never executes
    stored code).  A later call with the same path resumes from the last
    completed segment.  The lr schedule spans the FULL run, so a resumed
    fit follows the same trajectory as an uninterrupted one.

    A checkpoint recorded for a different ``n_iter`` is an error (the lr
    schedule and trajectory would not match): ValueError, never a silent
    restart-from-zero.  When ``inputs_digest`` is given (see
    :func:`arrays_digest`), a checkpoint recorded against different
    input data is likewise refused.

    Returns:
        (best_free, final_free, loss_history[n_iter])
    """
    import os

    import numpy as np

    n_iter = int(n_iter)
    every = int(checkpoint_every)
    if every <= 0:
        raise ValueError(
            f"checkpoint_every must be positive, got {checkpoint_every} "
            "(a non-positive segment length would loop forever)")
    opt = make_adabelief(n_iter, init_learning_rate,
                         schedule_learning_rate)

    if consts is None:
        fn, consts_ = _wrap_legacy(loss_fn), ()
    else:
        fn, consts_ = loss_fn, consts

    def fresh_carry():
        return (free0, opt.init(free0), free0,
                jnp.asarray(jnp.inf, dtype=jnp.float32))

    treedef = jax.tree_util.tree_structure(fresh_carry())

    def load_state(path):
        try:
            return _load_state_inner(path)
        except CheckpointMismatch:
            raise
        except Exception as e:  # noqa: BLE001 — truncated/garbage file
            raise CheckpointMismatch(
                f"checkpoint {path} is unreadable ({type(e).__name__}: "
                f"{e}); delete it to restart") from e

    def _load_state_inner(path):
        with np.load(path) as z:
            stored_n_iter = int(z["n_iter"])
            if stored_n_iter != n_iter:
                raise CheckpointMismatch(
                    f"checkpoint {path} was recorded for n_iter="
                    f"{stored_n_iter}, requested {n_iter}; refusing to "
                    "resume (the lr schedule would not match) — delete "
                    "the checkpoint to restart")
            _check_ckpt_digest(
                path, z["inputs_digest"] if "inputs_digest" in z
                else None, inputs_digest)
            carry = _load_ckpt_carry(z, treedef, fresh_carry, path)
            return carry, int(z["done"]), np.asarray(z["history"])

    start = 0
    carry = None
    histories = []
    if checkpoint_path is not None and os.path.exists(checkpoint_path):
        carry, done_stored, history_stored = load_state(checkpoint_path)
        if done_stored >= n_iter:
            # already complete: return the stored result
            params, _, best_params, _ = carry
            return best_params, params, history_stored[:n_iter]
        start = done_stored
        histories = [history_stored]
    if carry is None:
        carry = fresh_carry()

    @functools.partial(jax.jit, static_argnames=("length",))
    def segment(carry, consts, lo, up, length):
        # bounds as ARGUMENTS, never closure constants (module contract)
        step = adabelief_step_fn(fn, opt, consts, lo, up)
        return jax.lax.scan(step, carry, None, length=length)

    done = start
    while done < n_iter:
        length = min(every, n_iter - done)
        carry, hist = segment(carry, consts_, lower, upper, length)
        histories.append(np.asarray(hist))
        done += length
        if checkpoint_path is not None:
            save_checkpoint(checkpoint_path, carry, n_iter, done,
                            np.concatenate(histories),
                            inputs_digest=inputs_digest)

    history = np.concatenate(histories)[:n_iter]
    final_params, _, best_params, _ = carry
    return best_params, final_params, history


def relative_loss_differential(loss_history):
    """Plateau metric stored in the DB by the reference: change in the last
    10% of iterations over the initial change (reference
    processes/psf_modelling.py:205-208)."""
    import numpy as np

    lh = np.asarray(loss_history)
    idx = int(0.9 * lh.size)
    if idx == 0 or idx == lh.size:
        # a history shorter than 2 entries (smoke/debug n_iter=1) has
        # no "last 10%" to compare — report a flat plateau instead of
        # crashing the task's DB storage on a zero-size reduction
        return 0.0
    initial = np.nanmax(lh[:idx]) - np.nanmin(lh[:idx])
    end = np.nanmax(lh[idx:]) - np.nanmin(lh[idx:])
    if initial == 0:
        return 0.0
    return float(end / initial)


# a converged fit plateaus at rld ~ 1e-3; above this the last 10% of
# iterations still moved the loss by > 2% of the initial descent —
# the fixed budget ended while the optimizer was still descending
UNCONVERGED_RLD_THRESHOLD = 0.02


def warn_if_unconverged(loss_history, logger, label, budget_key,
                        threshold=UNCONVERGED_RLD_THRESHOLD):
    """Log (and return) the plateau metric; warn when it says the fixed
    iteration budget ended mid-descent.

    The reference stores ``relative_loss_differential`` silently
    (reference processes/psf_modelling.py:205-208); measured here
    (tools/exp_roi_oracle.py, round 5): at extreme SNR the reference
    budgets can leave a joint fit visibly unconverged (an independent
    minimizer reached 36% lower loss), so the pipeline now SAYS so
    instead of only persisting the number.

    Args:
        loss_history: per-iteration loss values of the finished fit.
        logger: task logger.
        label: what was being fitted (e.g. "PSF of frame 12").
        budget_key: the config key the user should raise.
    """
    rld = relative_loss_differential(loss_history)
    if rld > threshold:
        logger.warning(
            f"{label}: loss still descending when the iteration budget "
            f"ran out (relative_loss_differential {rld:.3f} > "
            f"{threshold}); consider raising '{budget_key}'")
    return rld
