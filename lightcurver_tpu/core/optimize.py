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
    if schedule_learning_rate:
        lr = optax.exponential_decay(init_learning_rate, max(n_iter, 1), 0.01)
    else:
        lr = init_learning_rate
    opt = optax.adabelief(learning_rate=lr)
    opt_state = opt.init(free0)
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

    init = (free0, opt_state, free0, jnp.asarray(jnp.inf, dtype=jnp.float32))
    (final_params, _, best_params, _), history = jax.lax.scan(
        step, init, None, length=n_iter)
    return best_params, final_params, history


_run_adabelief = jax.jit(
    adabelief_scan,
    static_argnames=("loss_fn", "n_iter", "schedule_learning_rate"))


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
                memory_size=10):
    """Projected L-BFGS scan body (traceable; zoom linesearch inside).

    Returns:
        (best_free, final_free, loss_history[n_iter])
    """
    opt = optax.lbfgs(memory_size=memory_size)
    opt_state = opt.init(free0)

    def bound_loss(params):
        return loss_fn(params, consts)

    value_and_grad = optax.value_and_grad_from_state(bound_loss)

    def step(carry, _):
        params, opt_state, best_params, best_loss = carry
        value, grad = value_and_grad(params, state=opt_state)
        improved = value < best_loss
        best_loss = jnp.where(improved, value, best_loss)
        best_params = jax.tree_util.tree_map(
            lambda b, p: jnp.where(improved, p, b), best_params, params)
        updates, opt_state = opt.update(
            grad, opt_state, params, value=value, grad=grad,
            value_fn=bound_loss)
        params = _project(optax.apply_updates(params, updates), lower, upper)
        return (params, opt_state, best_params, best_loss), value

    init = (free0, opt_state, free0, jnp.asarray(jnp.inf, dtype=jnp.float32))
    (final_params, _, best_params, _), history = jax.lax.scan(
        step, init, None, length=n_iter)
    return best_params, final_params, history


_run_lbfgsb = jax.jit(
    lbfgsb_scan, static_argnames=("loss_fn", "n_iter", "memory_size"))


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


@functools.cache
def _wrap_legacy(loss_fn):
    """Adapt a single-argument loss to the (free, consts) signature.

    Cached so repeat calls reuse the jit cache entry.
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
                 progress_bar=False, return_param_history=False):
        import time

        del min_iterations, stop_at_loss_increase, progress_bar
        n_iter = int(max_iterations if max_iterations is not None else maxiter)
        p = self.parameters
        free0 = p.free0 if restart_from_init else p.best_fit_values(
            as_kwargs=False)
        consts = getattr(self.loss, "consts", None)
        loss_fn = self.loss.loss_fn
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
        if self.method == "adabelief":
            best, final, hist = run_adabelief(
                loss_fn, free0, p.lower, p.upper, n_iter,
                init_learning_rate=init_learning_rate,
                schedule_learning_rate=schedule_learning_rate, consts=consts)
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
        logL = float(hist[np.nanargmin(hist)]) if hist.size else float("nan")
        extra_fields = {"loss_history": hist}
        if return_param_history:
            extra_fields["param_history"] = None  # not recorded (memory)
        return best_kwargs, logL, extra_fields, runtime


def run_adabelief_checkpointed(loss_fn, free0, lower, upper, n_iter,
                               checkpoint_path, init_learning_rate=1e-3,
                               schedule_learning_rate=True, consts=None,
                               checkpoint_every=500):
    """AdaBelief in resumable segments with on-disk checkpoints.

    The reference has NO mid-optimization checkpointing — a killed fit
    restarts from zero (SURVEY §5).  Here the scan runs in
    ``checkpoint_every``-iteration segments; after each, the best free
    pytree + loss history so far are written to ``checkpoint_path``
    (.npz).  A later call with the same path resumes from the last
    completed segment.  The lr schedule spans the FULL run, so a
    resumed fit follows the same trajectory as an uninterrupted one.

    Returns:
        (best_free, final_free, loss_history[n_iter])
    """
    import os
    import pickle

    import numpy as np

    n_iter = int(n_iter)
    every = int(checkpoint_every)
    if schedule_learning_rate:
        lr = optax.exponential_decay(init_learning_rate, max(n_iter, 1),
                                     0.01)
    else:
        lr = init_learning_rate

    opt = optax.adabelief(learning_rate=lr)

    if consts is None:
        fn, consts_ = _wrap_legacy(loss_fn), ()
    else:
        fn, consts_ = loss_fn, consts

    def fresh_carry():
        return (free0, opt.init(free0), free0,
                jnp.asarray(jnp.inf, dtype=jnp.float32))

    start = 0
    carry = None
    histories = []
    if checkpoint_path is not None and os.path.exists(checkpoint_path):
        with open(checkpoint_path, "rb") as f:
            state = pickle.load(f)
        if state["n_iter"] == n_iter and state["done"] >= n_iter:
            # already complete: return the stored result
            params, _, best_params, _ = jax.tree_util.tree_map(
                jnp.asarray, state["carry"])
            return best_params, params, np.asarray(
                state["history"])[:n_iter]
        if state["n_iter"] == n_iter and state["done"] < n_iter:
            start = state["done"]
            carry = jax.tree_util.tree_map(jnp.asarray, state["carry"])
            histories = [np.asarray(state["history"])]
    if carry is None:
        carry = fresh_carry()

    @functools.partial(jax.jit, static_argnames=("length",))
    def segment(carry, consts, length):
        vg = jax.value_and_grad(fn)

        def step(carry, _):
            params, opt_state, best_params, best_loss = carry
            value, grad = vg(params, consts)
            improved = value < best_loss
            best_loss = jnp.where(improved, value, best_loss)
            best_params = jax.tree_util.tree_map(
                lambda b, p: jnp.where(improved, p, b), best_params,
                params)
            updates, opt_state = opt.update(grad, opt_state, params)
            params = _project(optax.apply_updates(params, updates),
                              lower, upper)
            return (params, opt_state, best_params, best_loss), value

        return jax.lax.scan(step, carry, None, length=length)

    done = start
    while done < n_iter:
        length = min(every, n_iter - done)
        carry, hist = segment(carry, consts_, length)
        histories.append(np.asarray(hist))
        done += length
        if checkpoint_path is not None:
            state = {
                "n_iter": n_iter, "done": done,
                "carry": jax.tree_util.tree_map(np.asarray, carry),
                "history": np.concatenate(histories),
            }
            with open(str(checkpoint_path) + ".tmp", "wb") as f:
                pickle.dump(state, f)
            os.replace(str(checkpoint_path) + ".tmp", checkpoint_path)

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
    initial = np.nanmax(lh[:idx]) - np.nanmin(lh[:idx])
    end = np.nanmax(lh[idx:]) - np.nanmin(lh[idx:])
    if initial == 0:
        return 0.0
    return float(end / initial)
