"""Parameter handling: nested-kwargs pytrees with fixing and box bounds.

Functional equivalent of the ParametersDeconv/ParametersPSF classes the
reference uses (reference processes/star_photometry.py:89-92,
processes/roi_modelling.py:264-267): parameters are nested dicts
("kwargs"), a parameter is FIXED by listing it in ``kwargs_fixed`` (at the
value given there), otherwise it is free and optimized within the bounds of
``kwargs_up`` / ``kwargs_down``.

Everything here is pure-pytree so it composes with jit / grad / scan /
shard_map without special handling.
"""

from copy import deepcopy

import jax.numpy as jnp
import numpy as np


def _is_leaf_dict(d):
    return isinstance(d, dict)


def split_free(kwargs_init, kwargs_fixed):
    """Split init kwargs into the free subtree (as pytree) and fixed subtree.

    A key present in kwargs_fixed is fixed at the kwargs_fixed value.
    """
    free = {}
    fixed = {}
    for k, v in kwargs_init.items():
        if _is_leaf_dict(v):
            sub_fixed_spec = kwargs_fixed.get(k, {}) if kwargs_fixed else {}
            f, x = split_free(v, sub_fixed_spec)
            free[k] = f
            fixed[k] = x
        else:
            if kwargs_fixed is not None and k in kwargs_fixed:
                fixed[k] = jnp.asarray(kwargs_fixed[k])
            else:
                free[k] = jnp.asarray(v)
    return free, fixed


def merge_free(free, fixed):
    """Merge a free pytree and a fixed pytree back into full kwargs."""
    out = {}
    keys = set(free.keys()) | set(fixed.keys())
    for k in keys:
        fv = free.get(k, None)
        xv = fixed.get(k, None)
        if isinstance(fv, dict) or isinstance(xv, dict):
            out[k] = merge_free(fv or {}, xv or {})
        elif fv is not None:
            out[k] = fv
        else:
            out[k] = xv
    return out


def bounds_like_free(free, kwargs_bound, default):
    """Extract a bounds pytree matching the structure of ``free``.

    Missing entries get ``default`` (+/- inf).
    """
    out = {}
    for k, v in free.items():
        if isinstance(v, dict):
            sub = kwargs_bound.get(k, {}) if kwargs_bound else {}
            out[k] = bounds_like_free(v, sub, default)
        else:
            if kwargs_bound is not None and k in kwargs_bound:
                b = jnp.broadcast_to(jnp.asarray(kwargs_bound[k], dtype=jnp.result_type(v)), jnp.shape(v))
                out[k] = b
            else:
                out[k] = jnp.full(jnp.shape(v), default, dtype=jnp.result_type(v))
    return out


class Params:
    """Bundle of kwargs_init / kwargs_fixed / kwargs_up / kwargs_down.

    Attributes:
        free0: initial free pytree.
        fixed: fixed pytree (merged into full kwargs on evaluation).
        lower, upper: bounds pytrees matching ``free0``.
    """

    def __init__(self, kwargs_init, kwargs_fixed=None, kwargs_up=None,
                 kwargs_down=None):
        self.kwargs_init = deepcopy(kwargs_init)
        self.kwargs_fixed = deepcopy(kwargs_fixed) if kwargs_fixed else {}
        self.free0, self.fixed = split_free(self.kwargs_init, self.kwargs_fixed)
        self.upper = bounds_like_free(self.free0, kwargs_up, np.inf)
        self.lower = bounds_like_free(self.free0, kwargs_down, -np.inf)
        # lazily resolved to free0: callers may REASSIGN free0 after
        # construction (e.g. parallel/deconv.shard_pytree places it on
        # a mesh) and the first minimize must start from the reassigned
        # arrays, not a stale alias captured here
        self._best_free = None

    def merge(self, free):
        """Full kwargs from a free pytree (jit-safe)."""
        return merge_free(free, self.fixed)

    def set_best(self, free):
        self._best_free = free

    def best_fit_values(self, as_kwargs=True):
        """Final parameter values (full kwargs when ``as_kwargs``)."""
        best = self._best_free if self._best_free is not None else self.free0
        if as_kwargs:
            return self.merge(best)
        return best
