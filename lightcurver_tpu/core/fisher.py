"""Flux uncertainties from the (diagonal) Fisher information.

Equivalent of the reference's ``get_flux_uncertainties``
(utilities/starred_utilities.py:10-39): with all parameters except the
per-epoch fluxes ``a`` held fixed, the loss is exactly quadratic in ``a``
(the model is linear in the fluxes), so the diagonal Fisher information is
available in closed form:

    I_{e,j} = sum_px basis_{e,j,px}^2 / sigma2_{e,px}
    sigma(a_{e,j}) = I_{e,j}^(-1/2)

where ``basis`` are the unit-flux source images from
``DeconvModel.point_source_basis``.  No iterative refit is needed (the
reference runs 10 L-BFGS-B steps first because its Fisher is generic;
here the exact linear-algebra answer replaces both steps).
"""

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _diag_fisher(basis, sigma_2):
    # basis: (N, M, n, n); sigma_2: (N, n, n)
    info = jnp.nansum(basis**2 / sigma_2[:, None, :, :], axis=(-2, -1))
    return 1.0 / jnp.sqrt(info)


def linear_flux_solve(kwargs, data, sigma_2, model, consts=None):
    """Exact per-epoch GLS solution for the fluxes at fixed positions.

    The model is linear in ``a``: per epoch solve the MxM normal
    equations  (B W Bᵀ) a = B W r  with B the unit-flux source images and
    r the data minus the flux-independent channels (background + mean).
    Polishing the iterative fit with this step removes the optimizer's
    convergence tail on the flux axis — sub-mmag photometric accuracy at
    high SNR regardless of iteration budget.  Fully traceable.
    """
    if consts is None:
        consts = model.consts()
    basis = model.point_source_basis(kwargs, consts)     # (N, M, n, n)
    # flux-independent channels only — value-identical to rendering the
    # full model at a = 0 (the zero-amplitude terms are exact zeros)
    # without paying the point-source render for a known-zero output
    baseline = model.background_only(kwargs, consts)     # (N, n, n)
    # any-NaN pixels get ZERO weight (the loss's nansum convention);
    # a NaN in sigma_2 or data must not poison the Gram matrix or be
    # counted as a zero residual at full weight
    w = jnp.where(jnp.isfinite(sigma_2) & jnp.isfinite(data),
                  1.0 / sigma_2, 0.0)
    r = jnp.nan_to_num(data - baseline)
    bw = basis * w[:, None, :, :]
    gram = jnp.einsum("nmyx,nkyx->nmk", bw, jnp.nan_to_num(basis),
                      precision=jax.lax.Precision.HIGHEST)
    rhs = jnp.einsum("nmyx,nyx->nm", bw, r,
                     precision=jax.lax.Precision.HIGHEST)
    # regularize degenerate epochs (fully masked): identity fallback
    eye = jnp.eye(gram.shape[-1], dtype=gram.dtype) * 1e-12
    a = jnp.linalg.solve(gram + eye, rhs[..., None])[..., 0]  # (N, M)
    return {
        **kwargs,
        "kwargs_analytic": {
            **kwargs["kwargs_analytic"],
            "a": a.reshape(kwargs["kwargs_analytic"]["a"].shape),
        },
    }


def get_flux_uncertainties(kwargs, kwargs_up, kwargs_down, data, noisemap,
                           model):
    """1-sigma uncertainties for each entry of kwargs['kwargs_analytic']['a'].

    Signature mirrors the reference helper; ``kwargs_up/down`` and ``data``
    are accepted for parity but unused (the closed form needs only the
    basis images and the noise).
    """
    del kwargs_up, kwargs_down, data
    sigma_2 = jnp.asarray(noisemap, dtype=jnp.float32) ** 2
    basis = model.point_source_basis(kwargs)
    err = _diag_fisher(basis, sigma_2)          # (N, M)
    return np.asarray(err).reshape(-1)          # flat, matching a's layout


class FisherCovariance:
    """API-parity shim for STARRED's FisherCovariance
    (reference utilities/starred_utilities.py:36-39 usage:
    ``FisherCovariance(parameters, optim, diagonal_only=True)`` then
    ``get_kwargs_sigma()``).

    Only the flux block is populated analytically (the model is linear in
    the fluxes, so the diagonal Fisher information is exact); other
    parameters get NaN sigmas, mirroring the diagonal-only reference use.
    """

    def __init__(self, parameters, optim, diagonal_only=True):
        del diagonal_only
        self.parameters = parameters
        self.loss = optim.loss
        self.model = optim.loss.model

    def get_kwargs_sigma(self):
        kwargs = self.parameters.best_fit_values(as_kwargs=True)
        noise = jnp.sqrt(self.loss.consts["sigma_2"])
        flux_sigma = get_flux_uncertainties(
            kwargs=kwargs, kwargs_up=None, kwargs_down=None, data=None,
            noisemap=noise, model=self.model)

        def nan_like(tree):
            return jax.tree_util.tree_map(
                lambda x: np.full(np.shape(x), np.nan), tree)

        out = nan_like(kwargs)
        out["kwargs_analytic"]["a"] = flux_sigma
        return out
