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
