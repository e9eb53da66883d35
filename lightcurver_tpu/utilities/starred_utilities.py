"""Numerical-core helper aliases (reference utilities/starred_utilities.py).

The reference's ``get_flux_uncertainties`` runs a 10-step L-BFGS refit and
a generic Fisher matrix; here the model is exactly linear in the fluxes,
so the closed-form diagonal Fisher information in core/fisher.py replaces
both steps.  This module keeps the reference's import location.
"""

from ..core.fisher import get_flux_uncertainties

__all__ = ["get_flux_uncertainties"]
