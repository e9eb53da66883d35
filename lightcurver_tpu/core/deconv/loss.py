"""Loss function for the joint deconvolution, with the reference's knobs.

Mirrors the STARRED ``Loss``/``Prior`` contract exercised by the reference
(processes/star_photometry.py:95-111, processes/roi_modelling.py:275-321):

    total = 0.5 * chi2
          + starlet-l1 on the background channel h (per-scale noise
            weights W from core/noise.propagate_noise; 'hf' strength on
            the finest scale, 'scales' strength on the others)
          + positivity (h and fluxes)
          + point-source proximity penalty on h (discourages the pixel
            channel from absorbing point-source flux; Millon+ 2024 idea)
          + flux-uniformity (scatter of per-source fluxes across epochs)
          + Gaussian priors on analytic parameters.

TPU contract: ``loss_fn(free, consts)`` is a pure function whose array
inputs (data, noise, PSF spectra, starlet weights, fixed parameters) all
arrive via the ``consts`` pytree argument — never as closure constants
(see core/deconv/model.py module docstring for why).  ``loss.consts`` is
the matching bundle, ready to pass to the optimizers in core/optimize.py.
"""

import jax.numpy as jnp

from ..starlet import starlet_transform, n_starlet_scales
from ..params import merge_free
from ..profiles import gaussian_r_kernel


class Prior:
    """Gaussian priors on entries of kwargs_analytic.

    ``Prior(prior_analytic=[['c_x', mean, sigma], ...])`` — matching the
    reference's astrometric prior at processes/roi_modelling.py:240-244.
    """

    def __init__(self, prior_analytic=None):
        self.prior_analytic = prior_analytic or []

    def logL(self, kwargs):
        out = 0.0
        for name, mean, sigma in self.prior_analytic:
            val = kwargs["kwargs_analytic"][name]
            out = out + 0.5 * jnp.sum(
                ((val - jnp.asarray(mean)) / jnp.asarray(sigma)) ** 2)
        return out


class Loss:
    """Data chi2 + regularization, bound to a model and parameter set."""

    def __init__(self, data, deconv_class, param_class, sigma_2,
                 regularization_terms=None,
                 regularization_strength_scales=1.0,
                 regularization_strength_hf=1.0,
                 regularization_strength_positivity=0.0,
                 regularization_strength_pts_source=0.0,
                 regularization_strength_flux_uniformity=0.0,
                 W=None, prior=None):
        self.model = deconv_class
        self.params = param_class
        self.regularization_terms = regularization_terms
        self.lambda_scales = regularization_strength_scales
        self.lambda_hf = regularization_strength_hf
        self.lambda_pos = regularization_strength_positivity
        self.lambda_pts = regularization_strength_pts_source
        self.lambda_flux_uni = regularization_strength_flux_uniformity
        self.prior = prior
        m = self.model.m
        self.n_scales = n_starlet_scales(m)
        if W is None:
            W = jnp.ones((self.n_scales + 1, m, m), dtype=jnp.float32)

        # proximity weights for the pts_source term: Gaussian bumps at the
        # initial source positions (evaluated once, at the init kwargs)
        if self.lambda_pts > 0:
            kw0 = param_class.merge(param_class.free0)
            px, py = self.model.source_positions(kw0)
            s = self.model.s
            bump = jnp.zeros((m, m), dtype=jnp.float32)
            for j in range(self.model.n_sources):
                g = gaussian_r_kernel(m, s, x0=px[0, j], y0=py[0, j])
                bump = bump + g / g.max()
            pts_weights = jnp.minimum(bump, 1.0)
        else:
            pts_weights = jnp.zeros((1, 1), dtype=jnp.float32)

        # everything traced code needs, as ARGUMENTS (never closures)
        self.consts = {
            "data": jnp.asarray(data, dtype=jnp.float32),
            "sigma_2": jnp.asarray(sigma_2, dtype=jnp.float32),
            "W": jnp.asarray(W, dtype=jnp.float32),
            "pts_weights": pts_weights,
            "fixed": param_class.fixed,
            **self.model.spectra(),
        }

    # -- individual terms (pure in (kwargs, consts)) ----------------------

    def chi2_term(self, kwargs, consts):
        modelled = self.model.model(kwargs, consts)
        res = (consts["data"] - modelled) ** 2 / consts["sigma_2"]
        return 0.5 * jnp.nansum(res)

    def starlet_term(self, kwargs, consts):
        m = self.model.m
        h = kwargs["kwargs_background"]["h"].reshape(m, m)
        coeffs = starlet_transform(h, n_scales=self.n_scales)
        wabs = consts["W"] * jnp.abs(coeffs)
        hf = wabs[0].sum()
        others = wabs[1:-1].sum()  # coarse scale is not penalized
        return self.lambda_hf * hf + self.lambda_scales * others

    def positivity_term(self, kwargs):
        h = kwargs["kwargs_background"]["h"]
        a = kwargs["kwargs_analytic"]["a"]
        return self.lambda_pos * (
            jnp.sum(jnp.maximum(-h, 0.0)) + jnp.sum(jnp.maximum(-a, 0.0)))

    def pts_source_term(self, kwargs, consts):
        m = self.model.m
        h = kwargs["kwargs_background"]["h"].reshape(m, m)
        return self.lambda_pts * jnp.sum(consts["pts_weights"] * jnp.abs(h))

    def flux_uniformity_term(self, kwargs):
        a = kwargs["kwargs_analytic"]["a"].reshape(
            self.model.n_epochs, self.model.n_sources)
        mean = jnp.mean(a, axis=0)
        var = jnp.mean((a - mean) ** 2, axis=0)
        return self.lambda_flux_uni * jnp.sum(var / (mean**2 + 1e-12))

    # -- total -----------------------------------------------------------

    def total(self, kwargs, consts):
        out = self.chi2_term(kwargs, consts)
        if self.regularization_terms == "l1_starlet":
            out = out + self.starlet_term(kwargs, consts)
        if self.lambda_pos > 0:
            out = out + self.positivity_term(kwargs)
        if self.lambda_pts > 0:
            out = out + self.pts_source_term(kwargs, consts)
        if self.lambda_flux_uni > 0:
            out = out + self.flux_uniformity_term(kwargs)
        if self.prior is not None:
            out = out + self.prior.logL(kwargs)
        return out

    def __call__(self, kwargs):
        """Eager convenience evaluation at full kwargs (diagnostics)."""
        return self.total(kwargs, self.consts)

    def loss_fn(self, free, consts):
        """(free pytree, consts pytree) -> scalar, for core/optimize.py."""
        return self.total(merge_free(free, consts["fixed"]), consts)
