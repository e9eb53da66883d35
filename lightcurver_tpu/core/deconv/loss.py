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

The object is static configuration; ``loss.loss_fn`` is a pure function
(free pytree -> scalar) ready for the optimizers in core/optimize.py.
"""

import jax.numpy as jnp

from ..starlet import starlet_transform, n_starlet_scales
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
        self.data = jnp.asarray(data, dtype=jnp.float32)
        self.model = deconv_class
        self.params = param_class
        self.sigma_2 = jnp.asarray(sigma_2, dtype=jnp.float32)
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
        self.W = jnp.asarray(W, dtype=jnp.float32)

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
            self._pts_weights = jnp.minimum(bump, 1.0)
        else:
            self._pts_weights = None

    # -- individual terms ------------------------------------------------

    def chi2_term(self, kwargs):
        modelled = self.model.model(kwargs)
        res = (self.data - modelled) ** 2 / self.sigma_2
        return 0.5 * jnp.nansum(res)

    def starlet_term(self, kwargs):
        m = self.model.m
        h = kwargs["kwargs_background"]["h"].reshape(m, m)
        coeffs = starlet_transform(h, n_scales=self.n_scales)
        wabs = self.W * jnp.abs(coeffs)
        hf = wabs[0].sum()
        others = wabs[1:-1].sum()  # coarse scale is not penalized
        return self.lambda_hf * hf + self.lambda_scales * others

    def positivity_term(self, kwargs):
        h = kwargs["kwargs_background"]["h"]
        a = kwargs["kwargs_analytic"]["a"]
        return self.lambda_pos * (
            jnp.sum(jnp.maximum(-h, 0.0)) + jnp.sum(jnp.maximum(-a, 0.0)))

    def pts_source_term(self, kwargs):
        m = self.model.m
        h = kwargs["kwargs_background"]["h"].reshape(m, m)
        return self.lambda_pts * jnp.sum(self._pts_weights * jnp.abs(h))

    def flux_uniformity_term(self, kwargs):
        a = kwargs["kwargs_analytic"]["a"].reshape(
            self.model.n_epochs, self.model.n_sources)
        mean = jnp.mean(a, axis=0)
        var = jnp.mean((a - mean) ** 2, axis=0)
        return self.lambda_flux_uni * jnp.sum(var / (mean**2 + 1e-12))

    # -- total -----------------------------------------------------------

    def __call__(self, kwargs):
        total = self.chi2_term(kwargs)
        if self.regularization_terms == "l1_starlet":
            total = total + self.starlet_term(kwargs)
        if self.lambda_pos > 0:
            total = total + self.positivity_term(kwargs)
        if self.lambda_pts > 0:
            total = total + self.pts_source_term(kwargs)
        if self.lambda_flux_uni > 0:
            total = total + self.flux_uniformity_term(kwargs)
        if self.prior is not None:
            total = total + self.prior.logL(kwargs)
        return total

    def loss_fn(self, free):
        """free pytree -> scalar, for core/optimize.py."""
        return self(self.params.merge(free))
