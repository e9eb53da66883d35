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
inputs (data, noise, PSF spectra, starlet weights, regularization
strengths, prior means/sigmas, fixed parameters) all arrive via the
``consts`` pytree argument — never as closure constants (see
core/deconv/model.py module docstring for why).  The function object is
CACHED per static configuration (geometry + active terms + prior
structure), so fitting many problems of identical shape — each star's
photometry, each frame's PSF — reuses one compiled program instead of
recompiling per instance.
"""

import functools

import jax.numpy as jnp

from ..starlet import starlet_transform, n_starlet_scales
from ..params import merge_free
from ..profiles import gaussian_r_kernel
from .model import DeconvModel


class Prior:
    """Gaussian priors on entries of kwargs_analytic.

    ``Prior(prior_analytic=[['c_x', mean, sigma], ...])`` — matching the
    reference's astrometric prior at processes/roi_modelling.py:240-244.
    """

    def __init__(self, prior_analytic=None):
        self.prior_analytic = prior_analytic or []

    def names(self):
        return tuple(name for name, _, _ in self.prior_analytic)

    def consts(self):
        return {
            "means": {name: jnp.asarray(mean, jnp.float32)
                      for name, mean, _ in self.prior_analytic},
            "sigmas": {name: jnp.asarray(sigma, jnp.float32)
                       for name, _, sigma in self.prior_analytic},
        }

    def logL(self, kwargs):
        out = 0.0
        for name, mean, sigma in self.prior_analytic:
            val = kwargs["kwargs_analytic"][name]
            out = out + 0.5 * jnp.sum(
                ((val - jnp.asarray(mean)) / jnp.asarray(sigma)) ** 2)
        return out


@functools.lru_cache(maxsize=128)
def _build_loss_fn(model_config, use_starlet, use_pos, use_pts,
                   use_flux_uni, prior_names, starlet_backend="xla",
                   dft_precision="highest"):
    """One pure (free, consts) -> scalar per static configuration."""
    model = DeconvModel.for_eval(*model_config)
    m = model.m
    n_sc = n_starlet_scales(m)
    if starlet_backend == "pallas":
        from ...ops.starlet_op import starlet_transform as _starlet_op

        def _starlet(img, n_scales):
            # force the kernel: the op's default dispatch reads the ops
            # GLOBAL, which may say 'xla' even though this loss was
            # cache-keyed (and requested) as pallas
            return _starlet_op(img, n_scales, backend="pallas")
    else:
        _starlet = starlet_transform

    def fn(free, consts):
        kwargs = merge_free(free, consts["fixed"])
        modelled = model.model(kwargs, consts)
        res = (consts["data"] - modelled) ** 2 / consts["sigma_2"]
        # epoch_w masks dummy epochs added by parallel/deconv.pad_* so a
        # padded sharded fit is EXACTLY the unpadded fit (all ones when
        # no padding: identical arithmetic)
        w = consts["epoch_w"]
        total = 0.5 * jnp.nansum(w[:, None, None] * res)

        if use_starlet:
            h = kwargs["kwargs_background"]["h"].reshape(m, m)
            coeffs = _starlet(h, n_scales=n_sc)
            wabs = consts["W"] * jnp.abs(coeffs)
            total = total + consts["lambda_hf"] * wabs[0].sum() \
                + consts["lambda_scales"] * wabs[1:-1].sum()
        if use_pos:
            h = kwargs["kwargs_background"]["h"]
            a = kwargs["kwargs_analytic"]["a"].reshape(
                model.n_epochs, model.n_sources)
            total = total + consts["lambda_pos"] * (
                jnp.sum(jnp.maximum(-h, 0.0))
                + jnp.sum(w[:, None] * jnp.maximum(-a, 0.0)))
        if use_pts:
            h = kwargs["kwargs_background"]["h"].reshape(m, m)
            total = total + consts["lambda_pts"] * jnp.sum(
                consts["pts_weights"] * jnp.abs(h))
        if use_flux_uni:
            a = kwargs["kwargs_analytic"]["a"].reshape(
                model.n_epochs, model.n_sources)
            wsum = jnp.sum(w)
            mean = jnp.sum(w[:, None] * a, axis=0) / wsum
            var = jnp.sum(w[:, None] * (a - mean) ** 2, axis=0) / wsum
            total = total + consts["lambda_flux_uni"] * jnp.sum(
                var / (mean**2 + 1e-12))
        for name in prior_names:
            val = kwargs["kwargs_analytic"][name]
            mean = consts["prior_means"][name]
            sigma = consts["prior_sigmas"][name]
            total = total + 0.5 * jnp.sum(((val - mean) / sigma) ** 2)
        return total

    return fn


class Loss:
    """Data chi2 + regularization, bound to a model and parameter set."""

    def __init__(self, data, deconv_class, param_class, sigma_2,
                 regularization_terms=None,
                 regularization_strength_scales=1.0,
                 regularization_strength_hf=1.0,
                 regularization_strength_positivity=0.0,
                 regularization_strength_pts_source=0.0,
                 regularization_strength_flux_uniformity=0.0,
                 W=None, prior=None, epoch_weights=None,
                 irfft_backend=None, starlet_backend=None):
        self.model = deconv_class
        self.params = param_class
        self.prior = prior
        m = self.model.m
        self.n_scales = n_starlet_scales(m)
        use_starlet = regularization_terms == "l1_starlet"
        use_pos = regularization_strength_positivity > 0
        use_pts = regularization_strength_pts_source > 0
        use_flux_uni = regularization_strength_flux_uniformity > 0
        prior_names = prior.names() if prior is not None else ()
        from ...ops import get_backend as _ops_backend

        from ...ops import get_dft_precision

        # explicit override for sharded callers: the Pallas starlet has
        # no partitioning rule, so a partitioned program containing it
        # fails to compile (or replicates the background stack) —
        # parallel entry points force 'xla' here, mirroring
        # irfft_backend above
        if starlet_backend is None:
            starlet_backend = _ops_backend()
        self._fn = _build_loss_fn(self.model.config(), use_starlet,
                                  use_pos, use_pts, use_flux_uni,
                                  prior_names,
                                  starlet_backend=starlet_backend,
                                  dft_precision=get_dft_precision())
        # expose the SHARED function object (not a bound method) so the
        # optimizers' jit cache hits across Loss instances of identical
        # configuration
        self.loss_fn = self._fn

        if W is None:
            W = jnp.ones((self.n_scales + 1, m, m), dtype=jnp.float32)

        # proximity weights for the pts_source term: Gaussian bumps at the
        # initial source positions (evaluated once, at the init kwargs)
        if use_pts:
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

        if epoch_weights is None:
            epoch_weights = jnp.ones(self.model.n_epochs, jnp.float32)

        # everything traced code needs, as ARGUMENTS (never closures)
        self.consts = {
            "data": jnp.asarray(data, dtype=jnp.float32),
            "sigma_2": jnp.asarray(sigma_2, dtype=jnp.float32),
            "epoch_w": jnp.asarray(epoch_weights, dtype=jnp.float32),
            "W": jnp.asarray(W, dtype=jnp.float32),
            "pts_weights": pts_weights,
            "fixed": param_class.fixed,
            "lambda_scales": jnp.float32(regularization_strength_scales),
            "lambda_hf": jnp.float32(regularization_strength_hf),
            "lambda_pos": jnp.float32(regularization_strength_positivity),
            "lambda_pts": jnp.float32(regularization_strength_pts_source),
            "lambda_flux_uni": jnp.float32(
                regularization_strength_flux_uniformity),
            **self.model.spectra(),
        }
        if prior is not None:
            pc = prior.consts()
            self.consts["prior_means"] = pc["means"]
            self.consts["prior_sigmas"] = pc["sigmas"]

        from ...ops import get_irfft_backend

        # explicit override for sharded callers: a partitioned program
        # containing the FFT op all-gathers the full epoch stack every
        # iteration (XLA SPMD cannot partition FFT batch dims), so
        # parallel/deconv.fit_deconv_sharded forces 'mxu' here
        if irfft_backend is None:
            irfft_backend = get_irfft_backend()
        if irfft_backend == "mxu":
            from ...ops.dft import make_dft_mats

            self.consts["dft_mats"] = make_dft_mats(2 * m, m,
                                                      pool=self.model.s)
            # raw (re, im) PSF spectra: the model's all-real hot path
            # reads ONLY these per iteration (ps_hat/grid_hat above stay
            # for setup/diagnostic computations; unused args are pruned
            # from the compiled optimizer step)
            self.consts.update(self.model.spectra_real())

        # when the background channel h is FIXED (star photometry default,
        # ROI stage 1, ROI stage 2 without further_optimize_background) its
        # render down(conv(t_e, h)) is loop-invariant: precompute it once
        # here and the model skips the whole per-iteration h chain
        fixed_bg = (param_class.fixed or {}).get("kwargs_background", {})
        if "h" in fixed_bg:
            h_flat = jnp.asarray(fixed_bg["h"], dtype=jnp.float32)
            self.consts["fixed_h_render"] = self.model._h_render(
                h_flat, self.consts)

    def __call__(self, kwargs):
        """Eager convenience evaluation at full kwargs (diagnostics)."""
        free = kwargs  # evaluate with everything considered free
        consts = dict(self.consts)
        consts["fixed"] = {}
        # everything is free here, including h: force the full render
        consts.pop("fixed_h_render", None)
        return self._fn(free, consts)
