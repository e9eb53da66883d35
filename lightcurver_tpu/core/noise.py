"""Monte-Carlo propagation of data noise into starlet coefficient weights.

Functional equivalent of STARRED's ``propagate_noise(method='SLIT')`` as
the reference uses it (processes/star_photometry.py:108-110,
processes/roi_modelling.py:299-301): per starlet scale and per fine-grid
pixel, the standard deviation that data noise induces on the starlet
coefficients of the background channel.  Used as multiplicative weights W
in the l1 penalty, so coefficients are thresholded in units of their own
noise.

Implementation: draw ``num_samples`` data-grid noise realizations
``eps ~ N(0, sigma_px)``, push each through the ADJOINT of the forward
linear operator (upsample-transpose, then correlate with the PSF), starlet
transform, and take the per-coefficient std over samples.  Fully batched
on-device; all arrays enter the jitted program as arguments (see
core/optimize.py module docstring for the no-closure-constants rule).
"""

import functools

import jax
import jax.numpy as jnp

from .grids import upsample_transpose
from .starlet import starlet_transform, n_starlet_scales
from . import convolution as conv


@functools.partial(jax.jit, static_argnames=("m", "s", "num_samples",
                                             "n_scales", "dft_precision"))
def _mc_starlet_noise(sigma, mean_ps_hat, m, s, num_samples, n_scales, key,
                      dft_mats=None, dft_precision=None):
    """std of starlet coefficients of PSF-correlated upsampled noise.

    ``key`` is a PRNG key array (vmap-safe: callers under vmap pass their
    own split key, mirroring core/psf/build._grid_noise_weights_impl).
    With ``dft_mats`` the adjoint convolution runs as MXU matmuls (same
    rationale as _grid_noise_weights_impl: the TPU FFT op is slow AND
    blocks batch-axis SPMD partitioning).  ``dft_precision`` (a
    get_dft_precision() NAME) keys this standalone jit's cache so a
    precision flip retraces instead of reusing the stale program.
    """
    L = conv.pad_len(m)
    # a pixel whose noise is NaN in every epoch would otherwise spread
    # NaN through the starlet smoothing into ALL weights (and the l1
    # term would NaN the whole fit): contribute zero noise there
    sigma = jnp.where(jnp.isfinite(sigma), sigma, 0.0)

    def one_sample(key):
        eps = sigma * jax.random.normal(key, sigma.shape, dtype=jnp.float32)
        fine = upsample_transpose(eps, s)
        # correlate with the PSF (adjoint of convolution): conjugate spectrum
        if dft_mats is not None:
            from ..ops.dft import (irfft2_crop_matmul,
                                   precision_from_name,
                                   rfft2_pad_matmul)

            prec = precision_from_name(dft_precision)
            fine_hat = rfft2_pad_matmul(fine, dft_mats, precision=prec)
            back = irfft2_crop_matmul(fine_hat * jnp.conj(mean_ps_hat),
                                      dft_mats, precision=prec)
        else:
            fine_hat = jnp.fft.rfft2(fine, s=(L, L))
            back = jnp.fft.irfft2(fine_hat * jnp.conj(mean_ps_hat),
                                  s=(L, L))[:m, :m]
        return starlet_transform(back, n_scales=n_scales)

    keys = jax.random.split(key, num_samples)
    coeffs = jax.lax.map(one_sample, keys, batch_size=32)
    # guard against zeros (constant coarse scale etc.)
    return jnp.maximum(jnp.std(coeffs, axis=0), 1e-12)


def propagate_noise(model, noisemap, kwargs, wavelet_type_list=("starlet",),
                    method="SLIT", num_samples=200, seed=1,
                    likelihood_type="chi2", verbose=False,
                    upsampling_factor=None, n_scales=None):
    """Per-scale noise weight maps for the starlet-l1 regularization.

    Args:
        model: DeconvModel (provides fine-grid size, subsampling, PSFs).
        noisemap: (N, n, n) data noise sigmas.
        kwargs: parameter kwargs (unused; signature parity with reference
            call sites).
        num_samples: Monte-Carlo sample count.
        seed: PRNG seed.
        upsampling_factor: defaults to the model's subsampling factor.

    Returns:
        list with one element per wavelet type; element 0 is an array
        ``(n_scales + 1, m, m)``.
    """
    del kwargs, method, likelihood_type, verbose
    s = int(upsampling_factor) if upsampling_factor else model.s
    m = model.m
    if n_scales is None:
        n_scales = n_starlet_scales(m)

    sigma = jnp.nanmedian(jnp.asarray(noisemap, dtype=jnp.float32), axis=0)
    # mean point-source-channel spectrum across epochs as the effective
    # smoothing operator
    mean_ps_hat = model.consts()["ps_hat"].mean(axis=0)
    # on the matmul backend the adjoint convolution runs as MXU matmuls
    # — the TPU FFT op is slow and the 200-500-sample MC pass is called
    # once per ROI/star-photometry task (the batched pipelines already
    # thread their own mats into _mc_starlet_noise)
    from ..ops import get_dft_precision, get_irfft_backend

    dft_mats = dft_precision = None
    if get_irfft_backend() == "mxu":
        from ..ops.dft import make_dft_mats

        dft_mats = make_dft_mats(conv.pad_len(m), m)
        dft_precision = get_dft_precision()
    W = _mc_starlet_noise(sigma, mean_ps_hat, m, s, int(num_samples),
                          int(n_scales), jax.random.PRNGKey(int(seed)),
                          dft_mats=dft_mats, dft_precision=dft_precision)
    return [W]
