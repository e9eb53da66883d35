"""Pallas TPU kernels for bandwidth-bound stages, with jnp fallbacks.

Each op has a reference jnp implementation (always available, used on
CPU and for parity tests) and a Pallas TPU kernel enabled by flag:

    from lightcurver_tpu.ops import set_backend
    set_backend("pallas")   # or "xla" (default)
"""

_BACKEND = "xla"
_IRFFT_BACKEND = "fft"


def set_backend(name):
    global _BACKEND
    assert name in ("xla", "pallas")
    _BACKEND = name


def get_backend():
    return _BACKEND


def set_irfft_backend(name):
    """'fft' (XLA FFT) or 'mxu' (DFT-as-matmul; faster on this TPU)."""
    global _IRFFT_BACKEND
    assert name in ("fft", "mxu")
    _IRFFT_BACKEND = name


def get_irfft_backend():
    return _IRFFT_BACKEND


def auto_select_backends():
    """Pick the measured-fastest backends for the live platform.

    Measured on the v5e chip (tools/bench_starlet_tpu.py + round-2
    precision sweep): the MXU DFT wins for the model's inverse
    transforms; 'high' (bf16x3) matmul precision is 1.45x faster than
    'highest' (bf16x6) on the ROI hot path with identical chi2 and
    <=0.06 mmag flux impact (30x below the sub-mmag bar); the Pallas
    starlet wins standalone (14x) but NOT inside the fused loss
    programs (0.98x end-to-end), so the starlet backend stays 'xla'.
    """
    import jax

    if jax.default_backend() == "tpu":
        set_irfft_backend("mxu")
        set_dft_precision("high")


_DFT_PRECISION = "highest"


def set_dft_precision(name):
    """Matmul precision of the DFT render path.

    'highest' — exact f32 (6-pass bf16 on the MXU); the conservative
        CPU/GPU default.
    'high'    — 3-pass bf16; selected by auto_select_backends() on TPU.
        Measured round 2 on v5e: ROI fit 1.51 -> 1.03 s, PSF batch
        2.6 -> 3.2 fits/s, chi2 identical, star/ROI fluxes within
        0.034 / 0.056 mmag (max) of 'highest'.
    'default' — raw bf16: +50% PSF throughput but PSF chi2 +7%
        (measured round 2) — diagnostics only, never for science.
    """
    global _DFT_PRECISION
    assert name in ("highest", "high", "default")
    _DFT_PRECISION = name


def get_dft_precision():
    return _DFT_PRECISION
