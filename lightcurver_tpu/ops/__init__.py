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

    Measured on the v5e chip (tools/bench_starlet_tpu.py): the MXU DFT
    wins for the model's inverse transforms; the Pallas starlet wins
    standalone (14x) but NOT inside the fused loss programs (0.98x
    end-to-end), so the starlet backend stays 'xla'.
    """
    import jax

    if jax.default_backend() == "tpu":
        set_irfft_backend("mxu")


_DFT_PRECISION = "highest"


def set_dft_precision(name):
    """'highest' (exact f32, default) or 'default' (bf16 passes on MXU:
    ~faster iterations; pair with the exact GLS flux polish and
    full-precision final evaluation)."""
    global _DFT_PRECISION
    assert name in ("highest", "default")
    _DFT_PRECISION = name


def get_dft_precision():
    return _DFT_PRECISION
