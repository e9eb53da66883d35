"""Pallas TPU kernels for bandwidth-bound stages, with jnp fallbacks.

Each op has a reference jnp implementation (always available, used on
CPU and for parity tests) and a Pallas TPU kernel enabled by flag:

    from lightcurver_tpu.ops import set_backend
    set_backend("pallas")   # or "xla" (default)
"""

_BACKEND = "xla"


def set_backend(name):
    global _BACKEND
    assert name in ("xla", "pallas")
    _BACKEND = name


def get_backend():
    return _BACKEND
