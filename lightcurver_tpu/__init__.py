"""lightcurver_tpu: TPU-native forward-modelling photometry pipeline.

A ground-up rebuild of the capabilities of duxfrederic/lightcurver
(reference mounted at /root/reference) with the numerical core implemented
in-repo in JAX (+ Pallas kernels) instead of delegating to STARRED, and the
SQL-driven incremental pipeline shell re-implemented natively.
"""

__version__ = "0.1.0"
