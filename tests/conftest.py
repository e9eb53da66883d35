"""Test configuration: hermetic CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual device mesh (no TPU pod
needed), mirroring the driver's dryrun_multichip validation.

Note: this environment registers the TPU ('axon') PJRT plugin from
sitecustomize and forces jax_platforms there, so setting JAX_PLATFORMS is
not enough — we override the jax config after import, before any backend
is initialized by tests.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
