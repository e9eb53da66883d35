"""Test configuration: hermetic CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual device mesh (no TPU pod
needed), mirroring the driver's dryrun_multichip validation.

Note: this environment registers the TPU ('axon') PJRT plugin from
sitecustomize and forces jax_platforms there, so setting JAX_PLATFORMS is
not enough — we override the jax config after import, before any backend
is initialized by tests.
"""

import os

if os.environ.get("LIGHTCURVER_TEST_TPU") == "1":
    # opt-in: run the suite against the real accelerator (hardware
    # smoke, e.g. `LIGHTCURVER_TEST_TPU=1 pytest tests/test_e2e_pipeline.py`);
    # sharding tests then use however many real devices exist
    import jax

    import pathlib

    cache = pathlib.Path(__file__).parents[1] / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
else:
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")

    # persistent compilation cache: the suite's wall time is dominated
    # by XLA compiles of the big jitted fit programs; caching them
    # makes re-runs (and parallel test shards) several times faster.
    # Keyed by the CPU feature flags: XLA:CPU AOT results are compiled
    # -march=native-equivalent, and loading another machine's entries
    # logs 'could lead to execution errors such as SIGILL'
    import hashlib
    import pathlib

    try:
        with open("/proc/cpuinfo") as _cpuinfo:
            _flags = next(line for line in _cpuinfo
                          if line.startswith("flags"))
    except (OSError, StopIteration):
        _flags = "unknown"
    _fp = hashlib.sha256(_flags.encode()).hexdigest()[:8]
    _cache = pathlib.Path(__file__).parents[1] / f".jax_cache_cpu_{_fp}"
    _cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(_cache))
    # 0.1 s threshold: the suite's programs are many mid-size compiles
    # (0.1-1 s each); caching them too saves ~8% of the quick lane
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
