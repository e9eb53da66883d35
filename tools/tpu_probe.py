"""Raw-matmul probe of the live accelerator backend.

The benchmark chip is reached over a SHARED tunnel that shows transient
multi-x slowdowns and occasional full wedges (measured 2026-08-17: a
64 MB host->device transfer stalled > 9 min).  Before concluding a perf
regression — or before starting a long bench — run this probe; it
answers "is the machine healthy right now?" in one JSON line.

Run it in a FRESH process (a wedged jax client never recovers
in-process):  timeout 300 python tools/tpu_probe.py
"""

import json
import pathlib
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(
        pathlib.Path(__file__).parents[1] / ".jax_cache"))
    out = {"backend": None, "init_s": None, "h2d_s": None,
           "matmul_ms": None}
    a = np.random.default_rng(0).random((4096, 4096), dtype=np.float32)
    # initialize the client BEFORE timing the transfer: in a fresh
    # process the first device op includes tunnel connect + device
    # enumeration, which would misattribute many seconds to "h2d"
    t0 = time.perf_counter()
    out["backend"] = jax.default_backend()
    jax.block_until_ready(jnp.zeros(8))
    out["init_s"] = round(time.perf_counter() - t0, 2)
    if out["backend"] == "cpu":
        # no accelerator to probe: the wedge mode under test lives in
        # the tunneled PJRT plugin.  A CPU-default host passes with a
        # small matmul — the full 4k probe can take minutes on a
        # 1-CPU box and would misclassify a healthy machine as wedged.
        a = a[:512, :512].copy()
    t0 = time.perf_counter()
    x = jnp.asarray(a)
    jax.block_until_ready(x)
    out["h2d_s"] = round(time.perf_counter() - t0, 2)
    f = jax.jit(lambda v: v @ v)
    jax.block_until_ready(f(x))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        # fetch one element: on the tunneled backend block_until_ready
        # returns before execution finishes
        float(f(x)[0, 0])
        best = min(best, time.perf_counter() - t0)
    out["matmul_ms"] = round(best * 1e3, 1)
    # v5e reference: ~15-25 ms healthy for f32 4k matmul incl. the
    # ~25 ms tunnel dispatch round-trip; multi-x worse => shared-tenant
    # slowdown; no output at all within the timeout => wedged
    print(json.dumps(out))


if __name__ == "__main__":
    main()
