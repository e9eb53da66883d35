"""Shared micro-benchmark helper (used by bench.py and tools/).

The naive pattern ``scan(lambda c, _: (c, fn(c)))`` has a loop-invariant
body: XLA's loop-invariant code motion may hoist ``fn`` out of the scan
and the "per-iteration" time then measures one evaluation divided by
n_rep.  Here the carry is updated FROM fn's output each step, creating a
genuine loop-carried data dependence that cannot be hoisted.
"""

import time


def time_compiled_loop(fn, img, n_rep):
    """Mean per-iteration wall time of ``fn`` inside one compiled scan.

    ``fn(x) -> array``; timing fetches the result to the host
    (block_until_ready returns early on the tunneled TPU backend).
    """
    import jax

    @jax.jit
    def many(x):
        def body(c, _):
            y = fn(c)
            s = y.ravel()[0]
            # loop-carried dependence: next input depends on this output
            return x * (1.0 + 1e-12 * s), s

        _, ys = jax.lax.scan(body, x, None, length=n_rep)
        return ys.sum()

    float(many(img))             # compile + first run
    t0 = time.perf_counter()
    float(many(img * 1.000001))
    return (time.perf_counter() - t0) / n_rep
