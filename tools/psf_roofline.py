"""PSF-fit roofline: ms/iter, bytes/iter and implied HBM GB/s per phase.

Method: XLA cost analysis is a STATIC property of the compiled program,
so lowering the batched fit at two iteration counts and differencing
gives the exact per-iteration cost of each phase (setup, MC weights and
finalization cancel).  Wall-clock differencing of the same two runs
gives ms/iter; bytes_per_iter / time_per_iter is the achieved HBM
bandwidth, to compare against the chip's measured streaming roofline
(~526 GB/s on this v5e, BASELINE.md).

Run: timeout 590 python tools/psf_roofline.py
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

BATCH = 16
N_STARS = 8
N_PIX = 64
S = 2


def _dataset():
    from lightcurver_tpu.utilities.synthetic import make_star_stamps

    frames = [make_star_stamps(n_stars=N_STARS, n_pix=N_PIX, s=S, seed=i,
                               fwhm_x=2.5, fwhm_y=2.5)
              for i in range(BATCH)]
    return (np.stack([f["data"] for f in frames]),
            np.stack([f["sigma"] for f in frames]))


def _lower(data, sigma, n_lbfgs, n_ada):
    import jax
    import jax.numpy as jnp
    from lightcurver_tpu import ops
    from lightcurver_tpu.core.psf import batched as B

    masks = np.isfinite(data)
    coords = np.zeros((BATCH, N_STARS, 2), np.float32)
    fwhm0 = np.full((BATCH,), 3.0, np.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), BATCH)
    args = (jnp.asarray(data.astype(np.float32)),
            jnp.asarray(sigma.astype(np.float32)), jnp.asarray(masks),
            jnp.asarray(coords), jnp.asarray(fwhm0), keys,
            N_STARS, N_PIX, S, False, n_lbfgs, n_ada, 1.0, 5e-4,
            ops.get_irfft_backend(), ops.get_dft_precision())
    return B._fit_frames.lower(*args).compile(), args


def _cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("bytes accessed", float("nan"))), \
        float(ca.get("flops", float("nan")))


def _timed(compiled, args):
    out = compiled(*[a for a in args if not isinstance(a, (int, float,
                                                          bool, str))])
    import jax

    jax.block_until_ready(out)
    float(np.asarray(out["chi2"])[0])  # force a host transfer
    t0 = time.perf_counter()
    out = compiled(*[a for a in args if not isinstance(a, (int, float,
                                                           bool, str))])
    float(np.asarray(out["chi2"])[0])
    return time.perf_counter() - t0


def phase_cost(data, sigma, lo, hi, tag, ada=True):
    """Per-iteration (ms, bytes, flops) of one phase by differencing."""
    c_lo, a_lo = _lower(data, sigma, 0 if ada else lo, lo if ada else 0)
    c_hi, a_hi = _lower(data, sigma, 0 if ada else hi, hi if ada else 0)
    b_lo, f_lo = _cost(c_lo)
    b_hi, f_hi = _cost(c_hi)
    t_lo = _timed(c_lo, a_lo)
    t_hi = _timed(c_hi, a_hi)
    dn = hi - lo
    res = {
        "bench": f"psf_roofline_{tag}",
        "ms_per_iter": round(1e3 * (t_hi - t_lo) / dn, 4),
        "bytes_per_iter": round((b_hi - b_lo) / dn),
        "flops_per_iter": round((f_hi - f_lo) / dn),
        "implied_gbps": round(((b_hi - b_lo) / dn)
                              / ((t_hi - t_lo) / dn) / 1e9, 1),
        "implied_tflops": round(((f_hi - f_lo) / dn)
                                / ((t_hi - t_lo) / dn) / 1e12, 3),
    }
    print(json.dumps(res), flush=True)
    return res


def main():
    import jax

    cache = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from lightcurver_tpu import ops

    ops.auto_select_backends()
    data, sigma = _dataset()
    phase_cost(data, sigma, 1000, 3000, "ada_pixels", ada=True)
    phase_cost(data, sigma, 40, 100, "lbfgs_moffat", ada=False)


if __name__ == "__main__":
    main()
