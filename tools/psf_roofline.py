"""PSF-fit roofline: ms/iter, bytes/iter and implied HBM GB/s.

Measures the DOMINANT phase of the batched PSF fit (the AdaBelief pixel
grid, ~92% of the full-budget wall per tools/bench_psf_profile.py) with
ONE compile: the per-iteration value_and_grad program is cost-analyzed
(bytes/flops — XLA cost analysis counts a scan body once, so whole-fit
differencing does NOT work; measured) and timed inside a loop-carried
scan (utilities/benchmarking.time_vg_loop).  bytes/time is the achieved
bandwidth, to compare against the chip's measured streaming roofline
(~526 GB/s on this v5e, BASELINE.md).

Run: timeout 590 python tools/psf_roofline.py
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

BATCH = 16
N_STARS = 8
N_PIX = 64
S = 2


def main():
    import jax

    cache = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from lightcurver_tpu import ops
    from lightcurver_tpu.utilities.benchmarking import (
        psf_pixel_phase_cost, time_vg_loop)

    ops.auto_select_backends()
    (vg_bytes, vg_flops), (vg, free, consts) = psf_pixel_phase_cost(
        BATCH, N_STARS, N_PIX, S)
    print(json.dumps({"pixel_vg_bytes": round(vg_bytes),
                      "pixel_vg_flops": round(vg_flops)}), flush=True)
    ms = 1e3 * time_vg_loop(vg, free, consts, n_rep=200)
    out = {
        "bench": "psf_roofline_batch16",
        "ada_vg_ms_per_iter": round(ms, 4),
        "pixel_vg_bytes_per_iter": round(vg_bytes),
        "pixel_vg_flops_per_iter": round(vg_flops),
        "implied_gbps": round(vg_bytes / (ms / 1e3) / 1e9, 1),
        "implied_tflops": round(vg_flops / (ms / 1e3) / 1e12, 3),
        "per_frame_bytes_per_iter": round(vg_bytes / BATCH),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
