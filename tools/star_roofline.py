"""Star-photometry-fit roofline: ms/iter, bytes/iter, implied GB/s.

The third hot task (batched joint star photometry,
core/deconv/batched._fit_stars) measured the same way as the PSF fit
(tools/psf_roofline.py): the per-iteration value_and_grad program is
cost-analyzed once (XLA counts a scan body once, so whole-fit
differencing does not work) and timed inside a loop-carried scan
(utilities/benchmarking.time_vg_loop).  Shape = bench.py's
run_star_photometry_bench (8 stars x 50 epochs x 16 px stamps, s=2).

Run: timeout 590 python tools/star_roofline.py
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

N_STARS = 8
N_EPOCHS = 50
N_PIX = 16
S = 2


def main():
    import jax

    cache = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from lightcurver_tpu import ops
    from lightcurver_tpu.utilities.benchmarking import (
        star_fit_phase_cost, time_vg_loop)

    ops.auto_select_backends()
    (vg_bytes, vg_flops), (vg, free, consts) = star_fit_phase_cost(
        N_STARS, N_EPOCHS, N_PIX, S)
    print(json.dumps({"star_vg_bytes": round(vg_bytes),
                      "star_vg_flops": round(vg_flops)}), flush=True)
    ms = 1e3 * time_vg_loop(vg, free, consts, n_rep=200)
    out = {
        "bench": "star_roofline_8x50",
        "ada_vg_ms_per_iter": round(ms, 4),
        "star_vg_bytes_per_iter": round(vg_bytes),
        "star_vg_flops_per_iter": round(vg_flops),
        "implied_gbps": round(vg_bytes / (ms / 1e3) / 1e9, 1),
        "implied_tflops": round(vg_flops / (ms / 1e3) / 1e12, 3),
        "per_star_bytes_per_iter": round(vg_bytes / N_STARS),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
