"""Where does the batched PSF fit's time go on the chip?

Splits the two phases (L-BFGS Moffat vs AdaBelief pixel grid) and sweeps
the batch size, to target the round-2 throughput work.

Run: timeout 590 python tools/bench_psf_profile.py
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    import jax

    cache = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from lightcurver_tpu import ops

    ops.auto_select_backends()
    from lightcurver_tpu.core.psf.batched import build_psf_batched
    from lightcurver_tpu.utilities.synthetic import make_star_stamps

    def dataset(n_frames):
        frames = [make_star_stamps(n_stars=8, n_pix=64, s=2, seed=i,
                                   fwhm_x=2.5, fwhm_y=2.5)
                  for i in range(n_frames)]
        return (np.stack([f["data"] for f in frames]),
                np.stack([f["sigma"] for f in frames]))

    # measure the PRODUCTION configuration (psf_dft_pad: 16 is the
    # shipped default since round 4, structure/user_config.py:109);
    # override with LIGHTCURVER_PROFILE_FULLPAD=1 for the L=2m lane
    import os
    dft_pad = None if os.environ.get("LIGHTCURVER_PROFILE_FULLPAD") else 16

    def timed(n_frames, n_lbfgs, n_ada):
        data, sigma = dataset(n_frames)
        build_psf_batched(data, sigma, 2, n_iter_analytic=n_lbfgs,
                          n_iter_adabelief=n_ada, dft_pad=dft_pad)
        t0 = time.perf_counter()
        build_psf_batched(data * np.float32(1 + 1e-6), sigma, 2,
                          n_iter_analytic=n_lbfgs, n_iter_adabelief=n_ada,
                          dft_pad=dft_pad)
        return time.perf_counter() - t0

    # phase split at the full reference budget, batch 16
    for tag, (nl, na) in {"lbfgs100_only": (100, 0),
                          "ada3000_only": (0, 3000),
                          "full": (100, 3000)}.items():
        wall = timed(16, nl, na)
        print(json.dumps({"bench": f"psf16_{tag}", "wall_s": round(wall, 3),
                          "fits_per_sec": round(16 / wall, 2)}), flush=True)

    # batch-size sweep at the full budget
    for bs in (1, 8, 32):
        wall = timed(bs, 100, 3000)
        print(json.dumps({"bench": f"psf_batch{bs}_full",
                          "wall_s": round(wall, 3),
                          "fits_per_sec": round(bs / wall, 2)}), flush=True)


if __name__ == "__main__":
    main()
