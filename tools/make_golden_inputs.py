"""Write the shared golden-parity input fixture.

One deterministic, committed .npz consumed both by OUR core
(tests/test_reference_golden.py) and by the reference+STARRED recorder
(tools/record_reference_golden.py) — identical bytes in, so outputs are
comparable at sub-mmag level.

Contents:
    psf_stars, psf_noise        (5, 16, 16)  star stamps for build_psf
    phot_data, phot_noise       (6, 16, 16)  epochs of one star
    phot_psf                    (6, 32, 32)  matching narrow PSFs (s=2)
    phot_true_flux              (6,)
    subsampling_factor          ()

Run: python tools/make_golden_inputs.py
"""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from lightcurver_tpu.utilities.synthetic import make_star_stamps  # noqa: E402


def main():
    out = (pathlib.Path(__file__).resolve().parents[1] / "tests"
           / "fixtures" / "golden_inputs.npz")
    out.parent.mkdir(exist_ok=True)

    psf_set = make_star_stamps(n_stars=5, n_pix=16, s=2, seed=7,
                               fwhm_x=2.7, fwhm_y=2.7)
    phot_set = make_star_stamps(n_stars=6, n_pix=16, s=2, seed=11,
                                fwhm_x=2.5, fwhm_y=2.5)
    m = phot_set["psf_true"].shape[-1]
    np.savez(
        out,
        psf_stars=psf_set["data"].astype(np.float32),
        psf_noise=psf_set["sigma"].astype(np.float32),
        phot_data=phot_set["data"].astype(np.float32),
        phot_noise=phot_set["sigma"].astype(np.float32),
        phot_psf=np.broadcast_to(phot_set["psf_true"],
                                 (6, m, m)).astype(np.float32),
        phot_true_flux=phot_set["a_true"].astype(np.float32),
        subsampling_factor=np.int64(2),
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
