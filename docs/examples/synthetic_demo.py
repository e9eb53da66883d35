"""Self-contained demo: synthesize a tiny dataset and run the pipeline.

Generates 3 wide-field frames of a fake blended target (two point
sources) surrounded by 8 reference stars, a matching Gaia fixture (so no
network is needed), a config file and a header parser — then runs all 12
pipeline tasks and prints where the products landed.

Run:  python docs/examples/synthetic_demo.py /tmp/lc_demo
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import yaml

ROI_RA, ROI_DEC = 42.2031, 19.22528
PIXEL_SCALE = 0.2 / 3600.0     # deg / px
FRAME_SIZE = 160
EXPTIME, GAIN, SKY_E_S = 30.0, 1.2, 10.0
N_FRAMES = 3
STARS = [  # (dRA", dDec", flux e-/s)
    (-6, -6, 800.0), (6, -6, 600.0), (-6, 6, 1000.0), (6, 6, 700.0),
    (8, 0, 500.0), (0, 8, 900.0), (-8, 0, 650.0), (0, -8, 750.0),
]
POINT_SOURCES = {"A": (-0.8, 0.5), "B": (0.7, -0.6)}
PS_FLUXES = {"A": [300.0, 360.0, 330.0], "B": [150.0, 120.0, 135.0]}
FWHM_PX = [2.6, 3.1, 2.8]
DITHER_PX = [(0.0, 0.0), (1.4, -0.8), (-1.1, 0.6)]


def sky(dx_arcsec, dy_arcsec):
    return (float(ROI_RA + dx_arcsec / 3600.0
                  / np.cos(np.radians(ROI_DEC))),
            float(ROI_DEC + dy_arcsec / 3600.0))


def moffat(xx, yy, x0, y0, flux, fwhm, beta=2.8):
    alpha = fwhm / (2 * np.sqrt(2.0 ** (1.0 / beta) - 1.0))
    rr2 = (xx - x0) ** 2 + (yy - y0) ** 2
    return flux * (beta - 1) / (np.pi * alpha**2) \
        * (1 + rr2 / alpha**2) ** (-beta)


def main(workdir):
    from lightcurver_tpu.io.fits import write_fits, Header
    from lightcurver_tpu.io.wcs import TanWCS

    workdir = Path(workdir)
    raw = workdir / "raw"
    raw.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(1)
    yy, xx = np.mgrid[0:FRAME_SIZE, 0:FRAME_SIZE]

    # ---- synthetic frames (ADU, with WCS + the three required cards) ---
    for k in range(N_FRAMES):
        c = (FRAME_SIZE + 1) / 2.0
        wcs = TanWCS(ROI_RA, ROI_DEC, c + DITHER_PX[k][0],
                     c + DITHER_PX[k][1],
                     [[-PIXEL_SCALE, 0.0], [0.0, PIXEL_SCALE]])
        img = np.zeros((FRAME_SIZE, FRAME_SIZE))
        for dx, dy, flux in STARS:
            x, y = wcs.world_to_pixel(*sky(dx, dy))
            img += moffat(xx, yy, float(x), float(y), flux, FWHM_PX[k])
        for ps, (dx, dy) in POINT_SOURCES.items():
            x, y = wcs.world_to_pixel(*sky(dx, dy))
            img += moffat(xx, yy, float(x), float(y),
                          PS_FLUXES[ps][k], FWHM_PX[k])
        total_e = (img + SKY_E_S) * EXPTIME
        adu = (total_e + rng.normal(0, np.sqrt(total_e))) / GAIN
        header = Header()
        header["MJD-OBS"] = 60000.0 + 2.0 * k
        header["EXPTIME"] = EXPTIME
        header["GAIN"] = GAIN
        header.update(wcs.to_header_cards())
        write_fits(raw / f"frame_{k:02d}.fits", adu.astype(np.float32),
                   header)

    # ---- offline Gaia fixture (instead of a live TAP query) ------------
    rows = []
    for i, (dx, dy, flux) in enumerate(STARS):
        ra, dec = sky(dx, dy)
        g = 20.0 - 2.5 * np.log10(flux)
        rows.append({"ra": ra, "dec": dec, "source_id": 1000 + i,
                     "phot_g_mean_mag": g, "phot_bp_mean_mag": g + 0.5,
                     "phot_rp_mean_mag": g - 0.5, "pmra": 0.0,
                     "pmdec": 0.0, "ref_epoch": 2016.0})
    fixture = workdir / "gaia_fixture.csv"
    pd.DataFrame(rows).to_csv(fixture, index=False)

    # ---- header parser plugin ------------------------------------------
    parser_dir = workdir / "header_parser"
    parser_dir.mkdir(exist_ok=True)
    (parser_dir / "parse_header.py").write_text(
        "def parse_header(header):\n"
        "    return {'mjd': header['MJD-OBS'], 'gain': header['GAIN'],\n"
        "            'exptime': header['EXPTIME']}\n")

    # ---- config: shipped template + demo-sized values -------------------
    template = (Path(__file__).resolve().parents[2] / "lightcurver_tpu"
                / "pipeline" / "example_config_file" / "config.yaml")
    config = yaml.safe_load(template.read_text())
    config.update({
        "workdir": str(workdir), "raw_dirs": [str(raw)],
        "already_plate_solved": 1, "multiprocessing_cpu_count": 1,
        "star_selection_strategy": "ROI_disk",
        "ROI_disk_radius_arcseconds": 30, "min_number_stars": 5,
        "stamp_size_stars": 16, "stamp_size_ROI": 24,
        "subsampling_factor": 2,
        "psf_n_iter_analytic": 40, "psf_n_iter_pixels": 300,
        "star_deconv_n_iter": 400,
        "roi_deconv_translations_iters": 60,
        "roi_deconv_all_iters": 800,
        "deconv_checkpoint_every": 200,   # resumable long fits
        "point_sources": {ps: list(sky(dx, dy))
                          for ps, (dx, dy) in POINT_SOURCES.items()},
        "fix_point_source_astrometry": 0.5,
    })
    config["ROI"] = {"demo": {"coordinates": [ROI_RA, ROI_DEC]}}
    config_path = workdir / "config.yaml"
    config_path.write_text(yaml.dump(config))

    os.environ["LIGHTCURVER_CONFIG"] = str(config_path)
    os.environ["LIGHTCURVER_GAIA_FIXTURE"] = str(fixture)

    from lightcurver_tpu.pipeline.workflow_manager import WorkflowManager

    WorkflowManager().run()

    out = workdir / "prepared_roi_cutouts"
    print("\nDone. Products:")
    for f in sorted(out.glob("*")):
        print("  ", f)
    print("Diagnostics:", workdir / "plots")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/lc_demo")
