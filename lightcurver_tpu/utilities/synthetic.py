"""Host-side (numpy) synthetic-scene renderer for tests and benchmarks.

Implements the same forward model as the JAX core (core/deconv/model.py)
in pure numpy, so data generation never dispatches eager device ops —
on the tunneled TPU backend each eager dispatch costs ~seconds, and
benchmark setup was measured at 188 s when generated with eager JAX.
"""

import math

import numpy as np

_FWHM_OVER_SIGMA = 2.0 * math.sqrt(2.0 * math.log(2.0))
TARGET_FWHM_FINE_PIX = 2.0


def _freqs(L):
    fy = np.fft.fftfreq(L).reshape(L, 1)
    fx = np.fft.rfftfreq(L).reshape(1, L // 2 + 1)
    return fy, fx


def r_kernel_fft_np(m):
    sigma_f = TARGET_FWHM_FINE_PIX / _FWHM_OVER_SIGMA
    fy, fx = _freqs(2 * m)
    return np.exp(-2.0 * np.pi**2 * sigma_f**2 * (fy**2 + fx**2))


def moffat_np(m, s, fwhm_x, fwhm_y, beta):
    """Unit-integral elliptical Moffat on the fine grid (numpy)."""
    c = (m - 1) / 2.0
    idx = (np.arange(m) - c) / s
    y, x = np.meshgrid(idx, idx, indexing="ij")
    root = math.sqrt(2.0 ** (1.0 / beta) - 1.0)
    ax, ay = fwhm_x / (2 * root), fwhm_y / (2 * root)
    u = (x / ax) ** 2 + (y / ay) ** 2
    norm = (beta - 1.0) / (math.pi * ax * ay * s**2)
    return (norm * (1.0 + u) ** (-beta)).astype(np.float32)


def render_epochs_np(psf, a, px, py, s, h=None):
    """Render clean data stamps for all epochs.

    Args:
        psf: (N, m, m) narrow PSFs (will be unit-normalized).
        a: (N, M) fluxes.
        px, py: (M,) or (N, M) positions, data px, center origin.
        s: subsampling factor.
        h: optional (m, m) background channel.

    Returns:
        (N, n, n) float32 stamps.
    """
    psf = np.asarray(psf, dtype=np.float64)
    N, m = psf.shape[0], psf.shape[-1]
    n = m // s
    L = 2 * m
    a = np.asarray(a, dtype=np.float64)
    M = a.shape[1]
    px = np.broadcast_to(np.asarray(px, dtype=np.float64), (N, M))
    py = np.broadcast_to(np.asarray(py, dtype=np.float64), (N, M))
    fy, fx = _freqs(L)
    r_hat = r_kernel_fft_np(m)
    c = (m - 1) / 2.0
    center_phase = np.exp(1j * 2 * np.pi * (fy + fx) * c)

    h_hat = None if h is None \
        else np.fft.rfft2(h, s=(L, L)) * center_phase
    out = np.empty((N, n, n), dtype=np.float32)
    for e in range(N):
        t = psf[e] / psf[e].sum()
        t_hat = np.fft.rfft2(t, s=(L, L))
        spec = np.zeros_like(t_hat)
        for j in range(M):
            ang = -2 * np.pi * (fy * s * py[e, j] + fx * s * px[e, j])
            spec += a[e, j] * np.exp(1j * ang)
        total = spec * t_hat * r_hat
        if h_hat is not None:
            total += h_hat * t_hat
        fine = np.fft.irfft2(total, s=(L, L))[:m, :m]
        out[e] = fine.reshape(n, s, n, s).sum(axis=(1, 3)).astype(np.float32)
    return out


def make_roi_scene(n_epochs=100, n_pix=64, s=2, n_sources=4, noise_sigma=0.3,
                   seed=7, fwhm_range=(2.2, 4.0), flux_range=(40.0, 120.0)):
    """Synthetic multi-epoch blended-point-source scene.

    Returns:
        dict with data, sigma_2, psf, xs, ys, s, a_true.
    """
    rng = np.random.default_rng(seed)
    m = n_pix * s
    fwhms = rng.uniform(*fwhm_range, n_epochs)
    psf = np.stack([moffat_np(m, s, f, f, beta=2.8) for f in fwhms])
    xs = np.array([-4.0, 4.0, 0.0, -1.5], np.float32)[:n_sources]
    ys = np.array([2.0, -3.0, 4.5, -1.0], np.float32)[:n_sources]
    a_true = rng.uniform(*flux_range,
                         size=(n_epochs, n_sources)).astype(np.float32)
    clean = render_epochs_np(psf, a_true, xs[None, :], ys[None, :], s)
    sigma = np.full_like(clean, noise_sigma)
    data = clean + rng.normal(0, noise_sigma, clean.shape).astype(np.float32)
    return {
        "data": data, "sigma_2": (sigma**2).astype(np.float32),
        "psf": psf.astype(np.float32), "xs": xs, "ys": ys, "s": s,
        "a_true": a_true,
        # the per-epoch seeing actually drawn: consumers computing SNR
        # from the scene (tools/degeneracy_study._snr) must not fall
        # back to an assumed constant
        "fwhm": fwhms.astype(np.float32),
    }


def make_psf_task_workdir(workdir, n_frames=64, n_stars=8, n_pix=64, s=2,
                          seed=11, config_overrides=None):
    """Build a ready-to-run workdir for the PSF-modelling PIPELINE task.

    Creates exactly the inputs ``processes.psf_modelling.model_all_psfs``
    reads — the frames/stars/stars_in_frames tables and the regions HDF5
    with per-star stamps — without running the upstream pipeline, so the
    production task (HDF5 reads, neighbour masking, vmapped fits,
    pipelined store, DB writes) can be benchmarked end-to-end at any
    frame count (VERDICT r4 #3: the reference's 2-3 s/frame figure
    includes load + plot + DB, reference
    docs/mkdocs/contents/tutorial.md:273-274).

    Returns the config path (set LIGHTCURVER_CONFIG to it).
    """
    import sqlite3

    import h5py
    import yaml

    from pathlib import Path

    from ..structure.database import initialize_database
    from .star_naming import generate_star_names

    workdir = Path(workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    (workdir / "frames").mkdir(exist_ok=True)

    template = (Path(__file__).parent.parent / "pipeline"
                / "example_config_file" / "config.yaml")
    with open(template) as f:
        config = yaml.safe_load(f)
    config.update({
        "workdir": str(workdir),
        "raw_dirs": [str(workdir / "raw")],
        "already_plate_solved": 1,
        "star_selection_strategy": "ROI_disk",
        "ROI_disk_radius_arcseconds": 30,
        "stamp_size_stars": n_pix,
        "subsampling_factor": s,
    })
    config["ROI"] = {"bench": {"coordinates": [42.2031, 19.22528]}}
    config.update(config_overrides or {})
    config_path = workdir / "config.yaml"
    config_path.write_text(yaml.dump(config))

    initialize_database(workdir / "database.sqlite3")

    # ROI_disk: the footprint hash is the radius hash, frame-independent
    fhash = hash(config["ROI_disk_radius_arcseconds"])
    names = generate_star_names(n_stars)
    conn = sqlite3.connect(workdir / "database.sqlite3")
    try:
        for i, name in enumerate(names):
            conn.execute(
                "INSERT INTO stars (gaia_id, name, ra, dec, gmag, "
                "combined_footprint_hash, distance_to_roi_arcsec) "
                "VALUES (?,?,?,?,?,?,?)",
                (1000 + i, name, 42.2031 + 1e-3 * i, 19.22528, 17.5,
                 fhash, 5.0 * (i + 1)))
        with h5py.File(workdir / "regions.h5", "w") as f:
            for k in range(n_frames):
                rel = f"frames/frame_{k:04d}.fits"
                conn.execute(
                    "INSERT INTO frames (id, mjd, exptime, gain, "
                    "image_relpath, plate_solved, eliminated, "
                    "roi_in_footprint, seeing_pixels, pixel_scale) "
                    "VALUES (?,?,?,?,?,1,0,1,?,?)",
                    (k + 1, 60000.0 + k, 30.0, 1.2, rel,
                     2.4 + 0.01 * (k % 40), 0.2))
                for gid in range(1000, 1000 + n_stars):
                    conn.execute(
                        "INSERT INTO stars_in_frames (frame_id, "
                        "star_gaia_id, combined_footprint_hash) "
                        "VALUES (?,?,?)", (k + 1, gid, fhash))
                st = make_star_stamps(
                    n_stars=n_stars, n_pix=n_pix, s=s, seed=seed + k,
                    fwhm_x=2.4 + 0.01 * (k % 40),
                    fwhm_y=2.4 + 0.01 * (k % 40))
                grp = f.create_group(rel)
                grp["frame_shape"] = np.array([2048, 2048])
                for sub in ("data", "noisemap", "cosmicsmask",
                            "image_pixel_coordinates"):
                    grp.create_group(sub)
                for j, gid in enumerate(range(1000, 1000 + n_stars)):
                    grp["data"][str(gid)] = st["data"][j]
                    grp["noisemap"][str(gid)] = st["sigma"][j]
                    grp["cosmicsmask"][str(gid)] = np.zeros(
                        (n_pix, n_pix), dtype=bool)
                    grp["image_pixel_coordinates"][str(gid)] = np.array(
                        [300.0 + 100.0 * j, 400.0 + 80.0 * j])
        conn.commit()
    finally:
        conn.close()
    return config_path


def make_star_stamps(n_stars=8, n_pix=64, s=2, seed=3, fwhm_x=3.0,
                     fwhm_y=2.6, beta=2.6, flux_range=(200.0, 800.0)):
    """Synthetic single-frame star stamps sharing one PSF (for build_psf)."""
    rng = np.random.default_rng(seed)
    m = n_pix * s
    psf = moffat_np(m, s, fwhm_x, fwhm_y, beta)
    a = rng.uniform(*flux_range, n_stars).astype(np.float32)
    x0 = rng.uniform(-0.4, 0.4, n_stars).astype(np.float32)
    y0 = rng.uniform(-0.4, 0.4, n_stars).astype(np.float32)
    psf_stack = np.broadcast_to(psf, (n_stars, m, m))
    clean = render_epochs_np(psf_stack, a[:, None], x0[:, None], y0[:, None],
                             s)
    sigma = np.sqrt(np.abs(clean) + 1.0).astype(np.float32)
    data = clean + rng.normal(0, 1, clean.shape).astype(np.float32) * sigma
    return {"data": data, "sigma": sigma, "psf_true": psf, "a_true": a,
            "x0": x0, "y0": y0, "s": s}
