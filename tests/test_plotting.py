"""Plotting smoke tests: every diagnostic renders without error."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture()
def stamps():
    rng = np.random.default_rng(0)
    data = rng.normal(0, 1, (4, 16, 16)).astype(np.float32) + 5.0
    noise = np.ones_like(data)
    return data, noise


def test_psf_diagnostic(stamps, tmp_path):
    from lightcurver_tpu.plotting.psf_plotting import plot_psf_diagnostic

    data, noise = stamps
    out = tmp_path / "psf.jpg"
    plot_psf_diagnostic(
        datas=data, noisemaps=noise, residuals=0.1 * data,
        full_psf=data[0], loss_curve=np.linspace(10, 1, 50),
        masks=np.ones_like(data, dtype=bool), names=list("abcd"),
        diagnostic_text="test", save_path=out)
    assert out.exists() and out.stat().st_size > 0


def test_joint_modelling_diagnostic(stamps, tmp_path):
    from lightcurver_tpu.plotting.joint_modelling_plotting import \
        plot_joint_modelling_diagnostic

    data, noise = stamps
    out = tmp_path / "joint.jpg"
    plot_joint_modelling_diagnostic(
        datas=data, noisemaps=noise, residuals=0.1 * data,
        chi2_per_frame=np.array([1.0, 1.1, 0.9, 1.2]),
        loss_curve=np.linspace(10, 1, 50),
        starlet_background=data[0], save_path=out)
    assert out.exists() and out.stat().st_size > 0


def test_photometry_plot(tmp_path):
    from lightcurver_tpu.plotting.photometry_plotting import (
        plot_photometry, find_sources, compute_offsets)

    rng = np.random.default_rng(1)
    mjd = np.concatenate([60000 + np.arange(20),
                          60200 + np.arange(20)])
    df = pd.DataFrame({
        "mjd": mjd,
        "A_mag": 18.0 + 0.1 * rng.normal(size=40),
        "A_d_mag": np.full(40, 0.05),
        "B_mag": 19.0 + 0.1 * rng.normal(size=40),
        "B_d_mag": np.full(40, 0.05),
    })
    assert find_sources(df) == ["A", "B"]
    offsets = compute_offsets(df, ["A", "B"])
    assert set(offsets) == {"A", "B"}
    # brightest source anchors at 0; the fainter is pulled up past it
    # by the scatter-weighted separation (reference compute_offsets)
    assert offsets["A"] == 0.0
    assert offsets["B"] < 0.0
    out = tmp_path / "curves.jpg"
    plot_photometry(df, save_path=out)
    assert out.exists() and out.stat().st_size > 0


def test_photometry_plot_seasons_and_scatter_columns(tmp_path):
    """Publication-plot parity features: proportional season panels,
    break indicators, asymmetric+scatter error averaging, CSV input
    (reference plotting/photometry_plotting.py:31-292)."""
    from lightcurver_tpu.plotting.photometry_plotting import (
        find_segments, plot_photometry)

    rng = np.random.default_rng(2)
    # three seasons of very different lengths
    mjd = np.concatenate([60000 + np.arange(10),
                          60300 + np.arange(60),
                          60800 + np.arange(25)])
    n = len(mjd)
    df = pd.DataFrame({
        "mjd": mjd,
        "A_mag": 18.0 + 0.1 * rng.normal(size=n),
        "A_d_mag_down": np.full(n, 0.04),
        "A_d_mag_up": np.full(n, 0.06),
        "A_scatter_mag_down": np.full(n, 0.02),
        "A_scatter_mag_up": np.full(n, 0.02),
        "B_mag": 19.5 + 0.3 * rng.normal(size=n),
        "B_d_mag_down": np.full(n, 0.08),
        "B_d_mag_up": np.full(n, 0.08),
    })
    segments = find_segments(df["mjd"], gap_threshold=70.0)
    assert len(segments) == 3
    assert segments[0] == (60000.0, 60009.0)

    csv = tmp_path / "phot.csv"
    df.to_csv(csv, index=False)
    out = tmp_path / "seasons.jpg"
    fig = plot_photometry(csv, save_path=out, plot_title="demo")
    assert out.exists() and out.stat().st_size > 0
    # one panel per season, widths proportional to season durations
    widths = [ax.get_position().width for ax in fig.axes]
    assert len(widths) == 3
    assert widths[1] > widths[2] > widths[0]


def test_html_visualisation(tmp_path):
    from lightcurver_tpu.plotting.html_visualisation import \
        generate_lightcurve_html

    df = pd.DataFrame({
        "mjd": [60000.0, 60001.0, 60002.0],
        "A_mag": [18.0, 18.1, np.nan],
        "A_d_mag": [0.05, 0.04, np.nan],
    })
    out = tmp_path / "curves.html"
    generate_lightcurve_html(df, out)
    html = out.read_text()
    assert "const DATA" in html
    assert "18.1" in html
    assert "null" in html  # NaN serialized as null


def test_footprint_and_sources_plots(tmp_path):
    from lightcurver_tpu.plotting.footprint_plotting import plot_footprints
    from lightcurver_tpu.plotting.sources_plotting import (
        plot_sources, plot_footprints_with_stars)
    from lightcurver_tpu.utilities.geometry import SimplePolygon

    polys = [np.array([[0, 0], [1, 0], [1, 1], [0, 1]]) + 0.1 * i
             for i in range(3)]
    common = SimplePolygon([[0.2, 0.2], [1, 0.2], [1, 1], [0.2, 1]])
    largest = SimplePolygon([[0, 0], [1.2, 0], [1.2, 1.2], [0, 1.2]])
    out = tmp_path / "fp.jpg"
    plot_footprints(polys, common, largest, save_path=out)
    assert out.exists()

    rng = np.random.default_rng(2)
    image = rng.normal(0, 1, (50, 50))
    sources = pd.DataFrame({"x": [10.0, 30.0], "y": [20.0, 40.0]})
    out2 = tmp_path / "src.jpg"
    plot_sources(sources, image, save_path=out2)
    assert out2.exists()

    stars = pd.DataFrame({"name": ["a", "roi"], "ra": [0.5, 0.6],
                          "dec": [0.5, 0.6]})
    out3 = tmp_path / "fps.jpg"
    plot_footprints_with_stars(polys, stars, save_path=out3)
    assert out3.exists()


def test_photometry_plot_degenerate_inputs(tmp_path):
    """Round-3 review regressions: NaN mjd rows, error-less sources and
    an all-NaN source must not crash the plot or poison the offsets."""
    from lightcurver_tpu.plotting.photometry_plotting import (
        compute_offsets, find_sources, plot_photometry)

    mjd = np.concatenate([np.linspace(60000, 60030, 10), [np.nan]])
    rng = np.random.default_rng(0)
    df = pd.DataFrame({
        "mjd": mjd,
        # error-less source: qualifies (zero-width bars)
        "A_mag": 18.0 + 0.01 * rng.normal(size=11),
        # all-NaN source: offset must stay finite (0.0)
        "B_mag": np.full(11, np.nan),
        "C_mag": 19.0 + 0.01 * rng.normal(size=11),
        "C_d_mag": np.full(11, 0.02),
    })
    assert find_sources(df) == ["A", "B", "C"]
    offsets = compute_offsets(df, ["A", "B", "C"])
    assert np.isfinite(list(offsets.values())).all()
    assert offsets["B"] == 0.0

    out = tmp_path / "degenerate.jpg"
    plot_photometry(df, save_path=out)
    assert out.exists()

    # a frame with no finite mjd at all gets a CLEAR error
    df_bad = df.copy()
    df_bad["mjd"] = np.nan
    with pytest.raises(ValueError, match="mjd"):
        plot_photometry(df_bad)


def test_joint_modelling_diagnostic_without_chi2(stamps, tmp_path):
    """No chi2 ranking -> the third panel must NOT claim epoch 0 is the
    'worst epoch' (there is no ranking to say so)."""
    from lightcurver_tpu.plotting.joint_modelling_plotting import \
        plot_joint_modelling_diagnostic

    data, noise = stamps
    fig = plot_joint_modelling_diagnostic(
        datas=data, noisemaps=noise, residuals=0.1 * data)
    titles = [ax.get_title() for ax in fig.axes]
    assert "epoch 0" in titles
    assert not any("worst" in t for t in titles)
    import matplotlib.pyplot as plt
    plt.close(fig)


def test_normalization_plot_survives_zero_coefficient(tmp_path,
                                                      monkeypatch):
    """One degenerate frame (coefficient 0) must not blow the normalized
    panel's autoscale to infinity."""
    from lightcurver_tpu.plotting import normalization_plotting as npl

    coeffs = pd.DataFrame({
        "frame_id": [1, 2, 3],
        "mjd": [60000.0, 60001.0, 60002.0],
        "coefficient": [1.0, 0.0, 1.1],
        "coefficient_uncertainty": [0.01, 0.01, 0.01],
    })
    fluxes = pd.DataFrame({
        "name": ["s1"] * 3 + ["s2"] * 3,
        "mjd": [60000.0, 60001.0, 60002.0] * 2,
        "flux": [100.0, 100.0, 110.0, 50.0, 55.0, 52.0],
        "flux_uncertainty": [1.0] * 6,
        "coefficient": [1.0, 0.0, 1.1] * 2,
    })
    results = [coeffs, fluxes]
    monkeypatch.setattr(npl, "execute_sqlite_query",
                        lambda *a, **k: results.pop(0))
    out = tmp_path / "norm.jpg"
    fig = npl.plot_normalized_star_curves("hash", save_path=out)
    assert out.exists() and out.stat().st_size > 0
    ax2 = fig.axes[1]
    lo, hi = ax2.get_ylim()
    assert np.isfinite(lo) and np.isfinite(hi)
