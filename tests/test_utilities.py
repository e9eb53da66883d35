"""Utilities: polygons, naming, grouping, magnitudes, stats."""

import numpy as np
import pandas as pd
import pytest


class TestGeometry:
    def test_intersection_of_offset_squares(self):
        from lightcurver_tpu.utilities.geometry import SimplePolygon

        a = SimplePolygon([(0, 0), (2, 0), (2, 2), (0, 2)])
        b = SimplePolygon([(1, 1), (3, 1), (3, 3), (1, 3)])
        inter = a.intersection(b)
        assert inter.area == pytest.approx(1.0)
        union = a.union(b)
        # EXACT union: 4 + 4 - 1 overlap (round 5; hull gave >= 7)
        assert union.area == pytest.approx(7.0, abs=1e-12)

    def test_contains_and_margin(self):
        from lightcurver_tpu.utilities.geometry import SimplePolygon

        sq = SimplePolygon([(0, 0), (10, 0), (10, 10), (0, 10)])
        assert sq.contains(5, 5)
        assert not sq.contains(11, 5)
        assert sq.buffered_contains(5, 5, margin=1.0)
        assert not sq.buffered_contains(0.5, 5, margin=1.0)

    def test_mapping_roundtrip(self):
        from lightcurver_tpu.utilities.geometry import SimplePolygon

        sq = SimplePolygon([(0, 0), (2, 0), (2, 2), (0, 2)])
        m = sq.mapping()
        assert m["type"] == "Polygon"
        sq2 = SimplePolygon.from_mapping(m)
        assert sq2.area == pytest.approx(sq.area)


def test_star_names():
    from lightcurver_tpu.utilities.star_naming import generate_star_names

    names = generate_star_names(30)
    assert names[:3] == ["a", "b", "c"]
    assert names[25] == "z"
    assert names[26] == "aa"
    assert names[27] == "ab"


def test_rescale_image_coordinates():
    from lightcurver_tpu.utilities.image_coordinates import \
        rescale_image_coordinates

    # center of a 100x200 image (x along columns=200)
    out = rescale_image_coordinates(
        np.array([[99.5, 49.5]]), image_shape=(100, 200))
    np.testing.assert_allclose(out, [[0.0, 0.0]], atol=1e-12)
    # bottom-left corner
    out = rescale_image_coordinates(
        np.array([[0.0, 0.0]]), image_shape=(100, 200))
    np.testing.assert_allclose(out, [[-99.5 / 200, -49.5 / 100]])


class TestGrouping:
    def _frame(self):
        return pd.DataFrame({
            "mjd": [60000.0, 60000.01, 60000.02, 60002.0, 60002.01],
            "A_flux": [10.0, 10.2, 9.8, 12.0, 12.4],
            "A_d_flux": [0.1, 0.1, 0.1, 0.2, 0.2],
        })

    def test_grouping_by_gap(self):
        from lightcurver_tpu.utilities.lightcurves_postprocessing import \
            group_observations

        out = group_observations(self._frame(), threshold=0.8)
        assert len(out) == 2
        assert out["A_count_flux"].tolist() == [3, 2]
        # equal weights -> plain mean
        assert out["A_flux"][0] == pytest.approx(10.0)
        assert out["A_d_flux"][0] == pytest.approx(0.1 / np.sqrt(3))

    def test_magnitudes_asymmetric(self):
        from lightcurver_tpu.utilities.lightcurves_postprocessing import \
            convert_flux_to_magnitude

        df = pd.DataFrame({
            "mjd": [1.0, 2.0],
            "A_flux": [100.0, 1.0],
            "A_d_flux": [10.0, 2.0],   # second: flux - err < 0 -> NaN up
            "zeropoint": [25.0, 25.0],
        })
        out = convert_flux_to_magnitude(df)
        assert out["A_mag"][0] == pytest.approx(-2.5 * np.log10(100) + 25)
        expected_down = (-2.5 * np.log10(100) + 25) - \
            (-2.5 * np.log10(110) + 25)
        assert out["A_d_mag_down"][0] == pytest.approx(expected_down)
        assert np.isnan(out["A_d_mag_up"][1])

    def test_missing_zeropoint_warns(self):
        from lightcurver_tpu.utilities.lightcurves_postprocessing import \
            convert_flux_to_magnitude

        df = pd.DataFrame({"A_flux": [10.0], "A_d_flux": [1.0]})
        with pytest.warns(RuntimeWarning):
            out = convert_flux_to_magnitude(df)
        assert out["A_mag"][0] == pytest.approx(-2.5 * np.log10(10.0))


def test_sigma_clipped_stats():
    from lightcurver_tpu.utilities.stats import sigma_clipped_stats

    rng = np.random.default_rng(1)
    data = rng.normal(5.0, 1.0, 1000)
    data[:10] = 1000.0  # outliers
    mean, median, std = sigma_clipped_stats(data, sigma=3.0)
    assert mean == pytest.approx(5.0, abs=0.15)
    assert std == pytest.approx(1.0, abs=0.15)


def test_proper_motion():
    from lightcurver_tpu.utilities.coordinates import apply_proper_motion

    # 1000 mas/yr in dec for 10 years = 10 arcsec
    ra, dec = apply_proper_motion(10.0, 0.0, 0.0, 1000.0, 2016.0,
                                  51544.5 + 26 * 365.25)  # J2026
    assert (dec - 0.0) * 3600 == pytest.approx(10.0, rel=1e-6)


class TestFootprintRAWrap:
    """Round-3 review finding: flat-plane footprint math must survive
    fields straddling RA = 0 (corner RAs wrapped into [0, 360) used to
    produce ~360-degree-wide polygons)."""

    def test_unwrap_ra(self):
        from lightcurver_tpu.utilities.footprint import unwrap_ra

        assert float(unwrap_ra(359.9, 0.0)) == pytest.approx(-0.1)
        assert float(unwrap_ra(0.1, 0.0)) == pytest.approx(0.1)
        assert float(unwrap_ra(0.05, 359.9)) == pytest.approx(360.05)
        assert float(unwrap_ra(42.2, 42.0)) == pytest.approx(42.2)
        np.testing.assert_allclose(
            np.asarray(unwrap_ra(np.array([359.9, 0.1]), 0.0)),
            [-0.1, 0.1])

    def test_calc_common_footprint_across_seam(self):
        from lightcurver_tpu.utilities.footprint import (
            calc_common_and_total_footprint)

        # two overlapping 0.2-deg fields straddling RA = 0, as the
        # (wrapped) WCS corner convention would historically store them
        fp1 = [(359.95, 9.9), (0.15 + 360 * 0, 9.9),
               (0.15, 10.1), (359.95, 10.1)]
        fp1 = [(ra % 360.0, dec) for ra, dec in fp1]
        fp2 = [((ra - 0.05) % 360.0, dec) for ra, dec in fp1]
        common, largest = calc_common_and_total_footprint([fp1, fp2])
        assert common is not None
        # intersection spans 0.15 x 0.2 deg; union 0.25 x 0.2 deg
        assert common.area == pytest.approx(0.15 * 0.2, rel=1e-6)
        assert largest.area == pytest.approx(0.25 * 0.2, rel=1e-6)
        # the polygon lives in ONE continuous window ...
        verts = np.asarray(common.mapping()["coordinates"][0])
        assert verts[:, 0].max() - verts[:, 0].min() < 1.0
        # ... and containment works across the seam: the overlap spans
        # RA [-0.05, 0.10] unwrapped (x dec [9.9, 10.1]), so RA 0.0 —
        # dead on the seam — is inside and RA 0.14 (fp1-only) is not
        from lightcurver_tpu.utilities.footprint import unwrap_ra

        window_center = float(verts[:, 0].mean())
        roi_ra, roi_dec = 0.0, 10.0       # dead on the seam
        assert common.contains(
            float(unwrap_ra(roi_ra, window_center)), roi_dec)
        # a point OUTSIDE the common overlap must not be contained
        assert not common.contains(
            float(unwrap_ra(0.14, window_center)), roi_dec)


def test_underscore_point_source_labels():
    """Labels containing underscores ('QSO_A') must survive nightly
    grouping and magnitude conversion (round-3 review finding: the
    reference's split('_')[0] crashed at the pipeline's last step)."""
    import pandas as pd

    from lightcurver_tpu.utilities.lightcurves_postprocessing import (
        convert_flux_to_magnitude, group_observations)

    df = pd.DataFrame({
        "mjd": [60000.0, 60000.01, 60003.0],
        "zeropoint": [25.0, 25.0, 25.0],
        "QSO_A_flux": [100.0, 110.0, 105.0],
        "QSO_A_d_flux": [5.0, 5.0, 5.0],
    })
    nightly = group_observations(df)
    assert len(nightly) == 2
    assert "QSO_A_flux" in nightly.columns
    mags = convert_flux_to_magnitude(nightly)
    assert np.isfinite(mags["QSO_A_mag"]).all()
    assert np.isfinite(mags["QSO_A_d_mag"]).all()


def test_html_report_survives_nan_mjd(tmp_path):
    """One NaN MJD row must not blank the whole interactive SVG, and
    underscore labels must appear in the report."""
    import json
    import re

    import pandas as pd

    from lightcurver_tpu.plotting.html_visualisation import \
        generate_lightcurve_html

    df = pd.DataFrame({
        "mjd": [60000.0, np.nan, 60002.0],
        "QSO_A_mag": [18.0, 18.1, 18.2],
        "QSO_A_d_mag": [0.01, 0.01, 0.01],
    })
    out = tmp_path / "curves.html"
    generate_lightcurve_html(df, out)
    html = out.read_text()
    payload = json.loads(
        re.search(r"const DATA = (\{.*?\});", html).group(1))
    assert payload["mjd"] == [60000.0, 60002.0]  # NaN row dropped
    assert "QSO_A" in payload["sources"]
    assert len(payload["sources"]["QSO_A"]["mag"]) == 2


def test_name_list_comma_and_char_semantics():
    """'abcd' keeps the reference's char-split semantics; 'aa,ab'
    (multi-char spreadsheet names past 26 stars) splits on commas —
    previously "aa" became ['a', 'a']."""
    from lightcurver_tpu.structure.user_config import _as_name_list

    assert _as_name_list("abcd") == ["a", "b", "c", "d"]
    assert _as_name_list("aa,ab") == ["aa", "ab"]
    assert _as_name_list(" a , aa ") == ["a", "aa"]
    assert _as_name_list(["aa", "b"]) == ["aa", "b"]
    assert _as_name_list(None) is None


def test_nightly_grouping_survives_nan_epoch():
    """One NaN-flux epoch (degenerate fits report NaN by design) must
    not NaN the whole night: the clip and weighted mean run over the
    finite epochs."""
    import pandas as pd

    from lightcurver_tpu.utilities.lightcurves_postprocessing import \
        group_observations

    df = pd.DataFrame({
        "mjd": [60000.0, 60000.01, 60000.02, 60003.0],
        "a_flux": [100.0, np.nan, 102.0, 99.0],
        "a_d_flux": [1.0, 1.0, 1.0, 1.0],
    })
    nightly = group_observations(df)
    assert len(nightly) == 2
    first = nightly.sort_values("mjd").iloc[0]
    assert first["a_count_flux"] == 2          # NaN epoch dropped
    assert abs(first["a_flux"] - 101.0) < 0.5  # finite epochs averaged
    assert np.isfinite(first["a_d_flux"])


def test_source_label_ending_in_d_is_not_dropped():
    """A source the user named 'image_d' must survive grouping and
    magnitude conversion (the suffix blacklist dropped it; the
    set-based rule only drops derived columns of a PRESENT source)."""
    import pandas as pd

    from lightcurver_tpu.utilities.lightcurves_postprocessing import (
        _point_source_names, convert_flux_to_magnitude,
        group_observations)

    cols = ["image_d_flux", "image_d_d_flux"]
    assert _point_source_names(cols) == {"image_d"}
    # ... but a genuine derived column of a present source stays out
    assert _point_source_names(
        ["a_flux", "a_d_flux", "a_scatter_flux"]) == {"a"}

    df = pd.DataFrame({
        "mjd": [60000.0, 60003.0],
        "zeropoint": [25.0, 25.0],
        "image_d_flux": [100.0, 105.0],
        "image_d_d_flux": [2.0, 2.0],
    })
    nightly = group_observations(df)
    mags = convert_flux_to_magnitude(nightly)
    assert np.isfinite(mags["image_d_mag"]).all()


def test_nightly_grouping_drops_nan_mjd_epoch():
    """A NaN-MJD epoch cannot be assigned to a night: it must be
    dropped, not silently merged into the LAST night (np.diff(NaN)
    fails the gap test)."""
    import pandas as pd

    from lightcurver_tpu.utilities.lightcurves_postprocessing import \
        group_observations

    df = pd.DataFrame({
        "mjd": [60000.0, np.nan, 60002.0],
        "a_flux": [100.0, 200.0, 300.0],
        "a_d_flux": [1.0, 1.0, 1.0],
    })
    nightly = group_observations(df)
    assert len(nightly) == 2
    last = nightly.sort_values("mjd").iloc[-1]
    assert last["a_count_flux"] == 1         # the NaN-mjd epoch is gone
    assert abs(last["a_flux"] - 300.0) < 1e-9


def test_zero_variance_epoch_does_not_nuke_the_night():
    """One exactly-zero d_flux epoch (degenerate Fisher error) must be
    excluded like NaN epochs, not discard the whole night."""
    import pandas as pd

    from lightcurver_tpu.utilities.lightcurves_postprocessing import \
        group_observations

    df = pd.DataFrame({
        "mjd": [60000.0, 60000.01, 60000.02],
        "a_flux": [100.0, 500.0, 102.0],
        "a_d_flux": [1.0, 0.0, 1.0],     # middle epoch degenerate
    })
    nightly = group_observations(df)
    assert len(nightly) == 1
    assert nightly["a_count_flux"].iloc[0] == 2
    assert abs(nightly["a_flux"].iloc[0] - 101.0) < 0.5


class TestReferenceGroupingContracts:
    """The reference's own hand-computed grouping/magnitude pins.

    Mirrors reference tests/test_products_handling/test_grouping.py and
    test_magnitude_errors.py value for value — these are the published
    numerical contracts of the post-processing API.
    """

    def test_grouping_multiple_observations(self):
        from lightcurver_tpu.utilities.lightcurves_postprocessing import \
            group_observations

        df = pd.DataFrame({"mjd": [1.0, 1.2, 2.5, 2.6],
                           "A_flux": [10.0, 12.0, 20.0, 22.0],
                           "A_d_flux": [1.0, 1.0, 2.0, 2.0],
                           "other": [100, 200, 300, 400]})
        out = group_observations(df, threshold=0.8)
        assert len(out) == 2
        assert out.loc[0, "A_flux"] == pytest.approx(11.0, abs=1e-3)
        assert out.loc[1, "A_flux"] == pytest.approx(21.0, abs=1e-3)
        # optional non-flux columns are plain-averaged per group
        assert out.loc[0, "other"] == pytest.approx(150.0, abs=1e-3)
        assert out.loc[1, "other"] == pytest.approx(350.0, abs=1e-3)

    def test_single_observation_group(self):
        from lightcurver_tpu.utilities.lightcurves_postprocessing import \
            group_observations

        df = pd.DataFrame({"mjd": [1.0], "A_flux": [10.0],
                           "A_d_flux": [1.0]})
        out = group_observations(df, threshold=0.8)
        assert len(out) == 1
        assert out.loc[0, "A_flux"] == pytest.approx(10.0, abs=1e-3)
        assert out.loc[0, "A_d_flux"] == pytest.approx(1.0, abs=1e-3)
        assert out.loc[0, "A_count_flux"] == 1

    def test_last_group_inclusion(self):
        from lightcurver_tpu.utilities.lightcurves_postprocessing import \
            group_observations

        df = pd.DataFrame({"mjd": [1.0, 1.2, 3.0],
                           "A_flux": [10.0, 12.0, 20.0],
                           "A_d_flux": [1.0, 1.0, 2.0]})
        out = group_observations(df, threshold=0.8)
        assert len(out) == 2
        assert out.loc[0, "A_flux"] == pytest.approx(11.0, abs=1e-5)
        assert out.loc[1, "A_flux"] == pytest.approx(20.0, abs=1e-3)
        assert out.loc[1, "mjd"] == pytest.approx(3.0, abs=1e-5)

    def test_convert_flux_to_magnitude_reference_values(self):
        from lightcurver_tpu.utilities.lightcurves_postprocessing import \
            convert_flux_to_magnitude

        df = pd.DataFrame({"A_flux": [100, 50, 10, 5],
                           "A_d_flux": [10, 5, 2, 6],
                           "A_scatter_flux": [8, 4, 1.5, 3],
                           "zeropoint": [25, 25, 25, 25]})
        out = convert_flux_to_magnitude(df)
        expected = {
            "A_mag": [20.0, 20.7526, 22.5, 23.253],
            "A_d_mag_down": [0.1035, 0.1035, 0.1980, 0.856],
            "A_d_mag_up": [0.1144, 0.1142, 0.2423, np.nan],
            "A_scatter_mag_down": [0.0835, 0.0835, 0.152, 0.510],
            "A_scatter_mag_up": [0.090, 0.090, 0.176, 0.995],
        }
        for col, values in expected.items():
            for i, v in enumerate(values):
                got = out.at[i, col]
                if np.isnan(v):
                    assert np.isnan(got), (col, i)
                else:
                    assert got == pytest.approx(v, abs=1e-2), (col, i)


def test_edge_touching_footprints_have_no_common_area():
    """Two abutting pointings share only an edge: intersection() must
    return None (not a degenerate zero-area polygon), so the pipeline's
    purpose-built 'frames share NO common footprint' error fires instead
    of a collinear POLYGON reaching the Gaia ADQL emitter."""
    from lightcurver_tpu.utilities.geometry import SimplePolygon

    a = SimplePolygon([(10, 0), (11, 0), (11, 1), (10, 1)])
    b = SimplePolygon([(11, 0), (12, 0), (12, 1), (11, 1)])
    assert a.intersection(b) is None
    assert b.intersection(a) is None
    # corner-touching only
    c = SimplePolygon([(11, 1), (12, 1), (12, 2), (11, 2)])
    assert a.intersection(c) is None
    # ... while a genuine sliver of overlap still counts
    d = SimplePolygon([(10.9, 0), (12, 0), (12, 1), (10.9, 1)])
    inter = a.intersection(d)
    assert inter is not None
    assert inter.area == pytest.approx(0.1, rel=1e-9)


def test_sigmaclip_empty_input_is_silent():
    """An all-NaN night hands sigmaclip an empty array: no numpy
    RuntimeWarnings, NaN bounds back."""
    import warnings

    from lightcurver_tpu.utilities.stats import sigmaclip

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        out, lo, hi = sigmaclip(np.array([]))
    assert out.size == 0
    assert np.isnan(lo) and np.isnan(hi)


def test_magnitude_column_without_error_column():
    """A source with a flux column but no d_flux column still gets its
    {ps}_mag column (the docstring's promise); error columns are
    simply absent."""
    from lightcurver_tpu.utilities.lightcurves_postprocessing import \
        convert_flux_to_magnitude

    df = pd.DataFrame({"mjd": [1.0], "zeropoint": [25.0],
                       "A_flux": [100.0]})
    out = convert_flux_to_magnitude(df)
    assert out["A_mag"][0] == pytest.approx(20.0)
    assert "A_d_mag" not in out.columns


def test_get_angle_wcs_is_sip_aware_and_convention_stable():
    """get_angle_wcs routes through TanWCS.north_angle_deg; both agree
    with the CD-only formula on pure-rotation matrices."""
    from lightcurver_tpu.io.wcs import TanWCS
    from lightcurver_tpu.utilities.footprint import get_angle_wcs

    for rot in (0.0, 17.0, -33.0, 178.0):
        th = np.deg2rad(rot)
        scale = 0.2 / 3600.0
        rotm = np.array([[np.cos(th), -np.sin(th)],
                         [np.sin(th), np.cos(th)]])
        cd = rotm @ np.array([[-scale, 0.0], [0.0, scale]])
        w = TanWCS(crval1=150.0, crval2=2.2, crpix1=512.0, crpix2=512.0,
                   cd=cd)
        cd_only = float(np.arctan2(-cd[0, 1], cd[1, 1]) * 180.0 / np.pi)
        assert get_angle_wcs(w) == pytest.approx(cd_only, abs=1e-6)
