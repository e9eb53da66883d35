"""Reference-computed golden parity for the DB-query semantics.

The committed fixture (tests/fixtures/reference_db_golden.json) was
produced by running the REFERENCE's own query functions — `select_stars`
/ `select_stars_for_a_frame` / `query_all_stars_for_frame_and_footprint`
(reference lightcurver/structure/database.py:84-248) and the best-PSF
ROW_NUMBER window (reference
lightcurver/processes/roi_file_preparation.py:34-63) — over a
deterministic synthetic database (tools/record_reference_db_golden.py).
Here the SAME database is rebuilt with OUR `initialize_database` + the
same `populate()` rows, OUR query functions run the same scenario
battery, and the outputs must agree row for row — real
reference-computed parity pins, not self-goldens.

One intentional divergence is pinned explicitly: our best-PSF window
partitions WITHIN the requested footprint hash
(processes/roi_file_preparation.py:30-35), so a stale-footprint PSF
with a marginally lower chi2 cannot steal rn=1 and silently drop the
frame.  The fixture records the reference DROPPING frame 1 to the
stale HASH_OTHER chi2-0.7 PSF; we assert our query keeps it with the
correct in-footprint best PSF.
"""

import json
import pathlib
import sqlite3
import sys

import pytest

FIXTURES = pathlib.Path(__file__).parent / "fixtures"

# the row our footprint-scoped window must restore: frame 1, mjd
# 60003.3, in-footprint best PSF chi2 1.1 / psf_ref 'abcd', coeff 1.02
FRAME1_FIXED_ROW = [1, 60003.3, 1.1, "abcd", 1.02]


@pytest.fixture(scope="module")
def golden():
    return json.loads((FIXTURES / "reference_db_golden.json").read_text())


@pytest.fixture()
def ours(tmp_path, monkeypatch):
    sys.path.insert(0, str(pathlib.Path(__file__).parents[1] / "tools"))
    import record_reference_db_golden as rec
    from lightcurver_tpu.processes import roi_file_preparation as roi
    from lightcurver_tpu.structure import database as db

    db_path = tmp_path / "database.sqlite3"
    db.initialize_database(db_path)
    conn = sqlite3.connect(db_path)
    rec.populate(conn)
    conn.close()
    from lightcurver_tpu.processes import absolute_zeropoint_calculation \
        as zp
    from lightcurver_tpu.processes import normalization_calculation as norm
    from lightcurver_tpu.utilities import absolute_magnitudes_from_gaia \
        as gaia_mags
    from lightcurver_tpu.utilities import chi2_selector

    cfg = rec.zp_config(str(db_path), plots_dir=tmp_path / "plots")
    for mod in (db, zp, gaia_mags, norm, chi2_selector):
        monkeypatch.setattr(mod, "get_user_config", lambda: cfg)
    out = rec.run_scenarios(db.select_stars, db.select_stars_for_a_frame,
                            db.query_all_stars_for_frame_and_footprint,
                            roi.get_frames_for_roi)
    out["zeropoints"] = rec.run_zeropoint_scenario(
        zp.calculate_zeropoints, str(db_path))
    out["normalization"] = rec.run_normalization_scenario(
        norm.calculate_coefficient, str(db_path))
    out["gaia_bands"] = rec.run_gaia_band_scenario(
        gaia_mags.save_gaia_catalog_photometry_to_database, cfg,
        str(db_path))
    out["chi2_bounds"] = rec.run_chi2_scenario(
        chi2_selector.get_chi2_bounds, cfg)

    from lightcurver_tpu.processes import frame_star_assignment as assign

    db2_path = tmp_path / "assign.sqlite3"
    db.initialize_database(db2_path)
    conn = sqlite3.connect(db2_path)
    rec.assignment_populate(conn)
    conn.close()
    cfg2 = {"database_path": str(db2_path)}
    monkeypatch.setattr(assign, "get_user_config", lambda: cfg2)
    out["star_assignment"] = rec.run_assignment_scenario(
        assign.populate_stars_in_frames, str(db2_path))

    import types

    from lightcurver_tpu.utilities import footprint as fp

    state = {}
    monkeypatch.setattr(db, "get_user_config", lambda: state["cfg"])

    def set_db_path(path):
        state["cfg"] = {"database_path": path}

    out["footprint"] = rec.run_footprint_scenarios(
        fp, db.initialize_database, set_db_path, str(tmp_path),
        lambda **m: types.SimpleNamespace(**m))
    # our getter (divergence: the reference's crashes, see recorder)
    set_db_path(str(tmp_path / "fp_getter.sqlite3"))
    db.initialize_database(state["cfg"]["database_path"])
    import numpy as np
    fp.database_insert_single_footprint(
        7, np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]))
    out["footprint"]["our_get_footprint"] = \
        fp.database_get_footprint(7).tolist()

    import pandas as pd

    from lightcurver_tpu.processes.star_extraction import (
        postprocess_detections)

    out["star_extraction"] = rec.extraction_record(
        postprocess_detections(pd.DataFrame(rec.sep_detections())))
    out["star_extraction_single_survivors"] = len(
        postprocess_detections(pd.DataFrame(rec.sep_single_detection())))
    return out


def test_star_selection_matches_reference(golden, ours):
    """Every top-N / name-list / exclusion / join branch agrees."""
    keys = [k for k in golden if k.startswith(("ss_", "sf_", "qa_"))]
    assert len(keys) == 15
    for key in keys:
        assert ours[key] == golden[key], key


def test_roi_window_matches_reference_outside_divergence(golden, ours):
    """ROW_NUMBER selection agrees on every frame the reference keeps."""
    for key in ("roi_basic", "roi_seeing_constraint",
                "roi_coeff_constraint", "roi_wide_chi2"):
        ours_minus_fix = [r for r in ours[key] if r[0] != 1]
        assert ours_minus_fix == golden[key], key


def test_stale_hash_divergence_is_pinned(golden, ours):
    """The reference drops frame 1 (stale-hash PSF steals rn=1); our
    footprint-scoped window keeps it with the in-footprint best PSF."""
    for ref_rows in (golden["roi_basic"], golden["roi_wide_chi2"]):
        assert all(row[0] != 1 for row in ref_rows)
    for key in ("roi_basic", "roi_seeing_constraint",
                "roi_coeff_constraint", "roi_wide_chi2"):
        frame1 = [r for r in ours[key] if r[0] == 1]
        assert frame1 == [FRAME1_FIXED_ROW], key
    # and rows stay mjd-ordered with the restored frame in place
    mjds = [r[1] for r in ours["roi_basic"]]
    assert mjds == sorted(mjds)


def test_zeropoint_task_matches_reference(golden, ours):
    """The FULL zeropoint chain — Gaia colour-polynomial magnitudes,
    per-frame median/std zeropoints, upserts — reproduces the outputs of
    the reference's own code on the same database (reference
    processes/absolute_zeropoint_calculation.py:40-119,
    utilities/absolute_magnitudes_from_gaia.py:5-66)."""
    import numpy as np

    ref = golden["zeropoints"]
    got = ours["zeropoints"]
    for table in ("catalog_star_photometry", "absolute_zeropoints"):
        assert len(got[table]) == len(ref[table]), table
        for row_got, row_ref in zip(got[table], ref[table]):
            for a, b in zip(row_got, row_ref):
                if isinstance(b, float):
                    np.testing.assert_allclose(a, b, rtol=1e-12)
                else:
                    assert a == b, (table, row_got, row_ref)


def test_normalization_task_matches_reference(golden, ours):
    """The FULL normalization chain — chi2-gated membership-joined flux
    matrix, SLSQP scatter alignment, inverse-variance coefficients with
    the single-star uncertainty fallback, upserts leaving fluxless
    frames untouched — reproduces the reference's own outputs
    (reference processes/normalization_calculation.py:14-223)."""
    import numpy as np

    ref = golden["normalization"]
    got = ours["normalization"]
    assert len(got) == len(ref) == 4
    for row_got, row_ref in zip(got, ref):
        assert row_got[:2] == row_ref[:2]
        np.testing.assert_allclose(row_got[2:], row_ref[2:], rtol=1e-9)
    # the scenario exercised the branches it claims to: frame 2 hit the
    # single-star fallback (err = 0.1 * coeff) and frame 3 (no fluxes)
    # kept its pre-populated row
    frame2 = next(r for r in ref if r[0] == 2)
    assert frame2[3] == pytest.approx(0.1 * frame2[2])
    assert next(r for r in ref if r[0] == 3)[2:] == [1.1, 0.011]


def test_chi2_bounds_match_reference(golden, ours):
    """The chi2-gate bound derivation — None / sigma_clip / threshold
    branch dispatch, the per-mode table choice (PSFs vs
    star_flux_in_frame) and the median +/- k*std formula — reproduces
    the reference's own outputs (reference utilities/chi2_selector.py:
    8-48; the sigma-clip core is OUR stats.sigma_clipped_stats on both
    sides — see tools/record_reference_db_golden.run_chi2_scenario's
    scope note)."""
    import numpy as np

    ref = golden["chi2_bounds"]
    got = ours["chi2_bounds"]
    assert set(got) == set(ref)
    for key in ref:
        np.testing.assert_allclose(got[key], ref[key], rtol=1e-12,
                                   err_msg=key)
    # the scenarios exercised the regimes they claim to: sigma=3 keeps
    # the 3.5 outlier inside wide bounds, sigma=1 clips down to
    # degenerate zero-width bounds around the surviving median
    assert ref["psf_sigma3"][1] > 3.5
    assert ref["psf_sigma1"][0] == ref["psf_sigma1"][1]
    assert ref["none_psf"] == [-np.inf, np.inf]


def test_star_assignment_matches_reference(golden, ours):
    """The star<->frame assignment — footprint shrink by intersection
    of four margin-translated copies (RA margin de-projected by
    cos(dec)), containment per star, star's-own-hash insertion and the
    IntegrityError continue path — reproduces the reference's own
    outputs on axis-aligned AND slanted footprint edges (reference
    processes/frame_star_assignment.py:10-69; the polygon engine is OUR
    SimplePolygon on both sides via the recorder's shapely stub — the
    pin covers the task's margin/assignment semantics)."""
    assert ours["star_assignment"] == golden["star_assignment"]
    ref = golden["star_assignment"]
    # the scenario has teeth: in-margin stars excluded on both edge
    # orientations, their 1.5x-margin twins kept, the other-hash star
    # inserted with ITS hash, the pre-seeded (1, a1) pair not duplicated
    assert [1, "a2", 111] not in ref and [1, "a3", 111] in ref
    assert [1, "a4", 111] not in ref and [1, "a5", 111] in ref
    assert [2, "a7", 111] not in ref and [2, "a8", 111] in ref
    assert [1, "a9", 222] in ref
    assert sum(r == [1, "a1", 111] for r in ref) == 1


def test_footprint_utilities_match_reference(golden, ours):
    """Footprint-utility semantics reproduce the reference's own code
    (reference utilities/footprint.py): the frame-set hash identity
    (order-insensitive, duplicate-rejecting) and the ROI_disk radius
    hash — the work-skipping contract — plus the INSERT OR REPLACE
    footprint roundtrip, the mean + 5*std bad-pointing elimination in
    BOTH regimes (n=10: the threshold mathematically cannot fire on one
    outlier, max z-score (n-1)/sqrt(n) < 5; n=40: the outlier is
    flagged), and the CD/PC north-angle formula incl. the
    no-matrix ValueError."""
    import numpy as np

    ref = dict(golden["footprint"])
    got = dict(ours["footprint"])
    # divergence keys, asserted separately
    assert ref.pop("ref_get_footprint_typeerror") is True
    our_roundtrip = got.pop("our_get_footprint")
    # key-set equality first: a one-sided key must fail with a readable
    # set diff, not a KeyError from the per-key loop below
    assert set(got) == set(ref)
    # the frames_hash_*/combined_hash_* golden VALUES pin CPython's
    # built-in hash() of int tuples/floats, whose modulus depends on
    # sys.hash_info.width — both implementations still agree on a
    # 32-bit build (they call the same hash()), but the 64-bit-recorded
    # fixture values don't apply there, so skip the value pins
    import sys
    if sys.hash_info.width != 64:  # pragma: no cover — CI is 64-bit
        for key in [k for k in ref
                    if k.startswith(("frames_hash_", "combined_hash_"))
                    and type(ref[k]) is int]:  # bools are int subclasses
            ref.pop(key)
            got.pop(key)
    for key in set(ref) | set(got):
        if isinstance(ref[key], float):
            np.testing.assert_allclose(got[key], ref[key], rtol=1e-12,
                                       err_msg=key)
        else:
            assert got[key] == ref[key], key
    # the scenarios had teeth
    assert ref["bad_pointings_n10"] == []
    assert ref["bad_pointings_n40"] == [[40, "bad_pointing"]]
    assert ref["frames_hash_duplicate_raises"] is True
    # pinned divergence: the reference's database_get_footprint getter
    # crashes (json.loads on the row tuple, footprint.py:72-80, dead
    # code there); ours returns the stored polygon
    assert our_roundtrip == [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]


def test_star_extraction_postprocess_matches_reference(golden, ours):
    """The post-detection block — elongation < median + 3*std filter,
    FWHM = 2*sqrt(ln2*(a^2+b^2)), ellipticity, brightest-first order —
    reproduces the reference's own code on 14 canned detections
    (reference processes/star_extraction.py:28-49, run with a fake sep
    + minimal Table).  Divergence pinned: with ONE detection the
    reference's strict `<` on a zero-std threshold drops it; ours
    keeps it (processes/star_extraction.py postprocess_detections)."""
    import numpy as np

    ref = golden["star_extraction"]
    got = ours["star_extraction"]
    assert len(got) == len(ref) == 13  # outlier dropped, moderate kept
    np.testing.assert_allclose(got, ref, rtol=1e-12)
    # teeth: the extreme a/b=10 outlier is gone, the a/b=2 survives,
    # rows are flux-descending
    assert all(row[0] != 50.0 for row in ref)
    assert any(row[3] == 2.0 for row in ref)
    fluxes = [row[2] for row in ref]
    assert fluxes == sorted(fluxes, reverse=True)
    assert golden["star_extraction_single_survivors"] == 0
    assert ours["star_extraction_single_survivors"] == 1


def test_gaia_band_polynomials_match_reference(golden, ours):
    """Every row of the Gaia colour-transform table — all eight bands,
    not just the configured r_sdss the zeropoint chain exercises —
    reproduces the reference's own polynomial evaluation (reference
    utilities/absolute_magnitudes_from_gaia.py:17-26, Gaia EDR3
    photometric relations tables 5.6/5.7)."""
    import numpy as np

    ref = golden["gaia_bands"]
    got = ours["gaia_bands"]
    assert set(got) == set(ref)
    for band in ref:
        assert len(got[band]) == len(ref[band]) == 2, band
        for row_got, row_ref in zip(got[band], ref[band]):
            assert row_got[:2] == row_ref[:2], band
            np.testing.assert_allclose(row_got[2:], row_ref[2:],
                                       rtol=1e-12, err_msg=band)


# --- footprint union/simplify parity -------------------------------------

def _strip_collinear(ring, eps=1e-9):
    """Drop vertices collinear with their neighbours: the noding-
    independent canonical ring (GEOS keeps union nodes on straight
    boundary runs; our walk does too, but the exact node SET depends on
    the noding order, so compare the collinear-free form)."""
    import numpy as np

    v = np.asarray(ring, dtype=float)
    if len(v) > 1 and np.allclose(v[0], v[-1]):
        v = v[:-1]
    scale = max(1.0, float(np.max(np.abs(v))))
    keep = []
    n = len(v)
    for i in range(n):
        a, b, c = v[i - 1], v[i], v[(i + 1) % n]
        cross = ((b[0] - a[0]) * (c[1] - a[1])
                 - (b[1] - a[1]) * (c[0] - a[0]))
        if abs(cross) > eps * scale * scale:
            keep.append(v[i])
    return np.asarray(keep)


def _canon(v):
    """CCW orientation, lexicographically-smallest start vertex."""
    import numpy as np

    v = np.asarray(v, dtype=float)
    x, y = v[:, 0], v[:, 1]
    if np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)) < 0:
        v = v[::-1]
    start = int(np.lexsort((v[:, 1], v[:, 0]))[0])
    return np.roll(v, -start, axis=0)


def _hausdorff_to_ring(points, ring):
    """max over points of distance to the ring's boundary segments."""
    import numpy as np

    v = np.asarray(ring, dtype=float)
    x1, y1 = v[:, 0], v[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    dx, dy = x2 - x1, y2 - y1
    ll = np.where(dx * dx + dy * dy > 0, dx * dx + dy * dy, 1.0)
    worst = 0.0
    for px, py in np.asarray(points, dtype=float):
        t = np.clip(((px - x1) * dx + (py - y1) * dy) / ll, 0.0, 1.0)
        d2 = (x1 + t * dx - px) ** 2 + (y1 + t * dy - py) ** 2
        worst = max(worst, float(np.min(d2)) ** 0.5)
    return worst


def test_footprint_union_matches_reference(golden):
    """calc_common_and_total_footprint vs the recorded reference run.

    The RAW reduce-union ring must agree exactly (collinear-free
    canonical form, 2e-9 deg): that is the VERDICT r4 exactness pin.
    The SIMPLIFIED outputs (reference simplify(0.001) is GEOS
    TopologyPreservingSimplifier; ours is ring Douglas-Peucker) agree
    within the simplification tolerance itself — both rings lie within
    0.001 deg of the raw union, so within 0.0025 of each other — when
    the fixture was recorded with real shapely (the CI golden lane),
    and exactly when it was recorded with the SimplePolygon stub.
    """
    import numpy as np

    sys.path.insert(0, str(pathlib.Path(__file__).parents[1] / "tools"))
    import record_reference_db_golden as rec
    from lightcurver_tpu.utilities.footprint import (
        calc_common_and_total_footprint)
    from lightcurver_tpu.utilities.geometry import polygon_union

    fu = golden.get("footprint_union")
    if fu is None:
        pytest.skip("fixture predates the union scenarios")
    exact = fu["provenance"] == "stub"
    for name, fps in rec.union_cases().items():
        raw_ours = polygon_union([np.array(fp) for fp in fps])
        np.testing.assert_allclose(
            raw_ours.area, fu[f"{name}_raw_union_area"], rtol=1e-9,
            err_msg=name)
        ref_ring = _canon(_strip_collinear(fu[f"{name}_raw_union"]))
        our_ring = _canon(_strip_collinear(raw_ours.vertices))
        assert len(ref_ring) == len(our_ring), name
        np.testing.assert_allclose(our_ring, ref_ring, atol=2e-9,
                                   err_msg=name)

        common, largest = calc_common_and_total_footprint(
            [np.array(fp) for fp in fps])
        ref_largest = np.asarray(fu[f"{name}_largest"], dtype=float)
        if exact:
            np.testing.assert_allclose(
                largest.area, fu[f"{name}_largest_area"], rtol=1e-9,
                err_msg=name)
            np.testing.assert_allclose(
                _canon(_strip_collinear(largest.vertices)),
                _canon(_strip_collinear(ref_largest)), atol=2e-9,
                err_msg=name)
        else:
            perim = float(np.sum(np.hypot(
                *(np.roll(raw_ours.vertices, -1, 0)
                  - raw_ours.vertices).T)))
            assert abs(largest.area - fu[f"{name}_largest_area"]) \
                <= 0.001 * perim + 1e-9, name
            assert _hausdorff_to_ring(largest.vertices, ref_largest) \
                <= 0.0025, name
            assert _hausdorff_to_ring(ref_largest, largest.vertices) \
                <= 0.0025, name
        if fu[f"{name}_common"] is not None:
            assert common is not None, name
            ref_common = np.asarray(fu[f"{name}_common"], dtype=float)
            if exact:
                np.testing.assert_allclose(
                    _canon(_strip_collinear(common.vertices)),
                    _canon(_strip_collinear(ref_common)), atol=2e-9,
                    err_msg=name)
            else:
                assert _hausdorff_to_ring(common.vertices, ref_common) \
                    <= 0.0025, name
