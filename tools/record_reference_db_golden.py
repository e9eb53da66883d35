"""Golden-pin the reference's DB-QUERY semantics with its own code.

VERDICT r3 #2: the reference's SQL selection logic — `select_stars` /
`select_stars_for_a_frame` / `query_all_stars_for_frame_and_footprint`
(reference lightcurver/structure/database.py:84-248: top-N-closest,
named-list and exclusion branches) and the best-PSF ROW_NUMBER window
(reference lightcurver/processes/roi_file_preparation.py:34-63) —
imports with only sqlite3 + pandas once astropy/shapely/starred are
stubbed.  This script builds a deterministic synthetic database with
the REFERENCE's own `initialize_database`, runs the REFERENCE's query
functions over a battery of scenarios, and commits the outputs.

The matching test (tests/test_reference_db_golden.py) rebuilds the same
database with OUR `initialize_database` + the same `populate()` rows,
runs OUR query functions, and asserts agreement — plus pins the ONE
documented intentional divergence: our best-PSF window partitions
WITHIN the requested footprint hash, so a marginally-lower-chi2 PSF
left over from a stale footprint hash cannot steal rn=1 and silently
drop the frame (processes/roi_file_preparation.py:30-35 in this repo).
The fixture records the reference dropping that frame; the test asserts
we keep it.

Usage:  python tools/record_reference_db_golden.py [reference_dir]
Writes: tests/fixtures/reference_db_golden.json
"""

import json
import os
import pathlib
import sqlite3
import sys
import tempfile

FIXTURE = (pathlib.Path(__file__).resolve().parents[1] / "tests"
           / "fixtures" / "reference_db_golden.json")

# stale-footprint hash used to pin the ROW_NUMBER divergence
HASH_MAIN = 111
HASH_OTHER = 222

_STUBS = [
    "astropy", "astropy.coordinates", "astropy.units", "astropy.stats",
    "astropy.time", "astropy.io", "astropy.io.fits", "astropy.wcs",
    "astropy.table", "astropy.visualization", "shapely",
    "shapely.geometry", "shapely.ops", "ephem", "ruamel", "ruamel.yaml",
    "astroquery", "astroquery.gaia", "astroquery.mast",
    "widefield_plate_solver", "starred", "starred.psf", "starred.psf.psf",
    "astropy.visualization.stretch",
]


def populate(conn):
    """Deterministic synthetic rows shared by recorder and test.

    Covers every selection branch: two footprint hashes, unsorted
    ROI distances, variable star membership per frame, multiple PSFs
    per (frame, footprint) with distinct chi2, a STALE-hash PSF with
    the lowest chi2 of all (frame 1 / HASH_OTHER, chi2 0.7), missing
    PSFs and missing normalization coefficients.
    """
    cur = conn.cursor()
    cur.execute("INSERT INTO combined_footprint (id, hash) VALUES (1, ?)",
                (HASH_MAIN,))
    cur.execute("INSERT INTO combined_footprint (id, hash) VALUES (2, ?)",
                (HASH_OTHER,))

    # 8 stars in the main footprint, distances deliberately unsorted
    names = list("abcdefgh")
    dists = [12.5, 3.2, 45.0, 7.7, 21.1, 5.5, 30.3, 15.9]
    for i, (name, dist) in enumerate(zip(names, dists)):
        cur.execute(
            "INSERT INTO stars (combined_footprint_hash, name, ra, dec,"
            " gmag, rmag, bmag, pmra, pmdec, ref_epoch, gaia_id,"
            " distance_to_roi_arcsec) VALUES (?,?,?,?,?,?,?,?,?,?,?,?)",
            (HASH_MAIN, name, 150.0 + 0.01 * i, 2.0 - 0.01 * i,
             # colours vary per star (bp_rp = 0.65 + 0.17 i) so the
             # zeropoint pin exercises the Gaia colour polynomial away
             # from a single point
             17.0 + 0.1 * i, 16.5 + 0.05 * i, 17.15 + 0.22 * i,
             1.0 * i, -0.5 * i, 2016.0, f"g{i + 1}", dist))
    # 3 stars in the other footprint (overlapping ids g1, g2 + new g9)
    for name, gid, dist in (("a", "g1", 9.9), ("b", "g2", 2.2),
                            ("c", "g9", 6.6)):
        cur.execute(
            "INSERT INTO stars (combined_footprint_hash, name, ra, dec,"
            " gmag, gaia_id, distance_to_roi_arcsec)"
            " VALUES (?,?,?,?,?,?,?)",
            (HASH_OTHER, name, 151.0, 2.5, 18.0, gid, dist))

    # 5 frames, mjd deliberately out of id order
    frames = [(1, 60003.3, 1.2), (2, 60001.1, 0.8), (3, 60002.2, 2.5),
              (4, 60000.5, 1.0), (5, 60004.4, 1.6)]
    for fid, mjd, seeing in frames:
        cur.execute(
            "INSERT INTO frames (id, mjd, exptime, gain, image_relpath,"
            " seeing_arcseconds, plate_solved, eliminated,"
            " roi_in_footprint) VALUES (?,?,?,?,?,?,1,0,1)",
            (fid, mjd, 120.0, 1.6, f"frames/f{fid}.fits", seeing))

    membership = {1: ["g1", "g2", "g3", "g4", "g5", "g6"],
                  2: ["g2", "g3", "g5", "g7", "g8"],
                  3: ["g1", "g2", "g3", "g4", "g5", "g6", "g7", "g8"],
                  # frame 4 lacks g3: the normalization scenario pins the
                  # stars_in_frames join dropping fluxes of non-members
                  4: ["g1", "g2", "g4"]}
    for fid, gids in membership.items():
        for gid in gids:
            cur.execute(
                "INSERT INTO stars_in_frames (frame_id, star_gaia_id,"
                " combined_footprint_hash) VALUES (?,?,?)",
                (fid, gid, HASH_MAIN))
    for gid in ("g1", "g2", "g9"):
        cur.execute(
            "INSERT INTO stars_in_frames (frame_id, star_gaia_id,"
            " combined_footprint_hash) VALUES (1,?,?)", (gid, HASH_OTHER))

    # PSFs: two candidates for frame 1 (best chi2 1.1), one each for
    # frames 2-4 (frame 3 fails the chi2<=2 gate), none for frame 5.
    # The HASH_OTHER row for frame 1 has the LOWEST chi2 of all (0.7):
    # the reference's un-scoped window lets it steal rn=1.
    psfs = [(HASH_MAIN, 1, 1.3, "abc"), (HASH_MAIN, 1, 1.1, "abcd"),
            (HASH_MAIN, 2, 0.9, "abc"), (HASH_MAIN, 3, 3.5, "abc"),
            (HASH_MAIN, 4, 1.05, "abc"), (HASH_OTHER, 1, 0.7, "ab")]
    for h, fid, chi2, ref in psfs:
        cur.execute(
            "INSERT INTO PSFs (combined_footprint_hash, frame_id, chi2,"
            " psf_ref, subsampling_factor, relative_loss_differential,"
            " fwhm_moffat_arcseconds) VALUES (?,?,?,?,2,0.001,1.1)",
            (h, fid, chi2, ref))

    coeffs = [(HASH_MAIN, 1, 1.02, 0.010), (HASH_MAIN, 2, 0.97, 0.012),
              (HASH_MAIN, 3, 1.10, 0.011), (HASH_MAIN, 4, 0.97, 0.009),
              (HASH_OTHER, 1, 0.50, 0.050)]
    for h, fid, c, u in coeffs:
        cur.execute(
            "INSERT INTO normalization_coefficients (frame_id,"
            " combined_footprint_hash, coefficient,"
            " coefficient_uncertainty) VALUES (?,?,?,?)", (fid, h, c, u))

    # star fluxes for the zeropoint + normalization scenarios:
    # 4 stars x frames {1,2,4}, g4 missing from frame 4 (variable
    # membership), deterministic values; (g3, frame 2) carries a bad
    # fit chi2 = 3.0 so the normalization's chi2 threshold gate has
    # real work (zeropoints ignore chi2 — unaffected)
    for si, gid in enumerate(("g1", "g2", "g3", "g4")):
        for fid in (1, 2, 4):
            if gid == "g4" and fid == 4:
                continue
            flux = 900.0 / (si + 1) * (1.0 + 0.04 * fid) \
                * (1.0 + 0.01 * si * fid)
            chi2 = 3.0 if (gid == "g3" and fid == 2) else 1.0
            cur.execute(
                "INSERT INTO star_flux_in_frame (frame_id, star_gaia_id,"
                " combined_footprint_hash, flux, flux_uncertainty, chi2,"
                " relative_loss_differential) VALUES (?,?,?,?,?,?,?)",
                (fid, gid, HASH_MAIN, flux, 0.01 * flux, chi2, 1e-4))
    conn.commit()


# config for the zeropoint scenario: ROI_disk with radius == HASH_MAIN
# makes get_combined_footprint_hash return hash(HASH_MAIN) == HASH_MAIN
# (python int hash identity) in both implementations, matching the
# populated rows without any footprint machinery
def zp_config(db_path, plots_dir=None):
    import pathlib
    import tempfile

    if plots_dir is None:
        plots_dir = tempfile.mkdtemp(prefix="lc_golden_plots")
    return {"database_path": db_path,
            "star_selection_strategy": "ROI_disk",
            "ROI_disk_radius_arcseconds": HASH_MAIN,
            "reference_absolute_photometric_survey": "gaia",
            "photometric_band": "r_sdss",
            # normalization-task keys (reference
            # processes/normalization_calculation.py:133-223): no star
            # name filter, chi2 threshold gate [0, 1.5] (drops the
            # injected bad (g3, frame 2) fit)
            "stars_to_use_norm": None,
            "stars_to_exclude_norm": None,
            "fluxes_fit_exclude_strategy": {"threshold": [0.0, 1.5]},
            "plots_dir": pathlib.Path(plots_dir)}


def run_zeropoint_scenario(calculate_zeropoints, db_path):
    """Run the FULL zeropoint task (Gaia colour transforms -> per-frame
    median/std zeropoints -> upsert) and read back what it wrote.

    Pins reference processes/absolute_zeropoint_calculation.py:40-119
    and utilities/absolute_magnitudes_from_gaia.py:5-66.

    Note: the reference calls ``pd.unique(<list>)``
    (absolute_zeropoint_calculation.py:59), which pandas >= 2 rejects
    with a TypeError — a latent reference crash on modern pandas, shimmed
    here ONLY so its numeric semantics can be recorded (the shim wraps
    lists in a Series; dedup semantics are unchanged)."""
    import pandas as pd

    orig_unique = pd.unique
    pd.unique = (lambda v: orig_unique(pd.Series(v))
                 if isinstance(v, list) else orig_unique(v))
    try:
        calculate_zeropoints()
    finally:
        pd.unique = orig_unique
    conn = sqlite3.connect(db_path)
    csp = conn.execute(
        "SELECT star_gaia_id, catalog, band, mag, mag_err"
        " FROM catalog_star_photometry ORDER BY star_gaia_id").fetchall()
    az = conn.execute(
        "SELECT frame_id, combined_footprint_hash, zeropoint,"
        " zeropoint_uncertainty, source_catalog"
        " FROM absolute_zeropoints ORDER BY frame_id").fetchall()
    conn.close()
    return {"catalog_star_photometry": [list(r) for r in csp],
            "absolute_zeropoints": [list(r) for r in az]}


def run_normalization_scenario(calculate_coefficient, db_path):
    """Run the FULL normalization task (chi2-gated flux matrix query ->
    per-star median normalization -> SLSQP scatter alignment ->
    inverse-variance frame coefficients -> upsert) and read back the
    coefficients table.

    Pins reference processes/normalization_calculation.py:14-223 on the
    real SQL path (the in-memory arithmetic is already pinned by
    reference_utilities_golden.json).  The injected (g3, frame 2)
    chi2 = 3.0 flux must be dropped by the threshold gate, and frame 4
    (whose stars_in_frames membership excludes g3) exercises the
    join-based filtering.  Frame 3's pre-existing coefficient row has
    no fluxes and must survive untouched (upsert semantics)."""
    calculate_coefficient()
    conn = sqlite3.connect(db_path)
    rows = conn.execute(
        "SELECT frame_id, combined_footprint_hash, coefficient,"
        " coefficient_uncertainty FROM normalization_coefficients"
        " WHERE combined_footprint_hash = ? ORDER BY frame_id",
        (HASH_MAIN,)).fetchall()
    conn.close()
    return [list(r) for r in rows]


def run_chi2_scenario(get_chi2_bounds, cfg):
    """Pin the chi2-gate bound derivation (reference
    utilities/chi2_selector.py:8-48) across every strategy branch.

    Scope note: the sigma_clip branch calls astropy's
    ``sigma_clipped_stats``; the recorder plugs OUR
    ``utilities/stats.sigma_clipped_stats`` into the astropy stub, so
    the clipping core is shared by construction — what this pins is the
    reference's WRAPPER semantics (which table is queried per mode, the
    ``median - k*std`` bound formula, the threshold passthrough and the
    None -> (-inf, inf) branch), composed with a clip implementation our
    own tests hold to astropy's documented behavior.

    The PSFs chi2 column is [1.3, 1.1, 0.9, 3.5, 1.05, 0.7] (populate());
    sigma=3 keeps the 3.5 outlier, sigma=1 iteratively clips it — both
    regimes are recorded.  star_flux_in_frame carries ten chi2=1.0 rows
    and one 3.0 (the injected bad fit), collapsing the clipped std to 0.
    """
    out = {}
    scenarios = [
        ("none_psf", "psf", None),
        ("psf_sigma3", "psf", {"sigma_clip": 3.0}),
        ("psf_sigma1", "psf", {"sigma_clip": 1.0}),
        ("fluxes_sigma25", "fluxes", {"sigma_clip": 2.5}),
        ("threshold_psf", "psf", {"threshold": [0.5, 2.0]}),
        ("threshold_fluxes", "fluxes", {"threshold": [0.0, 1.5]}),
    ]
    for key, mode, conf in scenarios:
        cfg[f"{mode}_fit_exclude_strategy"] = conf
        lo, hi = get_chi2_bounds(mode)
        out[key] = [float(lo), float(hi)]
    return out


# --- star <-> frame assignment scenario -------------------------------
# Two footprints: an axis-aligned quad (frame 1) and a rotated convex
# quad (frame 2), with stars placed at 0.5x and 1.5x the 4-arcsec
# shrink margin from edges so the cross-translated-intersection scheme
# (reference processes/frame_star_assignment.py:37-67) is pinned on
# both edge orientations, plus an always-inside star, a fully-outside
# star, and a second-footprint-hash star (the reference checks EVERY
# star against every frame and inserts with the star's own hash).

ASSIGN_FP1 = [[150.0, 2.0], [150.1, 2.0], [150.1, 2.1], [150.0, 2.1]]
ASSIGN_FP2 = [[150.05, 2.02], [150.15, 2.05],
              [150.12, 2.15], [150.02, 2.12]]


def _assignment_stars():
    import math

    margin = 4.0 / 3600.0                       # the reference's value
    mean_dec1 = 2.05                            # mean dec of ASSIGN_FP1
    ra_margin = margin / math.cos(math.radians(mean_dec1))
    stars = [
        # (gaia_id, ra, dec, hash) — comments give intent for frame 1
        ("a1", 150.05, 2.05, HASH_MAIN),                    # deep inside
        ("a2", 150.0 + 0.5 * ra_margin, 2.05, HASH_MAIN),   # RA edge, in margin
        ("a3", 150.0 + 1.5 * ra_margin, 2.05, HASH_MAIN),   # RA edge, beyond
        ("a4", 150.05, 2.0 + 0.5 * margin, HASH_MAIN),      # dec edge, in margin
        ("a5", 150.05, 2.0 + 1.5 * margin, HASH_MAIN),      # dec edge, beyond
        ("a6", 150.2, 2.05, HASH_MAIN),                     # fully outside
        # near frame 2's slanted lower edge (150.05,2.02)->(150.15,2.05):
        # ~2 arcsec inside (excluded by the shrink) and ~5.4 arcsec
        # inside (kept) along the inward normal (-0.2873, 0.9578)
        ("a7", 150.10 - 0.2873 * 0.0006, 2.035 + 0.9578 * 0.0006,
         HASH_MAIN),
        ("a8", 150.10 - 0.2873 * 0.0015, 2.035 + 0.9578 * 0.0015,
         HASH_MAIN),
        ("a9", 150.05, 2.05, HASH_OTHER),       # other hash, deep inside
    ]
    return stars


def assignment_populate(conn):
    """Deterministic rows for the assignment scenario (fresh DB)."""
    import json as _json

    cur = conn.cursor()
    cur.execute("INSERT INTO combined_footprint (id, hash) VALUES (1, ?)",
                (HASH_MAIN,))
    cur.execute("INSERT INTO combined_footprint (id, hash) VALUES (2, ?)",
                (HASH_OTHER,))
    for fid in (1, 2):
        cur.execute(
            "INSERT INTO frames (id, mjd, exptime, gain, image_relpath)"
            " VALUES (?,?,?,?,?)",
            (fid, 60000.0 + fid, 120.0, 1.6, f"frames/f{fid}.fits"))
    for fid, poly in ((1, ASSIGN_FP1), (2, ASSIGN_FP2)):
        cur.execute("INSERT INTO footprints (frame_id, polygon)"
                    " VALUES (?,?)", (fid, _json.dumps(poly)))
    for gid, ra, dec, h in _assignment_stars():
        cur.execute(
            "INSERT INTO stars (combined_footprint_hash, name, ra, dec,"
            " gmag, gaia_id, distance_to_roi_arcsec)"
            " VALUES (?,?,?,?,?,?,?)", (h, gid, ra, dec, 17.0, gid, 10.0))
    # pre-seeded pair: the populate loop must hit the IntegrityError
    # continue path (reference frame_star_assignment.py:62-66) and leave
    # exactly one row
    cur.execute(
        "INSERT INTO stars_in_frames (frame_id, star_gaia_id,"
        " combined_footprint_hash) VALUES (1, 'a1', ?)", (HASH_MAIN,))
    conn.commit()


def run_assignment_scenario(populate_stars_in_frames, db_path):
    """Run the full assignment task and read back the join table."""
    populate_stars_in_frames()
    conn = sqlite3.connect(db_path)
    rows = conn.execute(
        "SELECT frame_id, star_gaia_id, combined_footprint_hash"
        " FROM stars_in_frames"
        " ORDER BY frame_id, star_gaia_id,"
        " combined_footprint_hash").fetchall()
    conn.close()
    return [list(r) for r in rows]


def _shapely_stub_modules():
    """shapely.{geometry,intersection} stand-ins backed by OUR geometry.

    The reference's assignment task only touches Polygon(vertices),
    polygon.exterior.xy, Point(x, y).within(polygon) and
    shapely.intersection(a, b); all four map onto
    lightcurver_tpu.utilities.geometry.SimplePolygon.  Like shapely,
    ``exterior.xy`` returns the CLOSED ring (first vertex repeated) —
    the reference iterates it verbatim when building the translated
    copies.
    """
    import types

    from lightcurver_tpu.utilities.geometry import SimplePolygon

    class _Exterior:
        def __init__(self, sp):
            xs = [float(v) for v in sp.vertices[:, 0]]
            ys = [float(v) for v in sp.vertices[:, 1]]
            self.xy = (xs + xs[:1], ys + ys[:1])

    class Polygon:
        def __init__(self, shell):
            self._sp = SimplePolygon([tuple(p) for p in shell])

        @property
        def exterior(self):
            return _Exterior(self._sp)

        @property
        def area(self):
            return 0.0 if self._sp is None else float(self._sp.area)

        @property
        def is_empty(self):
            return self._sp is None

        @classmethod
        def _wrap(cls, sp):
            out = cls.__new__(cls)
            out._sp = sp
            return out

        def intersection(self, other):
            if self._sp is None or other._sp is None:
                return Polygon._wrap(None)
            return Polygon._wrap(self._sp.intersection(other._sp))

        def union(self, other):
            from lightcurver_tpu.utilities.geometry import polygon_union

            if self._sp is None:
                return Polygon._wrap(other._sp)
            if other._sp is None:
                return Polygon._wrap(self._sp)
            return Polygon._wrap(polygon_union([self._sp, other._sp]))

        def simplify(self, tolerance, preserve_topology=True):
            if self._sp is None:
                # shapely's empty geometry simplifies fine; the
                # reference's `except TypeError` arm is what a None
                # intersection reaches — emulate that path
                raise TypeError("cannot simplify empty stub polygon")
            return Polygon._wrap(self._sp.simplify(tolerance))

    class Point:
        def __init__(self, x, y):
            self.x, self.y = float(x), float(y)

        def within(self, polygon):
            if polygon._sp is None:
                return False
            return polygon._sp.contains(self.x, self.y)

    def intersection(a, b):
        out = Polygon.__new__(Polygon)
        out._sp = (None if a._sp is None or b._sp is None
                   else a._sp.intersection(b._sp))
        return out

    geom = types.ModuleType("shapely.geometry")
    geom.Point, geom.Polygon = Point, Polygon
    root = types.ModuleType("shapely")
    root.geometry, root.intersection = geom, intersection
    # other reference modules (footprint.py, star_querying.py) import
    # further shapely names at module-import time; they are never CALLED
    # here, so MagicMock placeholders keep those imports loadable
    from unittest import mock as _mock

    geom.__getattr__ = lambda name: _mock.MagicMock()
    root.__getattr__ = lambda name: _mock.MagicMock()
    return root, geom


# --- footprint-utilities scenario --------------------------------------
# Pins reference utilities/footprint.py: the frame-set / ROI-disk hash
# identity (the work-skipping contract), the INSERT OR REPLACE footprint
# roundtrip, the mean + 5*std bad-pointing elimination (including the
# small-n regime where that threshold can mathematically never fire:
# max z-score over n samples is (n-1)/sqrt(n) < 5 for n <= 26), and the
# CD/PC north-angle formula.

POINTING_SMALL_N = 10   # one wild outlier — reference flags NOTHING
POINTING_BIG_N = 40     # same outlier — now beyond mean + 5*std


def _pointing_rows(n):
    """n pointings jittered deterministically, the LAST one 1 deg off."""
    rows = []
    for i in range(1, n + 1):
        dx = 0.0005 * (((i * 7) % 11) - 5)
        dy = 0.0005 * (((i * 3) % 11) - 5)
        if i == n:
            dx += 1.0
        rows.append((i, [[150.0 + dx, 2.0 + dy], [150.1 + dx, 2.0 + dy],
                         [150.1 + dx, 2.1 + dy], [150.0 + dx, 2.1 + dy]]))
    return rows


def pointing_populate(conn, n):
    import json as _json

    for fid, poly in _pointing_rows(n):
        conn.execute(
            "INSERT INTO frames (id, mjd, exptime, gain, image_relpath)"
            " VALUES (?,?,?,?,?)",
            (fid, 60000.0 + fid, 120.0, 1.6, f"frames/f{fid}.fits"))
        conn.execute("INSERT INTO footprints (frame_id, polygon)"
                     " VALUES (?,?)", (fid, _json.dumps(poly)))
    conn.commit()


def run_footprint_scenarios(fp, initialize_database, set_db_path,
                            tmpdir, make_wcs):
    """Shared footprint battery.  ``make_wcs(cd=...| pc=...)`` builds the
    duck-typed WCS each side's get_angle_wcs expects (the reference
    reads ``wcs_object.wcs.cd``, ours ``wcs_object.cd``)."""
    import math

    import numpy as np

    out = {}
    out["frames_hash_unsorted"] = fp.get_frames_hash([3, 1, 2])
    out["frames_hash_single"] = fp.get_frames_hash([5])
    out["frames_hash_large"] = fp.get_frames_hash([123456789, 2, 7])
    try:
        fp.get_frames_hash([4, 4, 2])
        out["frames_hash_duplicate_raises"] = False
    except Exception:
        out["frames_hash_duplicate_raises"] = True
    out["combined_hash_roi_disk_int"] = fp.get_combined_footprint_hash(
        {"star_selection_strategy": "ROI_disk",
         "ROI_disk_radius_arcseconds": 25}, [9, 8])
    out["combined_hash_roi_disk_float"] = fp.get_combined_footprint_hash(
        {"star_selection_strategy": "ROI_disk",
         "ROI_disk_radius_arcseconds": 25.5}, [9, 8])
    out["combined_hash_frames_strategy"] = fp.get_combined_footprint_hash(
        {"star_selection_strategy": "around_ROI",
         "ROI_disk_radius_arcseconds": 25}, [4, 2])

    # INSERT OR REPLACE roundtrip — the stored text is read back
    # directly (the reference's own database_get_footprint getter has a
    # latent TypeError: json.loads on the row TUPLE, footprint.py:72-80;
    # recorded separately by the recorder)
    db = os.path.join(tmpdir, "fp_roundtrip.sqlite3")
    initialize_database(db)
    set_db_path(db)
    fp.database_insert_single_footprint(
        1, np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]))
    fp.database_insert_single_footprint(
        1, np.array([[7.0, 8.0], [9.0, 10.0], [11.0, 12.0]]))
    conn = sqlite3.connect(db)
    out["footprint_roundtrip"] = [
        list(r) for r in conn.execute(
            "SELECT frame_id, polygon FROM footprints ORDER BY frame_id")]
    conn.close()

    for key, n in (("bad_pointings_n10", POINTING_SMALL_N),
                   ("bad_pointings_n40", POINTING_BIG_N)):
        db = os.path.join(tmpdir, f"{key}.sqlite3")
        initialize_database(db)
        set_db_path(db)
        conn = sqlite3.connect(db)
        pointing_populate(conn, n)
        conn.close()
        fp.identify_and_eliminate_bad_pointings()
        conn = sqlite3.connect(db)
        out[key] = [list(r) for r in conn.execute(
            "SELECT id, comment FROM frames WHERE eliminated = 1"
            " ORDER BY id")]
        conn.close()

    s, th = 2e-4, math.radians(30.0)
    cd_rot = np.array([[-s * math.cos(th), s * math.sin(th)],
                       [s * math.sin(th), s * math.cos(th)]])
    th2 = math.radians(20.0)
    pc_rot = np.array([[math.cos(th2), -math.sin(th2)],
                       [math.sin(th2), math.cos(th2)]])
    cd_skew = np.array([[-1.1e-4, 0.3e-4], [0.2e-4, 0.9e-4]])
    out["angle_cd_rot"] = float(fp.get_angle_wcs(make_wcs(cd=cd_rot)))
    out["angle_pc_rot"] = float(fp.get_angle_wcs(make_wcs(pc=pc_rot)))
    out["angle_cd_skew"] = float(fp.get_angle_wcs(make_wcs(cd=cd_skew)))
    try:
        fp.get_angle_wcs(make_wcs())
        out["angle_no_matrix_raises"] = False
    except Exception:
        out["angle_no_matrix_raises"] = True
    return out


# --- footprint union/simplify scenario ----------------------------------
# Pins reference calc_common_and_total_footprint (reference
# utilities/footprint.py:31-60): shapely reduce-intersection +
# reduce-union, both simplified at tolerance 0.001.  When REAL shapely
# is importable (the CI golden lane) the recorded rings are shapely's
# own; locally the SimplePolygon-backed stub records our semantics and
# the provenance flag tells the test to treat them as self-goldens.
# Cases are proper-overlap stacks (single-ring unions); vertex-touching
# unions are excluded — shapely returns a MultiPolygon there, which the
# reference's own downstream `largest_footprint['coordinates'][0]`
# consumer (reference processes/star_querying.py:66) mis-reads anyway
# (documented in PARITY.md).


def union_cases():
    """name -> list of (4,2) footprint vertex lists (deterministic)."""
    import numpy as np

    def sq(x0, y0, w, h):
        return [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h]]

    rng = np.random.default_rng(19)
    dither = [sq(150.0 + dx, 2.0 + dy, 0.1, 0.1)
              for dx, dy in rng.normal(0.0, 3e-4, (12, 2))]
    rot = []
    for k in range(4):
        th = np.pi * k / 7.0
        rotm = np.array([[np.cos(th), -np.sin(th)],
                         [np.sin(th), np.cos(th)]])
        base = np.array([[-0.1, -0.04], [0.1, -0.04],
                         [0.1, 0.04], [-0.1, 0.04]])
        rot.append((base @ rotm.T + [30.0, -5.0]).tolist())
    return {
        "l_pair": [sq(10.0, 5.0, 0.2, 0.2), sq(10.1, 5.1, 0.2, 0.2)],
        "partial_edge": [sq(10.0, 5.0, 0.2, 0.1), sq(10.05, 5.1, 0.1, 0.1)],
        "triple": [sq(10.0, 5.0, 0.2, 0.2), sq(10.1, 5.05, 0.2, 0.2),
                   sq(10.05, 5.12, 0.2, 0.2)],
        "dither12": dither,
        "rotated4": rot,
    }


def canon_ring(geom):
    """Exterior ring canonicalized: CCW, lex-min start, closing vertex
    dropped, rounded to 1e-9 deg; works on shapely and stub polygons."""
    import numpy as np

    if geom is None or getattr(geom, "is_empty", False):
        return None
    xs, ys = geom.exterior.xy
    v = np.round(np.column_stack([np.asarray(xs), np.asarray(ys)]), 9)
    if len(v) > 1 and np.allclose(v[0], v[-1]):
        v = v[:-1]
    x, y = v[:, 0], v[:, 1]
    if np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)) < 0:
        v = v[::-1]
    start = int(np.lexsort((v[:, 1], v[:, 0]))[0])
    return np.roll(v, -start, axis=0).tolist()


def run_union_scenarios(reffp, shapely_mod, provenance):
    """Record calc_common_and_total_footprint + the RAW reduce-union."""
    from functools import reduce

    import numpy as np

    out = {"provenance": provenance}
    for name, fps in union_cases().items():
        common, largest = reffp.calc_common_and_total_footprint(
            [np.array(fp) for fp in fps])
        out[f"{name}_common"] = canon_ring(common)
        out[f"{name}_largest"] = canon_ring(largest)
        out[f"{name}_common_area"] = (None if common is None
                                      else float(common.area))
        out[f"{name}_largest_area"] = float(largest.area)
        # the RAW (unsimplified) union ring: the exactness pin proper
        polys = [shapely_mod.geometry.Polygon(fp) for fp in fps]
        raw = reduce(lambda x, y: x.union(y), polys)
        out[f"{name}_raw_union"] = canon_ring(raw)
        out[f"{name}_raw_union_area"] = float(raw.area)
    return out


# --- star-extraction post-processing scenario ---------------------------
# Pins the reference's post-sep block (reference
# processes/star_extraction.py:28-49): the elongation < median + 3*std
# point-source filter, FWHM = 2*sqrt(ln2*(a^2+b^2)), ellipticity, and
# brightest-first ordering, by feeding its extract_stars a fake `sep`
# returning canned detections.  14 detections: one extreme a/b = 10
# outlier (droppable — the Samuelson bound max z-score (n-1)/sqrt(n) < 3
# below ~11 points applies strictly to MEAN-based thresholds; the
# reference gate is median + 3*std, for which it is only approximate —
# here the outlier fires because it inflates std while barely moving
# the median) and one moderate a/b = 2 that must SURVIVE.


def sep_detections():
    import numpy as np

    dt = np.dtype([("x", float), ("y", float), ("a", float),
                   ("b", float), ("flux", float), ("npix", int),
                   ("peak", float)])
    rows = [
        (10.2, 11.5, 2.00, 1.90, 900.0, 40, 50.0),
        (30.4, 5.1, 2.20, 2.00, 1500.0, 55, 80.0),
        (7.7, 44.0, 2.10, 1.70, 600.0, 35, 30.0),
        (50.0, 50.0, 10.0, 1.00, 2000.0, 70, 90.0),   # extreme: dropped
        (22.2, 33.3, 1.80, 1.70, 1200.0, 30, 66.0),
        (5.5, 9.9, 2.40, 2.20, 300.0, 25, 20.0),
        (12.0, 60.0, 2.60, 1.30, 1100.0, 45, 70.0),   # a/b = 2: survives
        (61.0, 8.0, 1.90, 1.80, 450.0, 28, 24.0),
        (44.0, 27.0, 2.05, 1.95, 820.0, 38, 41.0),
        (18.0, 52.0, 2.30, 2.10, 770.0, 33, 37.0),
        (55.0, 41.0, 1.95, 1.75, 640.0, 31, 29.0),
        (9.0, 30.0, 2.15, 2.05, 980.0, 42, 52.0),
        (36.0, 14.0, 2.50, 2.30, 530.0, 27, 23.0),
        (27.0, 58.0, 1.85, 1.65, 710.0, 29, 34.0),
    ]
    return np.array(rows, dtype=dt)


def sep_single_detection():
    import numpy as np

    return sep_detections()[:1].copy()


EXTRACTION_COLUMNS = ["x", "y", "flux", "elongation", "FWHM",
                      "ellipticity"]


def extraction_record(table):
    """Canonical rows of a post-processed detection table (kept in
    order — the battery pins the brightest-first sort)."""
    import numpy as np

    cols = [np.asarray(table[c], dtype=float) for c in EXTRACTION_COLUMNS]
    return [[float(col[i]) for col in cols]
            for i in range(len(cols[0]))]


def _mini_table_cls():
    """astropy.table.Table stand-in covering exactly what the
    reference's extract_stars touches: column assignment/reading,
    boolean-mask row selection, and sort(key, reverse=True)."""
    import numpy as np

    class MiniTable:
        def __init__(self):
            self._cols = {}

        def __setitem__(self, key, value):
            self._cols[key] = np.asarray(value)

        def __getitem__(self, key):
            if isinstance(key, str):
                return self._cols[key]
            sub = MiniTable()
            for name, col in self._cols.items():
                sub._cols[name] = col[key]
            return sub

        def sort(self, key, reverse=False):
            order = np.argsort(self._cols[key], kind="stable")
            if reverse:
                order = order[::-1]
            for name in self._cols:
                self._cols[name] = self._cols[name][order]

        def __len__(self):
            first = next(iter(self._cols.values()), np.array([]))
            return len(first)

    return MiniTable


# every row of the Gaia colour-transform polynomial table (reference
# utilities/absolute_magnitudes_from_gaia.py:17-26)
GAIA_BANDS = ["r_sdss", "i_sdss", "g_sdss", "V", "R", "Ic", "V_T", "B_T"]


def run_gaia_band_scenario(save_gaia_fn, cfg, db_path):
    """Pin the Gaia colour-transform polynomial for EVERY supported band.

    The zeropoint scenario only exercises the configured r_sdss row; a
    transcription error in any of the other seven coefficient rows
    (reference utilities/absolute_magnitudes_from_gaia.py:17-26, tables
    5.6/5.7 of the Gaia EDR3 photometric relations) would go unnoticed.
    Runs the save function per band on stars g1/g2 (distinct bp-rp
    colours) and records the stored magnitudes.
    """
    conn = sqlite3.connect(db_path)
    out = {}
    original_band = cfg["photometric_band"]
    try:
        for band in GAIA_BANDS:
            cfg["photometric_band"] = band
            conn.execute("DELETE FROM catalog_star_photometry"
                         " WHERE catalog = 'gaia'")
            conn.commit()
            for gid in ("g1", "g2"):
                save_gaia_fn(gid)
            rows = conn.execute(
                "SELECT star_gaia_id, band, mag, mag_err"
                " FROM catalog_star_photometry WHERE catalog = 'gaia'"
                " ORDER BY star_gaia_id").fetchall()
            out[band] = [list(r) for r in rows]
    finally:
        cfg["photometric_band"] = original_band
        conn.close()
    return out


def _stars_record(df, ordered):
    """Canonical JSON form of a star-selection result.

    Ordered queries (top-N closest) keep row order; name-list / join
    queries carry no ORDER BY, so rows are canonicalized by gaia_id to
    stay independent of the SQL engine's join order.
    """
    rows = [[str(r["gaia_id"]), str(r["name"]), float(r["ra"]),
             float(r["dec"]), float(r["distance_to_roi_arcsec"])]
            for _, r in df.iterrows()]
    if not ordered:
        rows.sort()
    return rows


def _roi_record(df):
    """Canonical rows of a get_frames_for_roi result (kept in order:
    the query ends with ORDER BY f.mjd)."""
    return [[int(r["id"]), float(r["mjd"]), float(r["chi2"]),
             str(r["psf_ref"]), float(r["coefficient"])]
            for _, r in df.iterrows()]


def run_scenarios(select_stars, select_stars_for_a_frame,
                  query_all_stars, get_frames_for_roi):
    """The scenario battery, shared verbatim by recorder and test."""
    out = {}
    out["ss_default_top10"] = _stars_record(
        select_stars(HASH_MAIN), ordered=True)
    out["ss_top3"] = _stars_record(
        select_stars(HASH_MAIN, stars_to_use=3), ordered=True)
    out["ss_top3_excl_list"] = _stars_record(
        select_stars(HASH_MAIN, stars_to_use=3, stars_to_exclude=["b"]),
        ordered=True)
    out["ss_namelist"] = _stars_record(
        select_stars(HASH_MAIN, stars_to_use=["a", "c", "f"]),
        ordered=False)
    out["ss_namelist_excl_str"] = _stars_record(
        select_stars(HASH_MAIN, stars_to_use=["a", "c", "f"],
                     stars_to_exclude="ac"), ordered=False)
    out["ss_other_hash"] = _stars_record(
        select_stars(HASH_OTHER), ordered=True)

    out["sf_f1_default"] = _stars_record(
        select_stars_for_a_frame(1, HASH_MAIN), ordered=True)
    out["sf_f1_top2"] = _stars_record(
        select_stars_for_a_frame(1, HASH_MAIN, stars_to_use=2),
        ordered=True)
    out["sf_f1_namelist"] = _stars_record(
        select_stars_for_a_frame(1, HASH_MAIN, stars_to_use=["a", "d"]),
        ordered=False)
    out["sf_f1_excl_str"] = _stars_record(
        select_stars_for_a_frame(1, HASH_MAIN, stars_to_exclude="ab"),
        ordered=True)
    out["sf_f2_default"] = _stars_record(
        select_stars_for_a_frame(2, HASH_MAIN), ordered=True)
    out["sf_f1_other_hash"] = _stars_record(
        select_stars_for_a_frame(1, HASH_OTHER), ordered=True)

    out["qa_f1_main"] = _stars_record(
        query_all_stars(1, HASH_MAIN), ordered=False)
    out["qa_f1_nohash"] = _stars_record(
        query_all_stars(1), ordered=False)
    out["qa_f2_main"] = _stars_record(
        query_all_stars(2, HASH_MAIN), ordered=False)

    out["roi_basic"] = _roi_record(
        get_frames_for_roi(HASH_MAIN, 0.0, 2.0, {}, {}))
    out["roi_seeing_constraint"] = _roi_record(
        get_frames_for_roi(HASH_MAIN, 0.0, 2.0,
                           {"seeing_arcseconds": (0.0, 1.3)}, {}))
    out["roi_coeff_constraint"] = _roi_record(
        get_frames_for_roi(HASH_MAIN, 0.0, 2.0, {},
                           {"coefficient": (0.9, 1.05)}))
    out["roi_wide_chi2"] = _roi_record(
        get_frames_for_roi(HASH_MAIN, 0.0, 10.0, {}, {}))
    return out


def main(reference_dir="/root/reference"):
    from unittest import mock

    sys.path.insert(0, str(reference_dir))
    # repo root (for lightcurver_tpu) — the script usually runs as
    # `python tools/record_reference_db_golden.py`, whose sys.path[0]
    # is tools/
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    for name in _STUBS:
        sys.modules.setdefault(name, mock.MagicMock())
    # plug OUR sigma-clip core into the astropy stub so the reference's
    # chi2_selector runs its real arithmetic (see run_chi2_scenario)
    from lightcurver_tpu.utilities.stats import sigma_clipped_stats
    sys.modules["astropy.stats"].sigma_clipped_stats = sigma_clipped_stats
    # prefer REAL shapely (the CI golden lane installs it) so the
    # recorded union/simplify rings are the reference's own; fall back
    # to the SimplePolygon-backed stub so the reference's assignment
    # task still runs its real geometry locally
    sys.modules.pop("shapely", None)
    sys.modules.pop("shapely.geometry", None)
    try:
        import shapely  # noqa: F401
        import shapely.geometry  # noqa: F401

        shapely_provenance = "shapely"
    except ImportError:
        shp_root, shp_geom = _shapely_stub_modules()
        sys.modules["shapely"] = shp_root
        sys.modules["shapely.geometry"] = shp_geom
        shapely_provenance = "stub"

    import lightcurver.processes.absolute_zeropoint_calculation as refzp
    import lightcurver.processes.frame_star_assignment as refassign
    import lightcurver.utilities.footprint as reffp
    import lightcurver.processes.normalization_calculation as refnorm
    import lightcurver.processes.roi_file_preparation as refroi
    import lightcurver.structure.database as refdb
    import lightcurver.utilities.absolute_magnitudes_from_gaia as refgaia
    import lightcurver.utilities.chi2_selector as refchi2

    with tempfile.TemporaryDirectory() as td:
        db = os.path.join(td, "database.sqlite3")
        refdb.initialize_database(db)
        conn = sqlite3.connect(db)
        populate(conn)
        conn.close()
        cfg = zp_config(db)
        refdb.get_user_config = lambda: cfg
        refzp.get_user_config = lambda: cfg
        refgaia.get_user_config = lambda: cfg
        refnorm.get_user_config = lambda: cfg
        refchi2.get_user_config = lambda: cfg
        out = run_scenarios(refdb.select_stars,
                            refdb.select_stars_for_a_frame,
                            refdb.query_all_stars_for_frame_and_footprint,
                            refroi.get_frames_for_roi)
        out["zeropoints"] = run_zeropoint_scenario(
            refzp.calculate_zeropoints, db)
        out["normalization"] = run_normalization_scenario(
            refnorm.calculate_coefficient, db)
        out["gaia_bands"] = run_gaia_band_scenario(
            refgaia.save_gaia_catalog_photometry_to_database, cfg, db)
        out["chi2_bounds"] = run_chi2_scenario(refchi2.get_chi2_bounds,
                                               cfg)
    with tempfile.TemporaryDirectory() as td:
        db2 = os.path.join(td, "assign.sqlite3")
        refdb.initialize_database(db2)
        conn = sqlite3.connect(db2)
        assignment_populate(conn)
        conn.close()
        cfg2 = {"database_path": db2}
        refassign.get_user_config = lambda: cfg2
        out["star_assignment"] = run_assignment_scenario(
            refassign.populate_stars_in_frames, db2)
    with tempfile.TemporaryDirectory() as td:
        import types

        import numpy as np

        state = {}

        def set_db_path(path):
            state["cfg"] = {"database_path": path}

        refdb.get_user_config = lambda: state["cfg"]

        def ref_make_wcs(**matrices):
            return types.SimpleNamespace(
                wcs=types.SimpleNamespace(**matrices))

        out["footprint"] = run_footprint_scenarios(
            reffp, refdb.initialize_database, set_db_path, td,
            ref_make_wcs)
        # the reference's own database_get_footprint getter crashes:
        # json.loads receives the (polygon,) row TUPLE (footprint.py:
        # 72-80, dead code in the reference — no caller).  Ours indexes
        # the row; record the crash so the divergence stays pinned.
        set_db_path(os.path.join(td, "fp_getter.sqlite3"))
        refdb.initialize_database(state["cfg"]["database_path"])
        reffp.database_insert_single_footprint(
            7, np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]))
        try:
            reffp.database_get_footprint(7)
            out["footprint"]["ref_get_footprint_typeerror"] = False
        except TypeError:
            out["footprint"]["ref_get_footprint_typeerror"] = True

    out["footprint_union"] = run_union_scenarios(
        reffp, sys.modules["shapely"], shapely_provenance)

    # star-extraction post-processing (fake sep + MiniTable)
    sep_mod = types.ModuleType("sep")
    sys.modules["sep"] = sep_mod
    sys.modules["astropy.table"].Table = _mini_table_cls()
    import lightcurver.processes.star_extraction as refext

    dets = sep_detections()
    sep_mod.extract = lambda data, thresh, var, minarea: dets
    out["star_extraction"] = extraction_record(
        refext.extract_stars(None, None))
    single = sep_single_detection()
    sep_mod.extract = lambda data, thresh, var, minarea: single
    # divergence pin: with ONE detection std = 0 and the reference's
    # strict `elongation < median + 0` drops it; ours keeps it
    out["star_extraction_single_survivors"] = len(
        refext.extract_stars(None, None))
    out["_provenance"] = ("computed by the reference implementation at "
                          f"{reference_dir} (astropy/shapely/starred "
                          "stubbed; sqlite3+pandas only)")
    FIXTURE.parent.mkdir(parents=True, exist_ok=True)
    FIXTURE.write_text(json.dumps(out, indent=1))
    print(f"wrote {FIXTURE}")


if __name__ == "__main__":
    main(*sys.argv[1:])
