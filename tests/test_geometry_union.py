"""Exact polygon union (geometry.polygon_union) vs independent oracles.

Closes VERDICT r4 #3 ("exact non-convex footprint union"): the union is
now traced exactly (arrangement walk) instead of the convex-hull
superset.  The reference's shapely union
(reference utilities/footprint.py:57) is the semantic target; since
shapely is absent here, correctness is pinned against
  - hand-constructed cases whose union ring is known exactly,
  - an exact rectangle-sweep oracle for axis-aligned stacks
    (coordinate-compression: no sampling error),
  - membership equivalence on random probes (union.contains == any
    polygon contains) away from edges,
and the CI golden lane (tools/record_reference_db_golden.py) records
real-shapely union/simplify outputs when shapely is importable.
"""

import numpy as np
import pytest

from lightcurver_tpu.utilities.geometry import (SimplePolygon,
                                                polygon_union)


def sq(x0, y0, w=1.0, h=1.0):
    return np.array([[x0, y0], [x0 + w, y0],
                     [x0 + w, y0 + h], [x0, y0 + h]])


def rect_union_area(rects):
    """Exact union area of axis-aligned rects (coordinate compression)."""
    xs = sorted({r[0] for r in rects} | {r[2] for r in rects})
    ys = sorted({r[1] for r in rects} | {r[3] for r in rects})
    total = 0.0
    for i in range(len(xs) - 1):
        for j in range(len(ys) - 1):
            cx, cy = (xs[i] + xs[i + 1]) / 2, (ys[j] + ys[j + 1]) / 2
            if any(r[0] <= cx <= r[2] and r[1] <= cy <= r[3]
                   for r in rects):
                total += (xs[i + 1] - xs[i]) * (ys[j + 1] - ys[j])
    return total


def edge_distance(polys, x, y):
    d = np.inf
    for p in polys:
        v = np.asarray(p)
        x1, y1 = v[:, 0], v[:, 1]
        x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
        dx, dy = x2 - x1, y2 - y1
        ll = dx * dx + dy * dy
        t = np.clip(((x - x1) * dx + (y - y1) * dy)
                    / np.where(ll > 0, ll, 1.0), 0, 1)
        d = min(d, float(np.min((x1 + t * dx - x) ** 2
                                + (y1 + t * dy - y) ** 2)) ** 0.5)
    return d


def assert_membership_equivalent(union_poly, polys, lo, hi, seed=0,
                                 n=400):
    rng = np.random.default_rng(seed)
    sps = [SimplePolygon(p) for p in polys]
    checked = 0
    for _ in range(n):
        x = rng.uniform(lo[0], hi[0])
        y = rng.uniform(lo[1], hi[1])
        if edge_distance(polys, x, y) < 1e-6:
            continue
        checked += 1
        want = any(sp.contains(x, y) for sp in sps)
        assert union_poly.contains(x, y) == want, (x, y)
    assert checked > n // 2


class TestExactUnion:
    def test_l_union_ring_exact(self):
        u = polygon_union([sq(0, 0), sq(0.5, 0.5)])
        assert u.area == pytest.approx(1.75, abs=1e-12)
        # the 8-vertex L-ring, no hull shortcut across the notch
        assert len(u.vertices) == 8
        assert not u.contains(1.4, 0.1)   # hull would contain this

    def test_duplicate_and_shared_edges(self):
        assert polygon_union([sq(0, 0), sq(0, 0)]).area == \
            pytest.approx(1.0, abs=1e-12)
        assert polygon_union([sq(0, 0), sq(1, 0)]).area == \
            pytest.approx(2.0, abs=1e-12)
        # partial collinear edge overlap
        u = polygon_union([sq(0, 0, 2, 1), sq(0.5, 1, 1, 1)])
        assert u.area == pytest.approx(3.0, abs=1e-12)

    def test_vertex_touching_squares(self):
        u = polygon_union([sq(0, 0), sq(1, 1)])
        assert u.area == pytest.approx(2.0, abs=1e-12)
        assert not u.contains(1.5, 0.5)
        assert not u.contains(0.5, 1.5)

    def test_plus_shape(self):
        u = polygon_union([sq(-1, -0.25, 2, 0.5), sq(-0.25, -1, 0.5, 2)])
        assert u.area == pytest.approx(2.0 * 0.5 * 2 - 0.25, abs=1e-12)
        assert len(u.vertices) == 12

    @pytest.mark.parametrize("n_arms", [3, 5, 8])
    def test_rotated_star(self, n_arms):
        base = np.array([[-1, -0.15], [1, -0.15], [1, 0.15], [-1, 0.15]])
        polys = []
        for k in range(n_arms):
            th = np.pi * k / n_arms
            rot = np.array([[np.cos(th), -np.sin(th)],
                            [np.sin(th), np.cos(th)]])
            polys.append(base @ rot.T)
        u = polygon_union(polys)
        assert len(u.vertices) == 6 * n_arms
        assert_membership_equivalent(u, polys, (-1.2, -1.2), (1.2, 1.2),
                                     seed=n_arms)

    def test_dithered_stack_vs_exact_rect_oracle(self):
        # the realistic survey case: 40 frames, arcsecond-scale dithers
        # on a degree-scale sky position — checks the eps snapping at
        # RA ~ 150 against an oracle with NO sampling error
        rng = np.random.default_rng(42)
        polys, rects = [], []
        for _ in range(40):
            dx, dy = rng.normal(0.0, 3e-4, 2)
            polys.append(sq(150.0 + dx, 2.0 + dy, 0.1, 0.1))
            rects.append((150.0 + dx, 2.0 + dy, 150.1 + dx, 2.1 + dy))
        u = polygon_union(polys)
        assert u.area == pytest.approx(rect_union_area(rects), rel=1e-8)

    def test_random_quads_membership(self):
        rng = np.random.default_rng(7)
        for trial in range(5):
            polys = []
            for _ in range(rng.integers(3, 20)):
                c = rng.normal(0, 0.3, 2)
                w, h = rng.uniform(0.8, 1.5, 2)
                th = rng.uniform(0, np.pi)
                rot = np.array([[np.cos(th), -np.sin(th)],
                                [np.sin(th), np.cos(th)]])
                q = (np.array([[-w / 2, -h / 2], [w / 2, -h / 2],
                               [w / 2, h / 2], [-w / 2, h / 2]])
                     @ rot.T + c)
                if SimplePolygon(q).contains(0.0, 0.0):
                    polys.append(q)
            if len(polys) < 2:
                continue
            u = polygon_union(polys)
            lo = np.min(np.vstack(polys), 0) - 0.1
            hi = np.max(np.vstack(polys), 0) + 0.1
            assert_membership_equivalent(u, polys, lo, hi, seed=trial)
            areas = [SimplePolygon(p).area for p in polys]
            assert max(areas) - 1e-12 <= u.area <= sum(areas) + 1e-12

    def test_disjoint_falls_back_to_hull(self, caplog):
        import logging

        with caplog.at_level(logging.WARNING,
                             "lightcurver_tpu.utilities.geometry"):
            u = polygon_union([sq(0, 0), sq(5, 5)])
        # documented superset fallback, loudly
        from lightcurver_tpu.utilities.geometry import convex_hull

        hull = SimplePolygon(convex_hull(np.vstack([sq(0, 0), sq(5, 5)])))
        assert u.area == pytest.approx(hull.area, rel=1e-12)
        assert any("convex-hull superset" in r.message
                   for r in caplog.records)

    def test_pairwise_union_method(self):
        a = SimplePolygon(sq(0, 0))
        b = SimplePolygon(sq(0.5, 0.5))
        assert a.union(b).area == pytest.approx(1.75, abs=1e-12)


class TestSimplify:
    def test_collinear_vertices_dropped(self):
        ring = [(0, 0), (0.5, 0), (1, 0), (1, 1), (0, 1)]
        out = SimplePolygon(ring).simplify(1e-6)
        assert len(out.vertices) == 4
        assert out.area == pytest.approx(1.0, abs=1e-12)

    def test_near_collinear_within_tolerance(self):
        ring = [(0, 0), (0.5, 4e-4), (1, 0), (1, 1), (0, 1)]
        out = SimplePolygon(ring).simplify(0.001)
        assert len(out.vertices) == 4
        # below tolerance the bump survives
        keep = SimplePolygon(ring).simplify(1e-5)
        assert len(keep.vertices) == 5

    def test_never_degenerates(self):
        tri = SimplePolygon([(0, 0), (1e-6, 0), (0, 1e-6)])
        out = tri.simplify(0.5)
        assert len(out.vertices) == 3

    def test_dithered_union_simplifies_small(self):
        # the production path: 40 dithered frames -> exact union has
        # dozens of vertices within ~1 arcsec of each other; the
        # reference's simplify(0.001 deg) collapses them (reference
        # utilities/footprint.py:57-58)
        rng = np.random.default_rng(3)
        polys = [sq(150.0 + dx, 2.0 + dy, 0.1, 0.1)
                 for dx, dy in rng.normal(0.0, 3e-4, (40, 2))]
        u = polygon_union(polys)
        assert len(u.vertices) > 8
        s = u.simplify(0.001)
        assert len(s.vertices) <= 8
        # simplification error bounded by the tolerance x perimeter
        assert abs(s.area - u.area) <= 0.001 * 4 * 0.11


class TestFootprintIntegration:
    def test_calc_common_and_total_exact_union(self):
        from lightcurver_tpu.utilities.footprint import (
            calc_common_and_total_footprint)

        fp1 = sq(10.0, 5.0, 0.2, 0.2)
        fp2 = sq(10.1, 5.1, 0.2, 0.2)
        common, largest = calc_common_and_total_footprint([fp1, fp2])
        assert common.area == pytest.approx(0.01, rel=1e-9)
        # EXACT union area (hull would give 0.02 + 2*0.01 corners more)
        assert largest.area == pytest.approx(0.07, rel=1e-9)
        # the notch corner is OUTSIDE the stored union now
        assert not largest.contains(10.28, 5.02)
