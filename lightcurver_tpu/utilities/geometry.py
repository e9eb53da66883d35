"""Planar polygon operations (shapely replacement, numpy only).

The pipeline treats frame footprints as polygons in the (ra, dec) plane —
the reference does the same with shapely and notes "we assume that the
gnomonic projection is fine" (reference structure/database.py:314).
Frame footprints are convex quadrilaterals, so:

- intersection: Sutherland-Hodgman clipping (exact for convex clippers),
- union: EXACT, by an arrangement walk (``polygon_union``) — split every
  edge at its crossings with the other polygons, keep the sub-segments
  on the union boundary, stitch them into the outer ring.  Matches
  shapely's union semantics (reference utilities/footprint.py:57) for
  the pipeline's case: frames that all contain the ROI, whose union is
  therefore star-shaped (single ring, no holes).  Only when the walk
  does NOT close into a single ring (disjoint pointings — excluded by
  the roi_in_footprint filter upstream) does it fall back to the old
  convex-hull superset, which downstream membership re-checks keep safe.
- simplify: Douglas-Peucker on the ring, the counterpart of the
  reference's ``shapely.simplify(tolerance=0.001, preserve_topology=
  True)`` (reference utilities/footprint.py:52-58) — keeps the stored /
  ADQL-emitted polygons small on heavily dithered stacks.
"""

import logging

import numpy as np

logger = logging.getLogger(__name__)


class SimplePolygon:
    """Vertex-list polygon with the few operations the pipeline needs."""

    def __init__(self, vertices):
        v = np.asarray(vertices, dtype=float).reshape(-1, 2)
        # drop a closing vertex if present
        if len(v) > 1 and np.allclose(v[0], v[-1]):
            v = v[:-1]
        self.vertices = v

    # -- geometry ---------------------------------------------------------

    @property
    def area(self):
        x, y = self.vertices[:, 0], self.vertices[:, 1]
        return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))

    def centroid(self):
        return self.vertices.mean(axis=0)

    def contains(self, x, y):
        """Point-in-polygon by winding (works for any simple polygon)."""
        v = self.vertices
        x2, y2 = np.roll(v[:, 0], -1), np.roll(v[:, 1], -1)
        x1, y1 = v[:, 0], v[:, 1]
        # count crossings of a ray to +x
        cond = (y1 <= y) != (y2 <= y)
        with np.errstate(divide="ignore", invalid="ignore"):
            x_int = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
        crossings = np.sum(cond & (x < x_int))
        return bool(crossings % 2 == 1)

    def intersection(self, other):
        """Sutherland-Hodgman clip of self by (convex) ``other``."""
        subject = [tuple(p) for p in self.vertices]
        clip = _ccw([tuple(p) for p in other.vertices])

        def inside(p, a, b):
            return ((b[0] - a[0]) * (p[1] - a[1])
                    - (b[1] - a[1]) * (p[0] - a[0])) >= 0

        def line_intersect(p1, p2, a, b):
            dx1, dy1 = p2[0] - p1[0], p2[1] - p1[1]
            dx2, dy2 = b[0] - a[0], b[1] - a[1]
            denom = dx1 * dy2 - dy1 * dx2
            t = ((a[0] - p1[0]) * dy2 - (a[1] - p1[1]) * dx2) / denom
            return (p1[0] + t * dx1, p1[1] + t * dy1)

        output = subject
        for i in range(len(clip)):
            a, b = clip[i], clip[(i + 1) % len(clip)]
            input_list, output = output, []
            if not input_list:
                break
            prev = input_list[-1]
            for cur in input_list:
                if inside(cur, a, b):
                    if not inside(prev, a, b):
                        output.append(line_intersect(prev, cur, a, b))
                    output.append(cur)
                elif inside(prev, a, b):
                    output.append(line_intersect(prev, cur, a, b))
                prev = cur
        if len(output) < 3:
            return None
        result = SimplePolygon(output)
        # edge-touching inputs clip to a degenerate (collinear) polygon
        # with ~zero area; returning it would let a valid-looking but
        # empty "common footprint" sail past the 'frames share NO
        # common footprint' guards and reach the Gaia ADQL emitter
        if result.area <= 1e-12 * max(self.area, other.area, 1e-30):
            return None
        return result

    def union(self, other):
        """Exact union (see module docstring and ``polygon_union``)."""
        return polygon_union([self, other])

    def union_convex_hull(self, other):
        """Convex hull of the vertex union: a tight convex SUPERSET of
        the true union (exact only when that union is convex) — the
        documented fallback when the exact boundary walk cannot close a
        single ring."""
        allv = np.vstack([self.vertices, other.vertices])
        return SimplePolygon(convex_hull(allv))

    def simplify(self, tolerance):
        """Douglas-Peucker ring simplification (shapely.simplify twin).

        Splits the ring at its two mutually-farthest vertices, runs DP
        on both open chains, and re-joins them; every dropped vertex
        lies within ``tolerance`` of the simplified outline.  Always
        keeps >= 3 vertices (degenerate results return self unchanged).
        """
        v = self.vertices
        if len(v) <= 3 or tolerance <= 0:
            return SimplePolygon(v)
        d2 = ((v[:, None, :] - v[None, :, :]) ** 2).sum(-1)
        i, j = np.unravel_index(int(np.argmax(d2)), d2.shape)
        i, j = min(i, j), max(i, j)
        chain1 = v[i:j + 1]
        chain2 = np.vstack([v[j:], v[:i + 1]])
        keep1 = _douglas_peucker(chain1, tolerance)
        keep2 = _douglas_peucker(chain2, tolerance)
        out = np.vstack([keep1[:-1], keep2[:-1]])
        if len(out) < 3:
            return SimplePolygon(v)
        return SimplePolygon(out)

    def translated(self, dx, dy):
        return SimplePolygon(self.vertices + np.array([dx, dy]))

    def buffered_contains(self, x, y, margin):
        """Contained with an inner safety margin.

        Implemented as containment in all four margin-translated copies —
        the reference's scheme at processes/frame_star_assignment.py:37-56.
        """
        return all(
            self.translated(sx * margin, sy * margin).contains(x, y)
            for sx, sy in ((1, 0), (-1, 0), (0, 1), (0, -1)))

    # -- (de)serialization: GeoJSON-compatible, like shapely.mapping -------

    def mapping(self):
        coords = self.vertices.tolist()
        coords.append(coords[0])
        return {"type": "Polygon", "coordinates": [coords]}

    @classmethod
    def from_mapping(cls, mapping_dict):
        return cls(mapping_dict["coordinates"][0])

    def __repr__(self):
        return f"SimplePolygon({len(self.vertices)} vertices)"


def _douglas_peucker(chain, tolerance):
    """DP on an open vertex chain; keeps endpoints."""
    chain = np.asarray(chain, dtype=float)
    if len(chain) <= 2:
        return chain
    a, b = chain[0], chain[-1]
    ab = b - a
    norm = np.hypot(*ab)
    rel = chain[1:-1] - a
    if norm == 0.0:
        d = np.hypot(rel[:, 0], rel[:, 1])
    else:
        d = np.abs(ab[0] * rel[:, 1] - ab[1] * rel[:, 0]) / norm
    k = int(np.argmax(d))
    if d[k] <= tolerance:
        return np.vstack([a, b])
    left = _douglas_peucker(chain[:k + 2], tolerance)
    right = _douglas_peucker(chain[k + 1:], tolerance)
    return np.vstack([left[:-1], right])


# ---------------------------------------------------------------------------
# exact n-way union (arrangement walk)
# ---------------------------------------------------------------------------

def _seg_split_params(p, r, q, s, eps):
    """Parameters t of segment p + t*r where segment (q, q+s) crosses it.

    Proper crossings return the clamped t; collinear overlaps return the
    projections of q and q+s that fall strictly inside (0, 1).
    """
    rxs = r[0] * s[1] - r[1] * s[0]
    qp = q - p
    out = []
    if abs(rxs) > eps * eps:
        t = (qp[0] * s[1] - qp[1] * s[0]) / rxs
        u = (qp[0] * r[1] - qp[1] * r[0]) / rxs
        if -1e-12 <= t <= 1 + 1e-12 and -1e-12 <= u <= 1 + 1e-12:
            out.append(min(max(t, 0.0), 1.0))
    else:
        qpxr = qp[0] * r[1] - qp[1] * r[0]
        rr = r[0] * r[0] + r[1] * r[1]
        if rr > 0 and abs(qpxr) <= eps * np.sqrt(rr):
            for pt in (q, q + s):
                t = ((pt[0] - p[0]) * r[0] + (pt[1] - p[1]) * r[1]) / rr
                if 1e-12 < t < 1 - 1e-12:
                    out.append(t)
    return out


def _strictly_inside(vertices, pt, eps):
    """Winding-inside AND farther than eps from every edge."""
    x, y = pt
    x1, y1 = vertices[:, 0], vertices[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    cond = (y1 <= y) != (y2 <= y)
    with np.errstate(divide="ignore", invalid="ignore"):
        x_int = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
    if not (np.sum(cond & (x < x_int)) % 2 == 1):
        return False
    dx, dy = x2 - x1, y2 - y1
    ll = dx * dx + dy * dy
    t = np.clip(((x - x1) * dx + (y - y1) * dy)
                / np.where(ll > 0, ll, 1.0), 0.0, 1.0)
    d2 = (x1 + t * dx - x) ** 2 + (y1 + t * dy - y) ** 2
    return bool(np.min(d2) > eps * eps)


def _snap_points(pts, eps):
    """Cluster endpoints within eps (union-find over an x-sorted sweep);
    every member of a cluster is replaced by the cluster mean so shared
    corners stitch exactly."""
    n = len(pts)
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    order = np.argsort(pts[:, 0], kind="stable")
    for ii in range(n):
        i = order[ii]
        for jj in range(ii + 1, n):
            j = order[jj]
            if pts[j, 0] - pts[i, 0] > eps:
                break
            if ((pts[i, 0] - pts[j, 0]) ** 2
                    + (pts[i, 1] - pts[j, 1]) ** 2 <= eps * eps):
                parent[find(i)] = find(j)
    groups = {}
    for i in range(n):
        groups.setdefault(find(i), []).append(i)
    out = np.empty_like(pts)
    for members in groups.values():
        out[members] = pts[members].mean(axis=0)
    return out


def polygon_union(polygons, eps_rel=1e-9):
    """EXACT union of simple polygons (shapely-union twin).

    Arrangement walk: every directed (CCW) edge is split at its
    crossings with all other polygons' edges; sub-segments strictly
    interior to any other polygon are dropped; duplicated shared edges
    are deduplicated and exactly-opposite pairs cancel (edges interior
    to the union); the survivors stitch into boundary loops, taking the
    most-counterclockwise turn at multi-way corners so the walk hugs
    the union's outside.

    Coordinates snap at ``eps_rel * max|coordinate|`` (~0.5 mas at
    RA 150 deg with the default) — the traced ring is exact to that
    snapping, measured at <= ~1e-9 relative area error on 40-frame
    dithered stacks against an exact rectangle-sweep oracle
    (tests/test_geometry_union.py).

    Returns a single SimplePolygon.  The pipeline's inputs all contain
    the ROI, so their union is star-shaped about it: exactly one CCW
    ring, no holes.  If the walk nevertheless yields anything else
    (disjoint pointings), falls back to the convex hull of all vertices
    — a documented tight SUPERSET that downstream per-frame membership
    re-checks keep safe (reference shapely would return a MultiPolygon
    whose GeoJSON the downstream mapping consumers don't accept either).
    """
    polys = [p if isinstance(p, SimplePolygon) else SimplePolygon(p)
             for p in polygons]
    verts = [np.asarray(_ccw([tuple(v) for v in p.vertices]), dtype=float)
             for p in polys]
    if len(verts) == 1:
        return SimplePolygon(verts[0])
    scale = max(1e-30, max(float(np.max(np.abs(v))) for v in verts))
    eps = eps_rel * scale

    def hull_fallback(why):
        logger.warning(
            "exact polygon union fell back to the convex-hull superset "
            "(%s); downstream membership checks remain exact", why)
        return SimplePolygon(convex_hull(np.vstack(verts)))

    # split every directed edge at crossings; keep boundary sub-segments
    raw = []
    for i, poly in enumerate(verts):
        n = len(poly)
        for k in range(n):
            p = poly[k]
            r = poly[(k + 1) % n] - p
            elen = float(np.hypot(*r))
            if elen <= eps:
                continue
            ts = {0.0, 1.0}
            for j, other in enumerate(verts):
                if j == i:
                    continue
                m = len(other)
                for ll in range(m):
                    q = other[ll]
                    s = other[(ll + 1) % m] - q
                    ts.update(_seg_split_params(p, r, q, s, eps))
            ts = sorted(ts)
            merged = [ts[0]]
            for t in ts[1:]:
                if (t - merged[-1]) * elen > eps:
                    merged.append(t)
            for t0, t1 in zip(merged[:-1], merged[1:]):
                mid = p + 0.5 * (t0 + t1) * r
                if any(_strictly_inside(verts[j], mid, eps)
                       for j in range(len(verts)) if j != i):
                    continue
                raw.append((p + t0 * r, p + t1 * r))
    if not raw:
        return hull_fallback("no boundary segments survived")

    # snap endpoints so shared corners stitch exactly
    snapped = _snap_points(np.array([pt for seg in raw for pt in seg]),
                           2.0 * eps)
    counts = {}
    for k in range(len(raw)):
        a = tuple(snapped[2 * k])
        b = tuple(snapped[2 * k + 1])
        if np.hypot(b[0] - a[0], b[1] - a[1]) > eps:
            counts[(a, b)] = counts.get((a, b), 0) + 1

    # dedup duplicates; cancel opposite pairs (interior shared edges)
    segs, consumed = [], set()
    for ab in list(counts):
        if ab in consumed:
            continue
        a, b = ab
        rev = (b, a)
        consumed.add(ab)
        if rev in counts and rev not in consumed:
            consumed.add(rev)
            net = counts[ab] - counts[rev]
            if net > 0:
                segs.append(ab)
            elif net < 0:
                segs.append(rev)
        else:
            segs.append(ab)

    # stitch into loops
    out_map = {}
    for a, b in segs:
        out_map.setdefault(a, []).append(b)
    unused = set(segs)
    loops = []
    while unused:
        a, b = min(unused)
        unused.discard((a, b))
        loop = [a]
        prev, cur = a, b
        for _ in range(4 * len(segs) + 4):
            if cur == loop[0]:
                break
            loop.append(cur)
            outs = [q for q in out_map.get(cur, ()) if (cur, q) in unused]
            if not outs:
                return hull_fallback("open boundary chain")
            if len(outs) == 1:
                nxt = outs[0]
            else:
                din = np.array(cur) - np.array(prev)
                ain = np.arctan2(din[1], din[0])
                nxt = max(outs, key=lambda q: (np.arctan2(
                    q[1] - cur[1], q[0] - cur[0]) - ain) % (2.0 * np.pi))
            unused.discard((cur, nxt))
            prev, cur = cur, nxt
        else:
            return hull_fallback("boundary walk did not close")
        if len(loop) >= 3:
            loops.append(np.asarray(loop))

    def signed_area(v):
        x, y = v[:, 0], v[:, 1]
        return 0.5 * (np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))

    ccw_loops = [lp for lp in loops if signed_area(lp) > eps * eps]
    if len(ccw_loops) != 1 or len(loops) != len(ccw_loops):
        return hull_fallback(
            f"{len(ccw_loops)} outer rings / {len(loops)} loops")
    return SimplePolygon(ccw_loops[0])


def _ccw(points):
    """Ensure counter-clockwise orientation."""
    v = np.asarray(points, dtype=float)
    x, y = v[:, 0], v[:, 1]
    signed = np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))
    return points if signed >= 0 else points[::-1]


def convex_hull(points):
    """Andrew's monotone chain; returns hull vertices counter-clockwise."""
    pts = sorted(set(map(tuple, np.asarray(points, dtype=float))))
    if len(pts) <= 2:
        return np.asarray(pts)

    def cross(o, a, b):
        return ((a[0] - o[0]) * (b[1] - o[1])
                - (a[1] - o[1]) * (b[0] - o[0]))

    lower = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper = []
    for p in reversed(pts):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return np.asarray(lower[:-1] + upper[:-1])
