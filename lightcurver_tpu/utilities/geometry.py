"""Planar polygon operations (shapely replacement, numpy only).

The pipeline treats frame footprints as polygons in the (ra, dec) plane —
the reference does the same with shapely and notes "we assume that the
gnomonic projection is fine" (reference structure/database.py:314).
Frame footprints are convex quadrilaterals, so:

- intersection: Sutherland-Hodgman clipping (exact for convex clippers),
- union: convex hull of the vertex union — exact when the union is convex
  (nearly-identical survey pointings), otherwise a tight convex superset;
  downstream star selection re-checks membership per frame, so a
  superset here is safe.
"""

import numpy as np


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
        """Convex-hull union (see module docstring)."""
        allv = np.vstack([self.vertices, other.vertices])
        return SimplePolygon(convex_hull(allv))

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
