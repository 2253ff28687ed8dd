"""Minimal planar geometry: Point / Box / Polygon.

Covers the geometry surface the pipeline uses (crown boxes, stem points,
contributed polygons): bounds, centroid, area, buffer->envelope, intersects /
contains / intersection-area, distance. Shapely-compatible method names so
call sites read the same.
"""
import math


class Geometry:
    __slots__ = ()

    @property
    def bounds(self):  # (minx, miny, maxx, maxy)
        raise NotImplementedError

    @property
    def centroid(self):
        minx, miny, maxx, maxy = self.bounds
        return Point((minx + maxx) / 2.0, (miny + maxy) / 2.0)

    @property
    def envelope(self):
        minx, miny, maxx, maxy = self.bounds
        return Box(minx, miny, maxx, maxy)

    @property
    def is_empty(self):
        minx, miny, maxx, maxy = self.bounds
        return not (maxx >= minx and maxy >= miny)

    def buffer(self, dist):
        minx, miny, maxx, maxy = self.bounds
        return Box(minx - dist, miny - dist, maxx + dist, maxy + dist)

    def bbox_intersects(self, other):
        a = self.bounds
        b = other.bounds
        return not (a[2] < b[0] or b[2] < a[0] or a[3] < b[1] or b[3] < a[1])

    def intersects(self, other):
        return self.bbox_intersects(other)

    def distance(self, other):
        # distance between centroids for points; bbox gap otherwise
        if isinstance(self, Point) and isinstance(other, Point):
            return math.hypot(self.x - other.x, self.y - other.y)
        a, b = self.bounds, other.bounds
        dx = max(b[0] - a[2], a[0] - b[2], 0.0)
        dy = max(b[1] - a[3], a[1] - b[3], 0.0)
        return math.hypot(dx, dy)

    def __repr__(self):
        return self.wkt

    def __eq__(self, other):
        return isinstance(other, Geometry) and self.wkt == other.wkt

    def __hash__(self):
        return hash(self.wkt)


class Point(Geometry):
    __slots__ = ("x", "y")
    geom_type = "Point"

    def __init__(self, x, y=None):
        if y is None:  # Point((x, y)) form
            x, y = x
        self.x = float(x)
        self.y = float(y)

    @property
    def bounds(self):
        return (self.x, self.y, self.x, self.y)

    @property
    def centroid(self):
        return self

    @property
    def area(self):
        return 0.0

    @property
    def coords(self):
        return [(self.x, self.y)]

    @property
    def wkt(self):
        return "POINT ({} {})".format(self.x, self.y)

    def within(self, other):
        minx, miny, maxx, maxy = other.bounds
        if not (minx <= self.x <= maxx and miny <= self.y <= maxy):
            return False
        if isinstance(other, Polygon):
            return other.contains(self)
        return True


class Box(Geometry):
    """Axis-aligned rectangle (shapely.geometry.box equivalent)."""

    __slots__ = ("minx", "miny", "maxx", "maxy")
    geom_type = "Polygon"

    def __init__(self, minx, miny, maxx, maxy):
        # shapely.geometry.box accepts swapped coordinates (the polygon's
        # .bounds normalizes them); store normalized so bounds/area/contains
        # agree with shapely for inverted inputs
        self.minx, self.maxx = sorted((float(minx), float(maxx)))
        self.miny, self.maxy = sorted((float(miny), float(maxy)))

    @property
    def bounds(self):
        return (self.minx, self.miny, self.maxx, self.maxy)

    @property
    def area(self):
        return max(self.maxx - self.minx, 0.0) * max(self.maxy - self.miny, 0.0)

    @property
    def exterior_coords(self):
        # closed ring, counter-clockwise starting bottom-left
        return [
            (self.minx, self.miny),
            (self.maxx, self.miny),
            (self.maxx, self.maxy),
            (self.minx, self.maxy),
            (self.minx, self.miny),
        ]

    @property
    def wkt(self):
        ring = ", ".join("{} {}".format(x, y) for x, y in self.exterior_coords)
        return "POLYGON (({}))".format(ring)

    def contains(self, other):
        if isinstance(other, Point):
            return self.minx <= other.x <= self.maxx and self.miny <= other.y <= self.maxy
        b = other.bounds
        return self.minx <= b[0] and self.miny <= b[1] and b[2] <= self.maxx and b[3] <= self.maxy

    def intersection_area(self, other):
        b = other.bounds
        w = min(self.maxx, b[2]) - max(self.minx, b[0])
        h = min(self.maxy, b[3]) - max(self.miny, b[1])
        return max(w, 0.0) * max(h, 0.0)


class Polygon(Geometry):
    """Simple polygon with an exterior ring (holes unsupported — unused here)."""

    __slots__ = ("ring",)
    geom_type = "Polygon"

    def __init__(self, ring):
        ring = [(float(x), float(y)) for x, y in ring]
        if ring[0] != ring[-1]:
            ring = ring + [ring[0]]
        self.ring = ring

    @property
    def bounds(self):
        xs = [p[0] for p in self.ring]
        ys = [p[1] for p in self.ring]
        return (min(xs), min(ys), max(xs), max(ys))

    @property
    def area(self):
        return abs(self._signed_area())

    def _signed_area(self):
        s = 0.0
        for (x0, y0), (x1, y1) in zip(self.ring[:-1], self.ring[1:]):
            s += x0 * y1 - x1 * y0
        return s / 2.0

    @property
    def centroid(self):
        a = self._signed_area()
        if a == 0:
            return super().centroid
        cx = cy = 0.0
        for (x0, y0), (x1, y1) in zip(self.ring[:-1], self.ring[1:]):
            cross = x0 * y1 - x1 * y0
            cx += (x0 + x1) * cross
            cy += (y0 + y1) * cross
        return Point(cx / (6.0 * a), cy / (6.0 * a))

    @property
    def exterior_coords(self):
        return list(self.ring)

    @property
    def wkt(self):
        ring = ", ".join("{} {}".format(x, y) for x, y in self.ring)
        return "POLYGON (({}))".format(ring)

    def contains(self, point):
        # even-odd ray casting
        x, y = point.x, point.y
        inside = False
        for (x0, y0), (x1, y1) in zip(self.ring[:-1], self.ring[1:]):
            if (y0 > y) != (y1 > y):
                t = (y - y0) / (y1 - y0)
                if x < x0 + t * (x1 - x0):
                    inside = not inside
        return inside


def box(minx, miny, maxx, maxy):
    """shapely.geometry.box-compatible constructor."""
    return Box(minx, miny, maxx, maxy)


def from_wkt(text):
    text = text.strip()
    if text.upper().startswith("POINT"):
        inner = text[text.index("(") + 1 : text.rindex(")")].strip()
        x, y = inner.split()[:2]
        return Point(float(x), float(y))
    if text.upper().startswith("POLYGON"):
        inner = text[text.index("((") + 2 : text.rindex("))")]
        ring = []
        for pair in inner.split(","):
            x, y = pair.split()[:2]
            ring.append((float(x), float(y)))
        return _polygon_or_box(ring)
    raise ValueError("unsupported WKT: {}".format(text[:40]))


def _polygon_or_box(ring):
    """Collapse an axis-aligned 5-point ring into a Box for fast predicates."""
    poly = Polygon(ring)
    if len(poly.ring) == 5:
        xs = sorted({round(p[0], 9) for p in poly.ring})
        ys = sorted({round(p[1], 9) for p in poly.ring})
        if len(xs) == 2 and len(ys) == 2:
            return Box(xs[0], ys[0], xs[1], ys[1])
    return poly
