"""Affine georeferencing transforms and pixel windows (rasterio-compatible).

world_x = a*col + b*row + c ; world_y = d*col + e*row + f
(rasterio's Affine(a, b, c, d, e, f) convention; north-up rasters have
b = d = 0, e < 0).
"""
import math


class Affine:
    __slots__ = ("a", "b", "c", "d", "e", "f")

    def __init__(self, a, b, c, d, e, f):
        self.a, self.b, self.c = float(a), float(b), float(c)
        self.d, self.e, self.f = float(d), float(e), float(f)

    @staticmethod
    def identity():
        return Affine(1, 0, 0, 0, 1, 0)

    @staticmethod
    def translation(tx, ty):
        return Affine(1, 0, tx, 0, 1, ty)

    @staticmethod
    def scale(sx, sy=None):
        if sy is None:
            sy = sx
        return Affine(sx, 0, 0, 0, sy, 0)

    def __mul__(self, other):
        if isinstance(other, Affine):
            return Affine(
                self.a * other.a + self.b * other.d,
                self.a * other.b + self.b * other.e,
                self.a * other.c + self.b * other.f + self.c,
                self.d * other.a + self.e * other.d,
                self.d * other.b + self.e * other.e,
                self.d * other.c + self.e * other.f + self.f,
            )
        # rasterio semantics: `transform * (col, row)` is the exact affine
        # application (pixel UPPER-LEFT corner, not center)
        col, row = other
        return (
            self.a * col + self.b * row + self.c,
            self.d * col + self.e * row + self.f,
        )

    def xy(self, row, col, offset="center"):
        """Pixel (row, col) -> world (x, y)."""
        off = 0.5 if offset == "center" else 0.0
        x = self.a * (col + off) + self.b * (row + off) + self.c
        y = self.d * (col + off) + self.e * (row + off) + self.f
        return x, y

    def rowcol(self, x, y):
        """World (x, y) -> integer pixel (row, col) containing it."""
        det = self.a * self.e - self.b * self.d
        col = (self.e * (x - self.c) - self.b * (y - self.f)) / det
        row = (-self.d * (x - self.c) + self.a * (y - self.f)) / det
        return int(math.floor(row)), int(math.floor(col))

    def _quantized(self):
        # eq and hash MUST quantize identically: a tolerance-based __eq__
        # with a rounding __hash__ lets equal objects hash differently
        # (dict/set lookups silently miss)
        return tuple(round(getattr(self, k), 9) for k in self.__slots__)

    def __eq__(self, other):
        return isinstance(other, Affine) and self._quantized() == other._quantized()

    def __hash__(self):  # rasterio's Affine is hashable (dict/set keys)
        return hash(self._quantized())

    def __repr__(self):
        return "Affine({}, {}, {}, {}, {}, {})".format(
            self.a, self.b, self.c, self.d, self.e, self.f
        )

    def to_gdal(self):
        return (self.c, self.a, self.b, self.f, self.d, self.e)


def from_origin(west, north, xres, yres):
    """North-up transform from the top-left corner and pixel sizes."""
    return Affine(xres, 0, west, 0, -yres, north)


class Window:
    """Pixel window: col_off/row_off may be negative (boundless reads)."""

    __slots__ = ("col_off", "row_off", "width", "height")

    def __init__(self, col_off, row_off, width, height):
        self.col_off = col_off
        self.row_off = row_off
        self.width = width
        self.height = height

    def round(self):
        c0 = int(math.floor(self.col_off))
        r0 = int(math.floor(self.row_off))
        w = int(round(self.col_off + self.width)) - c0
        h = int(round(self.row_off + self.height)) - r0
        return Window(c0, r0, max(w, 0), max(h, 0))

    def __repr__(self):
        return "Window(col_off={}, row_off={}, width={}, height={})".format(
            self.col_off, self.row_off, self.width, self.height
        )


def window_from_bounds(left, bottom, right, top, transform):
    """UTM bounds -> (fractional) pixel window, north-up transforms."""
    col_off = (left - transform.c) / transform.a
    row_off = (top - transform.f) / transform.e
    width = (right - left) / transform.a
    height = (bottom - top) / transform.e
    return Window(col_off, row_off, width, height)


def window_transform(window, transform):
    """Transform of a sub-window of a raster."""
    x, y = transform.xy(window.row_off, window.col_off, offset="ul")
    return Affine(transform.a, transform.b, x, transform.d, transform.e, y)
