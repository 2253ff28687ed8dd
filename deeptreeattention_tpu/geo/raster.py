"""rasterio-like raster surface over the in-house GeoTIFF codec.

Mirrors the call sites the reference uses (open/read(window)/res/transform/
window_transform/bounds; reference src/patches.py:5-30, src/generate.py:35-37)
with the C++ fast path from native/ when built.
"""
import numpy as np

from deeptreeattention_tpu.geo import tiff
from deeptreeattention_tpu.geo.affine import (
    Window,
    window_from_bounds,
    window_transform,
)


class Raster:
    """Raster handle; decodes via the C++ backend when built (bit-identical
    to the numpy codec — asserted in tests/test_native.py), else pure numpy.
    Set DTA_PY_TIFF=1 to force the numpy codec."""

    def __init__(self, path, backend="auto"):
        import os

        self._r = None
        if backend in ("auto", "native") and not os.environ.get("DTA_PY_TIFF"):
            try:
                from deeptreeattention_tpu.geo import native

                if native.available():
                    self._r = native.NativeRaster(path)
            except Exception:
                self._r = None
        if self._r is None:
            self._r = tiff.TiffReader(path)
        self.path = path

    # rasterio-compatible surface ------------------------------------------
    @property
    def transform(self):
        return self._r.transform

    @property
    def crs(self):
        return self._r.crs

    @property
    def res(self):
        return self._r.res

    @property
    def count(self):
        return self._r.count

    @property
    def width(self):
        return self._r.width

    @property
    def height(self):
        return self._r.height

    @property
    def bounds(self):
        return self._r.bounds

    @property
    def dtypes(self):
        return [np.dtype(self._r.dtype).name] * self._r.count

    @property
    def nodata(self):
        return self._r.nodata

    def read(self, indexes=None, window=None, boundless=False, fill_value=0):
        return self._r.read(
            window=window, boundless=boundless, fill_value=fill_value, indexes=indexes
        )

    def read_bounds(self, left, bottom, right, top, boundless=False):
        win = window_from_bounds(left, bottom, right, top, self.transform)
        return self.read(window=win, boundless=boundless)

    def window(self, left, bottom, right, top):
        return window_from_bounds(left, bottom, right, top, self.transform)

    def window_transform(self, window):
        return window_transform(window.round(), self.transform)

    def close(self):
        self._r.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def open_raster(path):
    if str(path).endswith(".h5"):  # NEON reflectance: no tif conversion needed
        from deeptreeattention_tpu.data.hyperspectral import H5Raster

        return H5Raster(path)
    return Raster(path)


def write_raster(path, array, transform=None, crs=None, **kwargs):
    return tiff.write_tiff(path, array, transform=transform, crs=crs, **kwargs)


# rasterio.windows.from_bounds equivalent re-export for call-site familiarity
def from_bounds(left, bottom, right, top, transform):
    return window_from_bounds(left, bottom, right, top, transform)


def window(col_off, row_off, width, height):
    return Window(col_off, row_off, width, height)
