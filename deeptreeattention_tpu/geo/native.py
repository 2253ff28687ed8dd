"""ctypes binding to the native GeoTIFF decoder (native/geotiff.cc).

Auto-builds the shared library on first use (g++ + zlib, a few seconds) and
degrades silently to the pure-numpy codec when a toolchain is unavailable —
`available()` reports which path is live. The win over the numpy codec is the
threaded `read_patches`: model-ready float32 batches (window -> band clip ->
per-pixel min-max -> nearest resize) straight from a raw tile.
"""
import ctypes
import os
import subprocess

import numpy as np

from deeptreeattention_tpu.geo.affine import Affine
from deeptreeattention_tpu.utils.logging import get_logger

log = get_logger(__name__)

_LIB = None
_TRIED = False

_DTYPES = {
    0: np.uint8, 1: np.int16, 2: np.uint16, 3: np.int32,
    4: np.uint32, 5: np.float32, 6: np.float64, 7: np.int8,
}


def _native_dir():
    return os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")


def _load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so_path = os.path.join(_native_dir(), "libdta_native.so")
    cc_path = os.path.join(_native_dir(), "geotiff.cc")
    stale = (
        os.path.exists(so_path)
        and os.path.exists(cc_path)
        and os.path.getmtime(so_path) < os.path.getmtime(cc_path)
    )
    if not os.path.exists(so_path) or stale:
        try:
            subprocess.run(
                ["bash", os.path.join(_native_dir(), "build.sh")],
                check=True, capture_output=True, timeout=120,
            )
        except Exception as e:
            log.warning("native geotiff build failed (%s); using numpy codec", e)
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError as e:
        log.warning("cannot load %s (%s); using numpy codec", so_path, e)
        return None

    lib.dta_tiff_open.restype = ctypes.c_void_p
    lib.dta_tiff_open.argtypes = [ctypes.c_char_p]
    lib.dta_tiff_info.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ]
    lib.dta_tiff_read_window.restype = ctypes.c_int
    lib.dta_tiff_read_window.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_void_p,
    ]
    lib.dta_tiff_read_patches.restype = ctypes.c_int
    lib.dta_tiff_read_patches.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.dta_tiff_close.argtypes = [ctypes.c_void_p]
    try:
        lib.dta_deflate_segments.restype = ctypes.c_int
        lib.dta_deflate_segments.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
    except AttributeError:  # older .so built before the writer API
        pass
    try:
        lib.dta_inflate_segments.restype = ctypes.c_int
        lib.dta_inflate_segments.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
    except AttributeError:  # older .so built before the inflate API
        pass
    _LIB = lib
    return _LIB


def available():
    return _load() is not None


def _pack_segments(segments):
    """(concatenated bytes, offsets[int64], sizes[int64]) for the C ABI."""
    sizes = np.asarray([len(s) for s in segments], np.int64)
    offsets = np.zeros(len(segments), np.int64)
    np.cumsum(sizes[:-1], out=offsets[1:])
    return b"".join(segments), offsets, sizes


def deflate_segments(segments, level=6, workers=None):
    """Deflate-compress a list of bytes in parallel C++ threads.

    Returns a list of compressed bytes (zlib-stream format, identical
    container to zlib.compress). None when the native library (or its
    writer API) is unavailable — callers fall back to zlib.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "dta_deflate_segments"):
        return None
    if not segments:
        return []
    if workers is None:
        workers = min(len(segments), os.cpu_count() or 1)
    data, offsets, sizes = _pack_segments(segments)
    # zlib compressBound ~ n + n/1000 + 64; use a safe stride
    stride = int(sizes.max() + sizes.max() // 512 + 128)
    out = np.empty(len(segments) * stride, np.uint8)
    out_sizes = np.zeros(len(segments), np.int64)
    failures = lib.dta_deflate_segments(
        data,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(segments), int(level), int(workers),
        out.ctypes.data_as(ctypes.c_void_p), stride,
        out_sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if failures:
        return None
    return [
        out[i * stride : i * stride + int(out_sizes[i])].tobytes()
        for i in range(len(segments))
    ]


def inflate_segments(segments, out_size, workers=None):
    """Inflate a list of zlib-stream bytes in parallel C++ threads.

    ``out_size`` is the decompressed size of every segment (HDF5 chunks all
    decompress to full-chunk nbytes; shorter actual outputs are truncated to
    the size the stream produced). Returns a list of bytes, or None when the
    native library (or its inflate API) is unavailable — callers fall back
    to zlib.decompress.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "dta_inflate_segments"):
        return None
    if not segments:
        return []
    if workers is None:
        workers = min(len(segments), os.cpu_count() or 1)
    data, offsets, sizes = _pack_segments(segments)
    stride = int(out_size)
    out = np.empty(len(segments) * stride, np.uint8)
    out_sizes = np.zeros(len(segments), np.int64)
    failures = lib.dta_inflate_segments(
        data,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(segments), int(workers),
        out.ctypes.data_as(ctypes.c_void_p), stride,
        out_sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if failures:
        return None
    return [
        out[i * stride : i * stride + int(out_sizes[i])].tobytes()
        for i in range(len(segments))
    ]


class NativeRaster:
    """Native-decode raster with the same surface raster.Raster exposes."""

    def __init__(self, path):
        lib = _load()
        if lib is None:
            raise RuntimeError("native geotiff library unavailable")
        self._lib = lib
        self._h = lib.dta_tiff_open(path.encode())
        if not self._h:
            raise ValueError("{} is not a readable TIFF".format(path))
        self.path = path
        info = (ctypes.c_int64 * 6)()
        tf = (ctypes.c_double * 6)()
        nd = ctypes.c_double()
        lib.dta_tiff_info(self._h, info, tf, ctypes.byref(nd))
        self.width, self.height, self.count = int(info[0]), int(info[1]), int(info[2])
        self.dtype = np.dtype(_DTYPES[int(info[3])])
        self.crs = int(info[4]) or None
        self.nodata = float(nd.value) if info[5] else None
        self.transform = Affine(tf[0], tf[1], tf[2], tf[3], tf[4], tf[5])
        # abs: the numpy codec reports positive resolutions; the
        # identity default transform has e=+1
        self.res = (self.transform.a, abs(self.transform.e))

    @property
    def bounds(self):
        west = self.transform.c
        north = self.transform.f
        return (west, north + self.height * self.transform.e,
                west + self.width * self.transform.a, north)

    def _read_clamped(self, r0, c0, r1, c1):
        h, w = r1 - r0, c1 - c0
        out = np.empty((self.count, h, w), self.dtype)
        rc = self._lib.dta_tiff_read_window(self._h, r0, c0, h, w, out.ctypes.data)
        if rc != 0:
            raise IOError("native window read failed for {}".format(self.path))
        return out

    def read(self, window=None, boundless=False, fill_value=0, indexes=None):
        # the shared rasterio-parity window semantics (tiff.windowed_read) —
        # keeps clamp/boundless/scalar-indexes behavior identical across the
        # numpy and native backends
        from deeptreeattention_tpu.geo.tiff import windowed_read

        return windowed_read(
            self.count, self.height, self.width, self.dtype,
            self._read_clamped, window,
            boundless=boundless, fill_value=fill_value, indexes=indexes,
        )

    def read_patches(self, rowcols, win=11, clip=10, size=11):
        """[N, size, size, clipped_bands] float32 model-ready patches for N
        (row, col) window anchors — the multithreaded hot path."""
        rowcols = np.ascontiguousarray(np.asarray(rowcols, np.int64))
        n = len(rowcols)
        nb = self.count - 2 * clip if self.count > 3 else self.count
        out = np.empty((n, size, size, nb), np.float32)
        rc = self._lib.dta_tiff_read_patches(
            self._h,
            rowcols.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, win, win, clip, size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise IOError("native patch read failed for {}".format(self.path))
        return out

    def close(self):
        if self._h:
            self._lib.dta_tiff_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
