"""NEON reflectance .h5 -> GeoTIFF conversion.

Capability parity with reference src/Hyperspectral.py:6-219: read the NEON
AOP reflectance product (h5py), drop the water-absorption bands
(426 -> 369: indices 419:425, 283:315, 192:210), clip to an RGB tile's
extent, and write a georeferenced tif with our codec. Band selection is a
single fancy-index (no per-band Python loop), and the output is tiled so the
downstream 11x11 window reads stay cheap.
"""
import os

import numpy as np

from deeptreeattention_tpu.geo import raster
from deeptreeattention_tpu.geo.affine import from_origin

# indices removed from the 426-band product: the final detector-edge band
# plus the water-absorption windows (426 -> 369, reference
# src/Hyperspectral.py:169-174 keeps bands 0:425 then deletes the windows)
WATER_ABSORPTION_WINDOWS = [(419, 426), (283, 315), (192, 210)]


def no_water_band_indexes(total=426):
    keep = np.ones(total, bool)
    for lo, hi in WATER_ABSORPTION_WINDOWS:
        keep[lo:hi] = False
    return np.where(keep)[0]


def h5refl2array(refl_filename):
    """Read reflectance cube + metadata from a NEON AOP h5 file.

    Goes through the in-house HDF5 codec (geo/hdf5.py) with h5py as the
    fallback for format features the codec doesn't cover."""
    from deeptreeattention_tpu.geo import hdf5

    return hdf5.read_with_fallback(refl_filename, _h5refl2array)


def _h5refl2array(f):
    sitename = list(f.keys())[0]
    refl_group = f[sitename]["Reflectance"]
    data = refl_group["Reflectance_Data"]
    arr = data[:]
    meta = {
        "noDataVal": float(data.attrs["Data_Ignore_Value"]),
        "scaleFactor": float(data.attrs["Scale_Factor"]),
        "shape": arr.shape,
        "wavelength": refl_group["Metadata"]["Spectral_Data"]["Wavelength"][()],
    }
    epsg = refl_group["Metadata"]["Coordinate_System"]["EPSG Code"][()]
    meta["epsg"] = int(str(epsg).strip("b'\""))
    map_info = str(refl_group["Metadata"]["Coordinate_System"]["Map_Info"][()])
    parts = map_info.split(",")
    meta["res"] = {"pixelWidth": float(parts[5]), "pixelHeight": float(parts[6])}
    x_min = float(parts[3])
    y_max = float(parts[4])
    meta["ext_dict"] = {
        "xMin": x_min,
        "xMax": x_min + arr.shape[1] * meta["res"]["pixelWidth"],
        "yMin": y_max - arr.shape[0] * meta["res"]["pixelHeight"],
        "yMax": y_max,
    }
    meta["extent"] = (
        meta["ext_dict"]["xMin"], meta["ext_dict"]["xMax"],
        meta["ext_dict"]["yMin"], meta["ext_dict"]["yMax"],
    )
    return meta, arr


class H5Raster:
    """Raster surface directly over a NEON AOP reflectance .h5.

    The reference always converts .h5 -> GeoTIFF before any window read
    (src/Hyperspectral.py:152-219, src/neon_paths.py:72-97). With the
    in-house HDF5 codec (geo/hdf5.py) reads are lazy chunked hyperslabs,
    so an 11x11 crown window touches only the few chunks that intersect it
    — no 1 GB tile conversion, no intermediate file. Water-absorption bands
    are dropped at read time, matching generate_raster's default output, so
    downstream consumers see the identical 369-band cube either way.

    Exposes the same surface as geo.raster.Raster; geo.raster.open_raster
    dispatches here for ``*.h5`` paths.
    """

    def __init__(self, path, bands="no_water"):
        from deeptreeattention_tpu.geo import hdf5
        from deeptreeattention_tpu.geo.affine import (
            Window, window_from_bounds, window_transform,
        )

        self._Window = Window
        self._window_from_bounds = window_from_bounds
        self._window_transform = window_transform
        self.path = path
        try:
            self._f = hdf5.File(path)
            self._init_from(self._f, bands)
        except (NotImplementedError, AssertionError):
            # Format feature the in-house codec doesn't cover (e.g. a
            # shared/unsupported attribute on the dataset): same fallback
            # policy as hdf5.read_with_fallback — reopen through h5py,
            # whose API surface is a superset of what we use here.
            self._fallback_to_h5py()
            self._init_from(self._f, bands)

    def _fallback_to_h5py(self):
        import h5py

        try:
            self._f.close()
        except Exception:
            pass
        self._f = h5py.File(self.path, "r")

    def _init_from(self, f, bands):
        site = list(f.keys())[0]
        g = f[site]["Reflectance"]
        self._data = g["Reflectance_Data"]
        cs = g["Metadata"]["Coordinate_System"]
        self.crs = int(str(cs["EPSG Code"][()]).strip("b'\""))
        parts = str(cs["Map_Info"][()]).split(",")
        x_min, y_max = float(parts[3]), float(parts[4])
        xres, yres = float(parts[5]), float(parts[6])
        self.transform = from_origin(x_min, y_max, xres, yres)
        try:
            self.nodata = float(self._data.attrs["Data_Ignore_Value"])
        except KeyError:
            self.nodata = None
        self.height, self.width, total = self._data.shape
        if bands == "no_water":
            self._band_idx = no_water_band_indexes(total)
        elif bands == "false_color":
            self._band_idx = np.array([16, 54, 112])
        elif bands == "all":
            self._band_idx = np.arange(total)
        else:
            raise ValueError("no band combination specified")
        self.count = len(self._band_idx)
        self.dtype = self._data.dtype

    @property
    def res(self):
        return (self.transform.a, -self.transform.e)

    @property
    def bounds(self):
        t = self.transform
        return (t.c, t.f + t.e * self.height, t.c + t.a * self.width, t.f)

    @property
    def dtypes(self):
        return [np.dtype(self.dtype).name] * self.count

    def _read_clamped(self, r0, c0, r1, c1):
        try:
            cube = self._data[r0:r1, c0:c1]  # lazy: intersecting chunks only
        except (NotImplementedError, AssertionError):
            # Unsupported chunk filter hit mid-read: switch this raster to
            # h5py and retry the same window.
            self._fallback_to_h5py()
            site = list(self._f.keys())[0]
            self._data = self._f[site]["Reflectance"]["Reflectance_Data"]
            cube = self._data[r0:r1, c0:c1]
        return np.ascontiguousarray(np.moveaxis(cube[:, :, self._band_idx], -1, 0))

    def read(self, indexes=None, window=None, boundless=False, fill_value=0):
        from deeptreeattention_tpu.geo.tiff import windowed_read

        return windowed_read(
            self.count, self.height, self.width, self.dtype,
            self._read_clamped, window,
            boundless=boundless, fill_value=fill_value, indexes=indexes,
        )

    def read_bounds(self, left, bottom, right, top, boundless=False):
        win = self._window_from_bounds(left, bottom, right, top, self.transform)
        return self.read(window=win, boundless=boundless)

    def window(self, left, bottom, right, top):
        return self._window_from_bounds(left, bottom, right, top, self.transform)

    def window_transform(self, window):
        return self._window_transform(window.round(), self.transform)

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def generate_raster(h5_path, save_dir, rgb_filename=None, bands="no_water",
                    bounds=None, suffix=None):
    """Convert one h5 reflectance tile to a (optionally clipped) GeoTIFF.

    Returns the written tif basename."""
    suffix = "_{}".format(suffix) if suffix else ""
    meta, refl = h5refl2array(h5_path)

    if bands == "no_water":
        band_idx = no_water_band_indexes(refl.shape[2])
    elif bands == "false_color":
        band_idx = np.array([16, 54, 112])
    elif bands == "all":
        band_idx = np.arange(refl.shape[2])
    else:
        raise ValueError("no band combination specified")

    ext = meta["ext_dict"]
    if bounds:
        clip = {
            "xMin": bounds.left, "xMax": bounds.right,
            "yMin": bounds.bottom, "yMax": bounds.top,
        }
    else:
        clip = dict(ext)

    xs = meta["res"]["pixelWidth"]
    ys = meta["res"]["pixelHeight"]
    c0 = int(round((clip["xMin"] - ext["xMin"]) / xs))
    c1 = int(round((clip["xMax"] - ext["xMin"]) / xs))
    r0 = int(round((ext["yMax"] - clip["yMax"]) / ys))
    r1 = int(round((ext["yMax"] - clip["yMin"]) / ys))
    r0, c0 = max(r0, 0), max(c0, 0)

    sub = refl[r0:r1, c0:c1][:, :, band_idx]  # [H, W, B]
    arr = np.ascontiguousarray(np.moveaxis(sub, -1, 0)).astype(np.int16)

    kind = "false_color" if bands == "false_color" else "hyperspectral"
    stem = os.path.splitext(os.path.basename(rgb_filename or h5_path))[0]
    tilename = "{}_{}{}.tif".format(stem, kind, suffix)

    transform = from_origin(
        ext["xMin"] + c0 * xs, ext["yMax"] - r0 * ys, xs, ys
    )
    raster.write_raster(
        os.path.join(save_dir, tilename), arr, transform=transform,
        crs=meta["epsg"], tiled=True, tile_size=128,
        nodata=meta["noDataVal"],
    )
    return tilename
