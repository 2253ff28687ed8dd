"""Zonal statistics over rasters (rasterstats replacement).

The CHM filter extracts a non-zero 99th-percentile height per crown geometry
(reference src/CHM.py:9-29 via rasterstats.zonal_stats); this module computes
arbitrary add_stats callables over the pixels covered by each geometry.
"""
import numpy as np

from deeptreeattention_tpu.geo.affine import window_from_bounds
from deeptreeattention_tpu.geo.geometry import Point, Polygon
from deeptreeattention_tpu.geo.raster import open_raster


def zonal_stats(geometries, raster_path, stats=("mean",), add_stats=None, nodata=None):
    """Per-geometry stats dicts over band 1 of the raster.

    `geometries` may be a sequence of geometry objects or anything with a
    `.geometry` column (GeoDataFrame/GeoSeries) — rasterstats accepts both."""
    geometries = getattr(geometries, "geometry", geometries)
    add_stats = add_stats or {}
    results = []
    with open_raster(raster_path) as src:
        nd = nodata if nodata is not None else src.nodata
        for geom in geometries:
            vals = _pixels_for(geom, src)
            if nd is not None and vals.size:
                if isinstance(nd, float) and nd != nd:  # NaN nodata
                    vals = vals[~np.isnan(vals)]
                else:
                    vals = vals[vals != nd]
            rec = {}
            for s in stats:
                rec[s] = _builtin_stat(s, vals)
            for name, fn in add_stats.items():
                rec[name] = fn(vals) if vals.size else None
            results.append(rec)
    return results


def _pixels_for(geom, src):
    if geom is None:
        return np.array([])
    if isinstance(geom, Point):
        # single containing pixel
        row, col = src.transform.rowcol(geom.x, geom.y)
        if 0 <= row < src.height and 0 <= col < src.width:
            from deeptreeattention_tpu.geo.affine import Window

            v = src.read(window=Window(col, row, 1, 1))
            return v.reshape(-1).astype(np.float64)
        return np.array([])
    left, bottom, right, top = geom.bounds
    win = window_from_bounds(left, bottom, right, top, src.transform).round()
    if win.width <= 0:
        win.width = 1
    if win.height <= 0:
        win.height = 1
    # clamp to the raster BEFORE masking: a non-boundless read of an
    # edge-crossing window returns the clamped array, and the polygon mask
    # must be built at that same (clamped) size
    from deeptreeattention_tpu.geo.affine import Window

    c0, r0 = max(win.col_off, 0), max(win.row_off, 0)
    c1 = min(win.col_off + win.width, src.width)
    r1 = min(win.row_off + win.height, src.height)
    if c1 <= c0 or r1 <= r0:
        return np.array([])
    win = Window(c0, r0, c1 - c0, r1 - r0)
    arr = src.read(window=win)
    if arr.size == 0:
        return np.array([])
    band = arr[0].astype(np.float64)
    if isinstance(geom, Polygon):
        mask = _polygon_mask(geom, src, win)
        band = band[mask]
    return band.reshape(-1)


def _polygon_mask(geom, src, win):
    """Vectorized even-odd ray cast over pixel centers (a per-pixel Python
    loop with Point objects is minutes of host time at landscape scale)."""
    h, w = win.height, win.width
    t = src.transform
    rows = win.row_off + np.arange(h) + 0.5
    cols = win.col_off + np.arange(w) + 0.5
    px = t.a * cols[None, :] + t.b * rows[:, None] + t.c  # [h, w]
    py = t.d * cols[None, :] + t.e * rows[:, None] + t.f
    ring = np.asarray(geom.ring, float)
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    pxf = px.ravel()[:, None]
    pyf = py.ravel()[:, None]
    crosses = (y0[None, :] <= pyf) != (y1[None, :] <= pyf)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0[None, :] + (pyf - y0[None, :]) * (x1 - x0)[None, :] / (y1 - y0)[None, :]
    inside = np.sum(crosses & (pxf < xint), axis=1) % 2 == 1
    mask = inside.reshape(h, w)
    if not mask.any():
        mask[:] = True  # fall back to the bbox (tiny geometries)
    return mask


def _builtin_stat(name, vals):
    if vals.size == 0:
        return None
    if name == "mean":
        return float(np.mean(vals))
    if name == "max":
        return float(np.max(vals))
    if name == "min":
        return float(np.min(vals))
    if name == "sum":
        return float(np.sum(vals))
    if name == "count":
        return int(vals.size)
    if name == "median":
        return float(np.median(vals))
    if name == "std":
        return float(np.std(vals))
    raise ValueError("unknown stat {}".format(name))
