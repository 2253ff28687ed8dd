"""GeoDataFrame: pandas subclass with a geometry column (geopandas-lite).

Provides the geopandas surface the pipeline uses — read_file/to_file,
sjoin, clip, to_crs, total_bounds, centroid/buffer/envelope/area — over the
in-house geometry and shapefile codec. Geometry is stored as an object-dtype
column of geo.geometry objects.
"""
import numpy as np
import pandas as pd

from deeptreeattention_tpu.geo import crs as crs_mod
from deeptreeattention_tpu.geo import shapefile as shp_io
from deeptreeattention_tpu.geo.geometry import (  # noqa: F401 (box/from_wkt re-exported
    Box, Geometry, Point, Polygon, box, from_wkt,  # for geopandas-style callers)
)


class GeoDataFrame(pd.DataFrame):
    _metadata = ["crs", "_geom_col"]

    def __init__(self, data=None, *args, geometry=None, crs=None, **kwargs):
        gcol = None
        if geometry is not None and not isinstance(geometry, str):
            # geometry passed as a sequence
            super().__init__(data, *args, **kwargs)
            self["geometry"] = list(geometry)
            gcol = "geometry"
        else:
            super().__init__(data, *args, **kwargs)
            gcol = geometry if isinstance(geometry, str) else None
        eff = crs
        if eff is None:
            src = getattr(data, "crs", None)
            # pandas resolves unknown attributes to columns: a source frame
            # with a 'crs' COLUMN yields a Series here, not a CRS spec
            if not isinstance(src, (pd.Series, pd.DataFrame)):
                eff = src
        object.__setattr__(self, "crs", crs_mod.normalize_epsg(eff))
        object.__setattr__(self, "_geom_col", gcol or getattr(data, "_geom_col", None) or "geometry")

    def __setattr__(self, name, value):
        # `gdf.crs = "EPSG:32617"` is idiomatic geopandas; keep the stored
        # value an int EPSG code so every consumer (shapefile writer,
        # reprojection) sees one representation
        if name == "crs":
            object.__setattr__(self, "crs", crs_mod.normalize_epsg(value))
            return
        super().__setattr__(name, value)

    @property
    def _constructor(self):
        return GeoDataFrame

    # -- geometry accessors ---------------------------------------------------
    @property
    def geometry(self):
        return self[self._geom_col]

    @geometry.setter
    def geometry(self, values):
        self[self._geom_col] = list(values) if not isinstance(values, pd.Series) else values

    @property
    def total_bounds(self):
        bs = [g.bounds for g in self.geometry if isinstance(g, Geometry)]
        if not bs:
            return np.array([np.nan] * 4)
        bs = np.asarray(bs)
        return np.array([bs[:, 0].min(), bs[:, 1].min(), bs[:, 2].max(), bs[:, 3].max()])

    @property
    def centroid(self):
        return self.geometry.apply(lambda g: g.centroid if isinstance(g, Geometry) else None)

    @property
    def envelope(self):
        return self.geometry.apply(lambda g: g.envelope if isinstance(g, Geometry) else None)

    @property
    def area(self):
        return self.geometry.apply(lambda g: g.area if isinstance(g, Geometry) else np.nan)

    @property
    def bounds(self):
        rows = [g.bounds if isinstance(g, Geometry) else (np.nan,) * 4 for g in self.geometry]
        return pd.DataFrame(rows, columns=["minx", "miny", "maxx", "maxy"], index=self.index)

    def buffer(self, dist):
        return self.geometry.apply(lambda g: g.buffer(dist) if isinstance(g, Geometry) else None)

    def distance(self, other):
        return self.geometry.apply(lambda g: g.distance(other) if isinstance(g, Geometry) else np.nan)

    # -- CRS -------------------------------------------------------------------
    def set_crs(self, epsg=None, crs=None, inplace=False, allow_override=True):
        if epsg is None and crs is None:
            # geopandas parity: silent CRS-clearing hides the bug downstream
            raise ValueError("set_crs: must pass either epsg or crs")
        target = crs_mod.normalize_epsg(epsg if epsg is not None else crs)
        if inplace:
            object.__setattr__(self, "crs", target)
            return self
        out = self.copy()
        object.__setattr__(out, "crs", target)
        return out

    def to_crs(self, epsg=None, crs=None, inplace=False):
        if epsg is None and crs is None:
            raise ValueError("to_crs: must pass either epsg or crs")
        target = crs_mod.normalize_epsg(epsg if epsg is not None else crs)
        if self.crs is None:
            raise ValueError("source CRS unset; call set_crs first")
        geoms = [_reproject_geom(g, self.crs, target) for g in self.geometry]
        if inplace:
            self[self._geom_col] = geoms
            object.__setattr__(self, "crs", target)
            return self
        out = self.copy()
        out[out._geom_col] = geoms
        object.__setattr__(out, "crs", target)
        return out

    # -- IO ----------------------------------------------------------------------
    def to_file(self, path, **kwargs):
        recs = []
        gcol = self._geom_col
        attr_cols = [c for c in self.columns if c != gcol]
        for _, row in self.iterrows():
            # full names: the DBF writer truncates to 10 chars AND dedupes
            # colliding prefixes (truncating here would collapse them)
            recs.append({str(c): _dbf_safe(row[c]) for c in attr_cols})
        shp_io.write_shapefile(path, list(self.geometry), recs, epsg=self.crs)
        return path


def read_file(path):
    geoms, records, epsg = shp_io.read_shapefile(path)
    df = pd.DataFrame.from_records(records) if records else pd.DataFrame(index=range(len(geoms)))
    gdf = GeoDataFrame(df, crs=epsg)
    gdf["geometry"] = geoms
    return gdf


def points_from_xy(xs, ys):
    return [Point(x, y) for x, y in zip(xs, ys)]


def sjoin(left, right, how="inner", predicate="intersects", lsuffix="left", rsuffix="right"):
    """Spatial inner join: pairs whose geometries intersect.

    Output: left rows (+geometry) joined with right attribute columns and
    ``index_right`` — the geopandas result shape the pipeline relies on
    (reference src/generate.py:112, src/megaplot.py:43).
    """
    lgeoms = list(left.geometry)
    rgeoms = list(right.geometry)
    rindex = list(right.index)
    # grid index over right bounds for sub-quadratic joins
    cell = _grid_cell(lgeoms + rgeoms)
    grid = {}
    for j, g in enumerate(rgeoms):
        if g is None:
            continue
        minx, miny, maxx, maxy = g.bounds
        for cx in range(int(minx // cell), int(maxx // cell) + 1):
            for cy in range(int(miny // cell), int(maxy // cell) + 1):
                grid.setdefault((cx, cy), []).append(j)

    pairs = []
    for i, g in enumerate(lgeoms):
        if g is None:
            continue
        minx, miny, maxx, maxy = g.bounds
        seen = set()
        for cx in range(int(minx // cell), int(maxx // cell) + 1):
            for cy in range(int(miny // cell), int(maxy // cell) + 1):
                for j in grid.get((cx, cy), ()):
                    if j in seen:
                        continue
                    seen.add(j)
                    if _intersects(g, rgeoms[j]):
                        pairs.append((i, j))

    lcols = list(left.columns)
    rcols = [c for c in right.columns if c != right._geom_col] if isinstance(right, GeoDataFrame) else list(right.columns)
    # vectorized row gathers: per-element .iloc lookups are O(pairs x cols)
    # Python-level work, minutes of host time at landscape pair counts
    li = [i for i, _ in pairs]
    rj = [j for _, j in pairs]
    ltaken = left.take(li).reset_index(drop=True) if len(lcols) else pd.DataFrame()
    rtaken = right.take(rj).reset_index(drop=True) if len(rcols) else pd.DataFrame()
    out_cols = {}
    for c in lcols:
        name = c if (c not in rcols or c == left._geom_col) else "{}_{}".format(c, lsuffix)
        out_cols[name] = list(ltaken[c])
    for c in rcols:
        name = c if c not in lcols else "{}_{}".format(c, rsuffix)
        out_cols[name] = list(rtaken[c])
    out_cols["index_right"] = [rindex[j] for j in rj]
    out = GeoDataFrame(pd.DataFrame(out_cols), crs=getattr(left, "crs", None))
    out.index = [left.index[i] for i in li]
    return out


def clip(gdf, boundary):
    """Rows of gdf whose geometry intersects the boundary layer."""
    if isinstance(boundary, GeoDataFrame):
        bgeoms = [g for g in boundary.geometry if g is not None]
    else:
        bgeoms = [boundary]
    keep = []
    for i, g in enumerate(gdf.geometry):
        keep.append(g is not None and any(_intersects(g, b) for b in bgeoms))
    return gdf[np.asarray(keep, bool)]


def _intersects(a, b):
    if not a.bbox_intersects(b):
        return False
    if isinstance(a, Point) and isinstance(b, (Polygon, Box)):
        return b.contains(a)
    if isinstance(b, Point) and isinstance(a, (Polygon, Box)):
        return a.contains(b)
    return True  # box/box and polygon bbox overlap approximation


def _grid_cell(geoms):
    """Pick a grid cell size bounded below by total-extent/1024 so degenerate
    geometries (points) can't explode the per-geometry cell ranges."""
    sizes = []
    minx = miny = np.inf
    maxx = maxy = -np.inf
    for g in geoms[:2048]:
        if g is None:
            continue
        b = g.bounds
        sizes.append(max(b[2] - b[0], b[3] - b[1]))
        minx, miny = min(minx, b[0]), min(miny, b[1])
        maxx, maxy = max(maxx, b[2]), max(maxy, b[3])
    if not sizes or not np.isfinite(minx):
        return 1.0
    extent = max(maxx - minx, maxy - miny, 1e-9)
    return float(max(np.median(sizes) * 4, extent / 1024.0, 1e-9))


def _reproject_geom(g, src, dst):
    if g is None:
        return None
    if isinstance(g, Point):
        x, y = crs_mod.transform_xy(g.x, g.y, src, dst)
        return Point(float(x), float(y))
    ring = getattr(g, "exterior_coords")
    xs, ys = zip(*ring)
    tx, ty = crs_mod.transform_xy(np.array(xs), np.array(ys), src, dst)
    return Polygon(list(zip(tx.tolist(), ty.tolist())))


def _dbf_safe(v):
    if isinstance(v, Geometry):
        return v.wkt
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    return v
