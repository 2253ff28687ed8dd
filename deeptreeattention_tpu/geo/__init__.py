"""In-house geospatial engine (replaces GDAL/GEOS/rasterio/geopandas).

The reference leans on rasterio (GDAL) for raster IO, geopandas/shapely
(GEOS) for vector data, and rasterstats for zonal statistics. None of that is
a TPU concern — it is plain host-side IO and 2D geometry — so this package
implements the needed surface directly:

  geometry   Point / Box / Polygon with bounds, centroid, area, predicates
  affine     raster georeferencing transforms + pixel windows
  tiff       GeoTIFF codec (numpy; optional C++ fast path in native/)
  raster     rasterio-like open/read(window)/write API
  shapefile  ESRI .shp/.shx/.dbf/.prj codec
  vector     GeoDataFrame (pandas subclass) + sjoin/clip/to_crs
  crs        WGS84 transverse Mercator (UTM zone <-> lat/lon <-> zone)
  zonal      zonal statistics over rasters
"""
from deeptreeattention_tpu.geo.geometry import Point, Box, Polygon, box, from_wkt
from deeptreeattention_tpu.geo.affine import Affine, Window, from_origin, window_from_bounds
