"""Cross-codec compatibility: read the reference repo's real GDAL-written
GeoTIFFs and ESRI shapefiles through our in-house geo codecs and pin shapes,
dtypes, and georeferencing to known values.

These files were produced by GDAL/OGR (via rasterio/geopandas in the
reference's own test setup) — NOT by our writer — so they break the
otherwise closed write->read fixture loop. Skipped when /root/reference is
not present (e.g. on CI without the reference checkout).
"""
import glob
import os

import numpy as np
import pytest

from deeptreeattention_tpu.geo import raster, vector

REF = "/root/reference/tests/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


def test_reads_gdal_rgb_crop():
    """uint8 striped RGB GeoTIFF written by GDAL (reference fixture tile)."""
    path = os.path.join(REF, "2019_D01_HARV_DP3_726000_4699000_image_crop_2018.tif")
    with raster.open_raster(path) as src:
        arr = src.read()
        assert arr.shape == (3, 270, 100)
        assert arr.dtype == np.uint8
        assert src.crs == 32618
        t = src.transform
        assert (t.a, t.e) == (0.1, -0.1)
        assert (t.c, t.f) == (726499.0, 4699073.0)
        # content, not just header: pin the global mean
        np.testing.assert_allclose(arr.mean(), 123.653790, atol=1e-4)


def test_reads_gdal_hyperspectral_crop():
    """float32 369-band HSI GeoTIFF written by GDAL."""
    path = os.path.join(
        REF, "hsi", "2018_HARV_6_726000_4699000_image_crop_hyperspectral_2018.tif"
    )
    with raster.open_raster(path) as src:
        arr = src.read()
        assert arr.shape == (369, 27, 10)
        assert arr.dtype == np.float32
        t = src.transform
        assert (t.a, t.e, t.c, t.f) == (1.0, -1.0, 726499.0, 4699073.0)
        assert np.isfinite(arr).all()


def test_reads_gdal_artifact_crops():
    """The committed miniature data artifact's int16 per-crown crops."""
    crops = sorted(glob.glob(os.path.join(REF, "110ac77ae89043898f618466359c2a2e", "*.tif")))
    assert len(crops) == 53
    with raster.open_raster(crops[0]) as src:
        arr = src.read()
        assert arr.shape == (369, 5, 7)
        assert arr.dtype == np.int16


def test_reads_ogr_crown_shapefile():
    """OGR-written polygon shapefile with a DBF attribute table + PRJ."""
    g = vector.read_file(os.path.join(REF, "crown.shp"))
    assert len(g) == 2
    assert {"individual", "plotID", "taxonID", "siteID"} <= set(g.columns)
    assert g.crs == 32618
    np.testing.assert_allclose(
        g.total_bounds,
        [726499.44904611, 4699046.0865623, 726508.50509654, 4699072.70026151],
        atol=1e-6,
    )


def test_reads_ogr_point_shapefile_without_prj():
    """Point shapefile lacking a .prj — crs must come back None, not crash."""
    g = vector.read_file(os.path.join(REF, "sample.shp"))
    assert len(g) == 16
    assert {"individual", "siteID", "plotID", "height"} <= set(g.columns)
    assert g.crs is None
    assert all(gm.geom_type == "Point" for gm in g.geometry)


def test_reads_geometry_only_shapefile():
    """The artifact's crowns.shp has no .dbf sidecar at all — geometry-only
    read must work (3077 polygons)."""
    g = vector.read_file(
        os.path.join(REF, "110ac77ae89043898f618466359c2a2e", "crowns.shp")
    )
    assert len(g) == 3077
    assert "geometry" in g.columns


def test_window_read_matches_full_read():
    """read_bounds on the GDAL tile == slicing the full GDAL array."""
    path = os.path.join(REF, "2019_D01_HARV_DP3_726000_4699000_image_crop_2018.tif")
    with raster.open_raster(path) as src:
        full = src.read()
        t = src.transform
        # an 11x11-pixel UTM window 50 px down, 20 px right of the origin
        left = t.c + 20 * t.a
        top = t.f + 50 * t.e
        win = src.read_bounds(left, top + 11 * t.e, left + 11 * t.a, top)
    np.testing.assert_array_equal(win, full[:, 50:61, 20:31])
