"""Geo engine tests: GeoTIFF codec, shapefile codec, CRS, vector ops, zonal."""
import numpy as np
import pandas as pd
import pytest

from deeptreeattention_tpu.geo import affine, crs, geometry, raster, shapefile, vector, zonal


# -- affine -------------------------------------------------------------------

def test_affine_roundtrip():
    t = affine.from_origin(726000.0, 4699000.0, 1.0, 1.0)
    x, y = t.xy(10, 20)
    assert (x, y) == (726020.5, 4698989.5)
    assert t.rowcol(x, y) == (10, 20)


def test_window_from_bounds():
    t = affine.from_origin(100.0, 200.0, 2.0, 2.0)
    w = affine.window_from_bounds(104.0, 190.0, 110.0, 196.0, t).round()
    assert (w.col_off, w.row_off, w.width, w.height) == (2, 2, 3, 3)


# -- tiff ---------------------------------------------------------------------

@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.uint16, np.float32])
@pytest.mark.parametrize("compress", [None, "deflate"])
def test_tiff_roundtrip(tmp_path, dtype, compress):
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 250, size=(5, 17, 23)).astype(dtype)
    t = affine.from_origin(726000.0, 4699000.0, 1.0, 1.0)
    path = str(tmp_path / "x.tif")
    raster.write_raster(path, arr, transform=t, crs=32617, compress=compress)
    with raster.open_raster(path) as src:
        assert src.count == 5 and (src.height, src.width) == (17, 23)
        assert src.crs == 32617
        assert src.transform == t
        np.testing.assert_array_equal(src.read(), arr)


def test_tiff_tiled_windowed_read(tmp_path):
    rng = np.random.RandomState(1)
    arr = rng.randint(0, 10000, size=(4, 600, 700)).astype(np.int16)
    t = affine.from_origin(0.0, 600.0, 1.0, 1.0)
    path = str(tmp_path / "big.tif")
    raster.write_raster(path, arr, transform=t, crs=32617, tiled=True, tile_size=256)
    with raster.open_raster(path) as src:
        win = affine.Window(250, 100, 30, 40)
        np.testing.assert_array_equal(src.read(window=win), arr[:, 100:140, 250:280])
        # bounds-based read
        got = src.read_bounds(250.0, 460.0, 280.0, 500.0)
        np.testing.assert_array_equal(got, arr[:, 100:140, 250:280])


def test_tiff_boundless_read(tmp_path):
    arr = np.arange(2 * 4 * 4, dtype=np.int16).reshape(2, 4, 4)
    path = str(tmp_path / "s.tif")
    raster.write_raster(path, arr)
    with raster.open_raster(path) as src:
        got = src.read(window=affine.Window(-2, -2, 5, 5), boundless=True)
        assert got.shape == (2, 5, 5)
        assert got[0, 0, 0] == 0
        np.testing.assert_array_equal(got[:, 2:, 2:], arr[:, :3, :3])
        # fully outside
        out = src.read(window=affine.Window(10, 10, 3, 3), boundless=True, fill_value=7)
        assert np.all(out == 7)


def test_tiff_2d_write(tmp_path):
    arr = np.ones((8, 9), np.float32) * 3.5
    path = str(tmp_path / "b.tif")
    raster.write_raster(path, arr, nodata=-9999)
    with raster.open_raster(path) as src:
        assert src.count == 1
        assert src.nodata == -9999
        np.testing.assert_array_equal(src.read()[0], arr)


# -- geometry -----------------------------------------------------------------

def test_box_ops():
    b = geometry.box(0, 0, 4, 2)
    assert b.area == 8
    assert b.centroid.x == 2 and b.centroid.y == 1
    assert b.contains(geometry.Point(1, 1))
    assert not b.contains(geometry.Point(5, 1))
    assert b.intersects(geometry.box(3, 1, 6, 6))
    assert not b.intersects(geometry.box(5, 5, 6, 6))
    assert b.buffer(1).bounds == (-1, -1, 5, 3)


def test_polygon_ops():
    p = geometry.Polygon([(0, 0), (4, 0), (4, 4), (0, 4)])
    assert p.area == 16
    assert p.contains(geometry.Point(2, 2))
    assert not p.contains(geometry.Point(5, 2))
    c = p.centroid
    assert abs(c.x - 2) < 1e-9 and abs(c.y - 2) < 1e-9


def test_wkt_roundtrip():
    p = geometry.Point(1.5, 2.5)
    assert geometry.from_wkt(p.wkt) == p
    b = geometry.box(0, 1, 2, 3)
    g = geometry.from_wkt(b.wkt)
    assert isinstance(g, geometry.Box) and g.bounds == b.bounds


# -- crs ----------------------------------------------------------------------

def test_utm_roundtrip():
    # OSBS-ish coordinates, zone 17N
    e, n = 405000.0, 3286000.0
    lon, lat = crs.utm_to_geographic(e, n, 17, True)
    e2, n2 = crs.geographic_to_utm(lon, lat, 17, True)
    assert abs(float(e2) - e) < 1e-3 and abs(float(n2) - n) < 1e-3


def test_utm_zone_shift():
    # BLAN fix: 18N -> 17N (reference src/data.py:89-98)
    e, n = 230000.0, 4330000.0  # in zone 18N
    x17, y17 = crs.transform_xy(e, n, 32618, 32617)
    # transforming back recovers the original
    e2, n2 = crs.transform_xy(x17, y17, 32617, 32618)
    assert abs(float(e2) - e) < 1e-2 and abs(float(n2) - n) < 1e-2
    # and the point must land east of zone 17's central meridian area
    assert float(x17) > 500000


def test_prj_wkt_roundtrip():
    wkt = crs.wkt_for_epsg(32617)
    assert crs.epsg_from_wkt(wkt) == 32617
    assert crs.epsg_from_wkt(crs.wkt_for_epsg(4326)) == 4326


# -- shapefile / vector --------------------------------------------------------

def test_shapefile_point_roundtrip(tmp_path):
    geoms = [geometry.Point(1, 2), geometry.Point(3.5, -4.5)]
    recs = [{"name": "a", "height": 10.5, "n": 3}, {"name": "b", "height": None, "n": 7}]
    path = str(tmp_path / "pts.shp")
    shapefile.write_shapefile(path, geoms, recs, epsg=32617)
    g2, r2, epsg = shapefile.read_shapefile(path)
    assert epsg == 32617
    assert [g.wkt for g in g2] == [g.wkt for g in geoms]
    assert r2[0]["name"] == "a" and r2[1]["name"] == "b"
    assert abs(r2[0]["height"] - 10.5) < 1e-9
    assert r2[1]["height"] is None
    assert r2[0]["n"] == 3


def test_shapefile_polygon_roundtrip(tmp_path):
    geoms = [geometry.box(0, 0, 2, 2), geometry.box(5, 5, 9, 7)]
    recs = [{"taxonID": "PIPA2"}, {"taxonID": "QULA2"}]
    path = str(tmp_path / "boxes.shp")
    shapefile.write_shapefile(path, geoms, recs, epsg=32617)
    g2, r2, _ = shapefile.read_shapefile(path)
    assert all(isinstance(g, geometry.Box) for g in g2)
    assert g2[0].bounds == (0, 0, 2, 2)
    assert r2[1]["taxonID"] == "QULA2"


def test_geodataframe_io_and_props(tmp_path):
    gdf = vector.GeoDataFrame(
        pd.DataFrame({"taxonID": ["A", "B"]}),
        geometry=[geometry.box(0, 0, 2, 2), geometry.box(1, 1, 5, 3)],
        crs=32617,
    )
    assert list(gdf.total_bounds) == [0, 0, 5, 3]
    assert list(gdf.area) == [4.0, 8.0]
    path = str(tmp_path / "gdf.shp")
    gdf.to_file(path)
    back = vector.read_file(path)
    assert back.crs == 32617
    assert list(back["taxonID"]) == ["A", "B"]
    assert back.geometry.iloc[1].bounds == (1, 1, 5, 3)


def test_sjoin_points_in_boxes():
    boxes = vector.GeoDataFrame(
        pd.DataFrame({"box_id": [0, 1]}),
        geometry=[geometry.box(0, 0, 2, 2), geometry.box(10, 10, 12, 12)],
    )
    pts = vector.GeoDataFrame(
        pd.DataFrame({"individual": ["i1", "i2", "i3"]}),
        geometry=[geometry.Point(1, 1), geometry.Point(11, 11), geometry.Point(50, 50)],
    )
    j = vector.sjoin(boxes, pts)
    assert len(j) == 2
    assert set(j["individual"]) == {"i1", "i2"}
    assert "index_right" in j.columns
    # left geometry preserved
    assert isinstance(j.geometry.iloc[0], geometry.Box)


def test_to_crs():
    gdf = vector.GeoDataFrame(
        pd.DataFrame({"a": [1]}), geometry=[geometry.Point(230000.0, 4330000.0)], crs=32618
    )
    out = gdf.to_crs(epsg=32617)
    assert out.crs == 32617
    assert out.geometry.iloc[0].x > 500000


def test_crs_accepts_geopandas_style_specs(tmp_path):
    """rasterio/geopandas users pass "EPSG:NNNN" strings and CRS objects;
    every user-facing crs= entry point normalizes to the int code."""
    assert crs.normalize_epsg("EPSG:32617") == 32617
    assert crs.normalize_epsg("epsg:4326") == 4326
    assert crs.normalize_epsg(" 32618 ") == 32618
    assert crs.normalize_epsg(None) is None

    class _FakeCRS:  # pyproj/rasterio CRS duck type
        def to_epsg(self):
            return 32617

    assert crs.normalize_epsg(_FakeCRS()) == 32617
    with pytest.raises(ValueError):
        crs.normalize_epsg("ESRI:102100")
    with pytest.raises(ValueError):
        crs.normalize_epsg("not-a-code")

    gdf = vector.GeoDataFrame(
        pd.DataFrame({"a": [1]}),
        geometry=[geometry.Point(230000.0, 4330000.0)],
        crs="EPSG:32618",
    )
    assert gdf.crs == 32618
    gdf.crs = "EPSG:32617"  # attribute assignment normalizes too
    assert gdf.crs == 32617
    out = gdf.set_crs(crs="EPSG:32618").to_crs(crs="EPSG:32617")
    assert out.crs == 32617
    assert out.geometry.iloc[0].x > 500000

    # raster writer takes the string spec as well
    arr = np.arange(16, dtype=np.int16).reshape(1, 4, 4)
    t = affine.from_origin(730000.0, 4713000.0, 1.0, 1.0)
    path = str(tmp_path / "s.tif")
    raster.write_raster(path, arr, transform=t, crs="EPSG:32617")
    src = raster.open_raster(path)
    assert src.crs == 32617


def test_crs_edge_cases():
    """Review regressions: float EPSG codes (pandas float columns) are
    accepted, argless set_crs/to_crs raise instead of silently clearing the
    CRS, and a source frame with a 'crs' COLUMN doesn't poison construction
    (pandas attribute-to-column fallback)."""
    assert crs.normalize_epsg(32617.0) == 32617
    assert crs.normalize_epsg(np.float64(4326)) == 4326
    with pytest.raises(ValueError):
        crs.normalize_epsg(32617.5)

    gdf = vector.GeoDataFrame(
        pd.DataFrame({"a": [1]}), geometry=[geometry.Point(1.0, 2.0)], crs=32618
    )
    assert gdf.to_crs(epsg=np.float64(32617)).crs == 32617
    with pytest.raises(ValueError):
        gdf.set_crs()
    with pytest.raises(ValueError):
        gdf.to_crs()
    assert gdf.crs == 32618  # unchanged by the failed calls

    # a 'crs' data COLUMN is data, not a CRS spec
    df = pd.DataFrame({"crs": ["x"], "a": [1]})
    g2 = vector.GeoDataFrame(df, geometry=[geometry.Point(0.0, 0.0)])
    assert g2.crs is None
    assert list(g2["crs"]) == ["x"]


# -- zonal ----------------------------------------------------------------------

def test_zonal_stats(tmp_path):
    chm = np.zeros((1, 20, 20), np.float32)
    chm[0, 5:10, 5:10] = 12.0
    t = affine.from_origin(0.0, 20.0, 1.0, 1.0)
    path = str(tmp_path / "chm.tif")
    raster.write_raster(path, chm, transform=t, crs=32617)

    def non_zero_99(x):
        x = x[x >= 0.5]
        if x.size == 0:
            return None
        return float(np.percentile(x, 99))

    # box covering the 12m block in world coords: rows 5:10 -> y 10..15
    geoms = [geometry.box(5, 10, 10, 15), geometry.box(0, 0, 3, 3)]
    out = zonal.zonal_stats(geoms, path, add_stats={"q99": non_zero_99})
    assert abs(out[0]["q99"] - 12.0) < 1e-6
    assert out[1]["q99"] is None


def test_box_normalizes_inverted_coordinates():
    """shapely.geometry.box parity: swapped min/max args still yield
    normalized .bounds (a polygon's bounds are coordinate min/max)."""
    from deeptreeattention_tpu.geo.geometry import box

    b = box(16.0, 80.0, 10.0, 74.0)
    assert b.bounds == (10.0, 74.0, 16.0, 80.0)
    assert b.area == 36.0


def test_shapefile_deleted_dbf_record_alignment(tmp_path):
    """A DBF record flagged deleted must drop its geometry too — skipping
    only the attribute row shifts every later attribute onto the wrong
    geometry."""
    import struct

    import pandas as pd

    from deeptreeattention_tpu.geo import vector
    from deeptreeattention_tpu.geo.geometry import Box

    gdf = vector.GeoDataFrame(
        pd.DataFrame({"individual": ["a", "b", "c"]}),
        geometry=[Box(0, 0, 1, 1), Box(10, 10, 11, 11), Box(20, 20, 21, 21)],
        crs=32617,
    )
    path = str(tmp_path / "del.shp")
    gdf.to_file(path)
    # flag record 1 ('b') as deleted in the .dbf
    dbf = str(tmp_path / "del.dbf")
    with open(dbf, "rb") as f:
        data = bytearray(f.read())
    hsize, rsize = struct.unpack("<HH", data[8:12])
    data[hsize + rsize] = 0x2A  # b'*'
    with open(dbf, "wb") as f:
        f.write(bytes(data))

    back = vector.read_file(path)
    assert list(back.individual) == ["a", "c"]
    assert back.geometry[0].bounds[0] == 0 and back.geometry[1].bounds[0] == 20


def test_karney_cross_zone_roundtrip_submm():
    """UTM->UTM reprojection across zones round-trips sub-mm (Karney n^6
    series; the round-3 Snyder series erred ~0.1 m two zones out)."""
    x0, y0 = 405002.0, 3285982.0
    lon, lat = crs.utm_to_geographic(x0, y0, 17)
    for other in (18, 19):
        xo, yo = crs.geographic_to_utm(lon, lat, other)
        lon2, lat2 = crs.utm_to_geographic(xo, yo, other)
        x1, y1 = crs.geographic_to_utm(lon2, lat2, 17)
        assert abs(float(x1) - x0) < 1e-3 and abs(float(y1) - y0) < 1e-3
    # southern-hemisphere round trip
    e, n = crs.geographic_to_utm(174.76333, -36.84833, 60, north=False)
    lon, lat = crs.utm_to_geographic(e, n, 60, north=False)
    assert abs(float(lon) - 174.76333) < 1e-9
    assert abs(float(lat) + 36.84833) < 1e-9


def test_karney_antimeridian_wrap():
    """Zones adjacent to the antimeridian: lon 179.9 deg expressed in zone 1
    (cm -177 deg) must wrap dlam to ~-2.9 deg, not +357; and zone-60 output
    longitudes wrap back into [-180, 180)."""
    # a point just WEST of the antimeridian (lon ~179.9), in zone 1's frame
    e, n = crs.geographic_to_utm(179.9, -16.5, 1, north=False)
    lon, lat = crs.utm_to_geographic(e, n, 1, north=False)
    assert abs(float(lon) - 179.9) < 1e-9
    assert abs(float(lat) + 16.5) < 1e-9
    # a point just EAST of the antimeridian (lon -179.9), in zone 60's frame
    e, n = crs.geographic_to_utm(-179.9, -16.5, 60, north=False)
    lon, lat = crs.utm_to_geographic(e, n, 60, north=False)
    assert abs(float(lon) + 179.9) < 1e-9
    # cross-zone UTM->UTM straddling the antimeridian (zone 1 <-> 60)
    x0, y0 = 300000.0, 8170000.0
    lon, lat = crs.utm_to_geographic(x0, y0, 1, north=False)
    xo, yo = crs.geographic_to_utm(lon, lat, 60, north=False)
    lon2, lat2 = crs.utm_to_geographic(xo, yo, 60, north=False)
    x1, y1 = crs.geographic_to_utm(lon2, lat2, 1, north=False)
    assert abs(float(x1) - x0) < 1e-3 and abs(float(y1) - y0) < 1e-3
