"""Geo codec robustness: malformed inputs give clear errors, not crashes."""
import struct

import numpy as np
import pytest

from deeptreeattention_tpu.geo import affine, raster, shapefile, tiff, vector


def test_bigtiff_rejected(tmp_path):
    path = str(tmp_path / "big.tif")
    with open(path, "wb") as f:
        f.write(b"II" + struct.pack("<HI", 43, 8))  # BigTIFF magic 43
    with pytest.raises(ValueError, match="magic"):
        tiff.TiffReader(path)


def test_truncated_tiff(tmp_path):
    path = str(tmp_path / "trunc.tif")
    arr = np.arange(100, dtype=np.uint8).reshape(1, 10, 10)
    raster.write_raster(path, arr)
    data = open(path, "rb").read()
    with open(path, "wb") as f:
        f.write(data[: len(data) // 2])
    # header parses, the pixel read hits EOF -> short/garbled data but no hang
    try:
        with raster.Raster(path, backend="py") as src:
            src.read()
    except Exception:
        pass  # any clean exception is acceptable


def test_zero_size_window(tmp_path):
    path = str(tmp_path / "z.tif")
    raster.write_raster(path, np.ones((1, 4, 4), np.uint8))
    with raster.open_raster(path) as src:
        out = src.read(window=affine.Window(2, 2, 0, 0))
        assert out.size == 0


def test_shapefile_empty_and_null_geometry(tmp_path):
    path = str(tmp_path / "mix.shp")
    from deeptreeattention_tpu.geo.geometry import Point

    shapefile.write_shapefile(path, [Point(1, 2), None], [{"a": 1}, {"a": 2}], epsg=32617)
    geoms, recs, epsg = shapefile.read_shapefile(path)
    assert geoms[0] is not None
    assert geoms[1] is None
    assert [r["a"] for r in recs] == [1, 2]


def test_dbf_long_strings_truncate(tmp_path):
    from deeptreeattention_tpu.geo.geometry import Point

    path = str(tmp_path / "t.shp")
    long = "x" * 300
    shapefile.write_shapefile(path, [Point(0, 0)], [{"name": long}])
    _, recs, _ = shapefile.read_shapefile(path)
    assert recs[0]["name"] == "x" * 254  # DBF char field cap


def test_sjoin_empty_layers():
    import pandas as pd

    empty = vector.GeoDataFrame(pd.DataFrame({"a": []}), geometry=[], crs=32617)
    out = vector.sjoin(empty, empty)
    assert len(out) == 0
