"""Crown + crop generation tests (pattern: reference tests/test_generate.py,
with the deterministic detector instead of a DeepForest download, and the
local futures pool standing in for the dask cluster)."""
import glob
import os

import numpy as np
import pandas as pd
import pytest

from deeptreeattention_tpu.cluster import LocalClient
from deeptreeattention_tpu.data import crowns as crowns_mod
from deeptreeattention_tpu.data import crops as crops_mod
from deeptreeattention_tpu.data import detection
from deeptreeattention_tpu.geo import vector


@pytest.fixture(scope="module")
def field_points(fixtures_dir):
    gdf = vector.read_file(os.path.join(fixtures_dir, "artifact", "canopy_points.shp"))
    return gdf[gdf.plotID.isin(["HARV_000", "HARV_001"])].reset_index(drop=True)


def test_detector_finds_boxes(fixtures_dir):
    det = detection.load_detector()
    tile = sorted(glob.glob(os.path.join(fixtures_dir, "rgb", "*.tif")))[0]
    boxes = det.predict_tile(tile)
    assert boxes is not None and len(boxes) > 0
    assert {"xmin", "ymin", "xmax", "ymax", "score", "label"} <= set(boxes.columns)
    assert (boxes.xmax > boxes.xmin).all()


def test_points_to_crowns(field_points, config, tmp_path):
    result = crowns_mod.points_to_crowns(
        field_data=field_points,
        rgb_dir=config["rgb_sensor_pool"],
        savedir=str(tmp_path),
        raw_box_savedir=None,
    )
    assert len(result) > 0
    # every stem is matched at most once
    assert result.individual.is_unique
    assert {"individual", "taxonID", "box_id", "RGB_tile", "geometry"} <= set(result.columns)
    # fallback boxes appear for stems the detector missed
    written = glob.glob(os.path.join(str(tmp_path), "*_boxes.shp"))
    assert written


def test_generate_crops_serial_and_pool(field_points, config, tmp_path):
    boxes = crowns_mod.points_to_crowns(
        field_data=field_points, rgb_dir=config["rgb_sensor_pool"], savedir=None
    )
    serial_dir = str(tmp_path / "serial")
    ann = crops_mod.generate_crops(
        boxes, sensor_glob=config["HSI_sensor_pool"], savedir=serial_dir,
        rgb_glob=config["rgb_sensor_pool"], convert_h5=False,
    )
    assert len(ann) > 0
    assert ann.tile_year.nunique() == 3
    assert all(os.path.exists(os.path.join(serial_dir, p)) for p in ann.image_path)

    pool_dir = str(tmp_path / "pool")
    client = LocalClient(workers=4)
    ann2 = crops_mod.generate_crops(
        boxes, sensor_glob=config["HSI_sensor_pool"], savedir=pool_dir,
        rgb_glob=config["rgb_sensor_pool"], convert_h5=False, client=client,
    )
    client.close()
    # pool path produces the same crop set
    assert sorted(ann2.image_path) == sorted(ann.image_path)
    a = sorted(ann.image_path)[0]
    x1 = np.load if a.endswith(".npy") else None
    from deeptreeattention_tpu.geo import raster

    i1 = raster.open_raster(os.path.join(serial_dir, a)).read()
    i2 = raster.open_raster(os.path.join(pool_dir, a)).read()
    np.testing.assert_array_equal(i1, i2)
