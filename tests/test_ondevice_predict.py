"""On-device (crop-file-free) species prediction equals the file-based path
for integer-aligned crowns."""
import glob
import os

import numpy as np
import pandas as pd
import pytest

from deeptreeattention_tpu.geo import geometry, vector
from deeptreeattention_tpu.predict import tiles as predict_api


def test_ondevice_matches_file_path(m, config, fixtures_dir, tmp_path):
    hsi = sorted(glob.glob(os.path.join(fixtures_dir, "hsi", "*.tif")))
    tile_paths = {int(os.path.splitext(p)[0].split("_")[-1]): p for p in hsi}

    # integer-aligned crown boxes inside the tile (726000..726200 E)
    crowns = vector.GeoDataFrame(
        pd.DataFrame({"individual": ["d1", "d2", "d3"]}),
        geometry=[
            geometry.box(726010, 4699010, 726014, 4699014),
            geometry.box(726050, 4699100, 726057, 4699105),
            geometry.box(726150, 4699150, 726153, 4699153),
        ],
        crs=32617,
    )
    crowns["RGB_tile"] = sorted(glob.glob(os.path.join(fixtures_dir, "rgb", "*.tif")))[0]

    # file-based reference result
    cfg = dict(config)
    cfg["prediction_crop_dir"] = str(tmp_path / "crops")
    os.makedirs(cfg["prediction_crop_dir"], exist_ok=True)
    crops_shp = predict_api.generate_prediction_crops(crowns, cfg, as_numpy=True)
    file_df = predict_api.predict_species(
        crowns=vector.read_file(crops_shp), m=m, config=cfg
    )
    file_df = file_df.groupby("individual", sort=False, group_keys=False).head(1)

    # on-device result (years keyed like m.years: ints from the artifact csv)
    dev_df = predict_api.predict_species_ondevice(crowns, tile_paths, m, config)

    merged = file_df.merge(dev_df, on="individual", suffixes=("_file", "_dev"))
    assert len(merged) == 3
    for level in range(5):
        a = merged["top1_score_level_{}_file".format(level)].values
        b = merged["top1_score_level_{}_dev".format(level)].values
        np.testing.assert_allclose(a, b, atol=1e-4)
        assert (
            merged["pred_label_top1_level_{}_file".format(level)].values
            == merged["pred_label_top1_level_{}_dev".format(level)].values
        ).all()
    assert (merged.ensembleTaxonID_file == merged.ensembleTaxonID_dev).all()


def test_ondevice_matches_file_path_fractional_bounds(m, config, fixtures_dir, tmp_path):
    """Detector crowns from 0.1 m RGB have fractional UTM bounds relative to
    the 1 m HSI grid; both paths must round windows identically
    (Window.round semantics)."""
    hsi = sorted(glob.glob(os.path.join(fixtures_dir, "hsi", "*.tif")))
    tile_paths = {int(os.path.splitext(p)[0].split("_")[-1]): p for p in hsi}

    crowns = vector.GeoDataFrame(
        pd.DataFrame({"individual": ["f1", "f2", "f3"]}),
        geometry=[
            geometry.box(726010.2, 4699010.2, 726012.8, 4699012.8),
            geometry.box(726050.7, 4699100.1, 726057.6, 4699105.5),
            geometry.box(726150.5, 4699150.5, 726154.4, 4699154.9),
        ],
        crs=32617,
    )
    crowns["RGB_tile"] = sorted(glob.glob(os.path.join(fixtures_dir, "rgb", "*.tif")))[0]

    cfg = dict(config)
    cfg["prediction_crop_dir"] = str(tmp_path / "crops")
    os.makedirs(cfg["prediction_crop_dir"], exist_ok=True)
    crops_shp = predict_api.generate_prediction_crops(crowns, cfg, as_numpy=True)
    file_df = predict_api.predict_species(
        crowns=vector.read_file(crops_shp), m=m, config=cfg
    )
    file_df = file_df.groupby("individual", sort=False, group_keys=False).head(1)
    dev_df = predict_api.predict_species_ondevice(crowns, tile_paths, m, config)

    merged = file_df.merge(dev_df, on="individual", suffixes=("_file", "_dev"))
    assert len(merged) == 3
    for level in range(5):
        np.testing.assert_allclose(
            merged["top1_score_level_{}_file".format(level)].values,
            merged["top1_score_level_{}_dev".format(level)].values,
            atol=1e-4,
        )
    assert (merged.ensembleTaxonID_file == merged.ensembleTaxonID_dev).all()
