"""End-to-end tile prediction test (pattern: reference tests/test_predict.py):
train tiny MultiStage + tiny AliveDead -> find_crowns ->
generate_prediction_crops (geometry preserved, per-year crops) ->
predict_tile (schema + geometry equality)."""
import glob
import os

import numpy as np
import pytest

from deeptreeattention_tpu.geo import vector
from deeptreeattention_tpu.models import dead as dead_mod
from deeptreeattention_tpu.predict import tiles as predict_api


@pytest.fixture(scope="module")
def rgb_tile(fixtures_dir):
    return sorted(glob.glob(os.path.join(fixtures_dir, "rgb", "*.tif")))[0]


@pytest.fixture(scope="module")
def dead_model(config):
    model = dead_mod.AliveDead(config=config, depth=18)
    model.fit(fast_dev_run=True)
    return model


def test_find_crowns(rgb_tile, config, dead_model):
    crowns = predict_api.find_crowns(rgb_tile, config, dead_model=dead_model)
    assert crowns is not None and len(crowns) > 0
    assert {"individual", "dead_label", "dead_score", "RGB_tile", "CHM_height"} <= set(
        crowns.columns
    )
    assert crowns.dead_score.between(0, 1).all()
    # crowns georeferenced inside the tile
    minx, miny, maxx, maxy = crowns.total_bounds
    assert 726000 <= minx and maxx <= 727000
    assert 4699000 <= miny and maxy <= 4700000


def test_predict_tile_end_to_end(rgb_tile, config, dead_model, m, tmp_path_factory):
    out_root = str(tmp_path_factory.mktemp("predict"))
    cfg = dict(config)
    cfg["prediction_crop_dir"] = os.path.join(out_root, "crops")
    os.makedirs(cfg["prediction_crop_dir"], exist_ok=True)

    crowns = predict_api.find_crowns(rgb_tile, cfg, dead_model=dead_model)
    crops_shp = predict_api.generate_prediction_crops(crowns, cfg, as_numpy=True)
    assert os.path.exists(crops_shp)

    annotations = vector.read_file(crops_shp)
    # one row per (crown, year); geometry preserved through the sidecar
    assert annotations.tile_year.nunique() >= 2
    assert {"individual", "dead_label", "dead_score", "image_path"} <= set(annotations.columns)
    one = annotations.individual.iloc[0]
    orig = crowns[crowns.individual == one].geometry.iloc[0]
    back = annotations[annotations.individual == one].geometry.iloc[0]
    np.testing.assert_allclose(orig.bounds, back.bounds, atol=1e-6)

    trees = predict_api.predict_tile(
        crown_annotations=crops_shp, m=m, config=cfg,
        savedir=os.path.join(out_root, "results"), filter_dead=True,
    )
    assert trees is not None
    assert {"ensembleTaxonID", "ens_score", "crown_area"} <= set(trees.columns)
    # guard against the silent zero-image failure mode: scores must not all
    # be the uniform-softmax value at every level
    binary_uniform = 0.5
    assert not np.allclose(trees.top1_score_level_0, binary_uniform)
    written = glob.glob(os.path.join(out_root, "results", "*.shp"))
    assert len(written) == 1
    out = vector.read_file(written[0])
    assert len(out) == len(trees)
    valid = set(m.species_label_dict) | {"DEAD"}
    assert set(out.ensembleTa if "ensembleTa" in out.columns else out.ensembleTaxonID) <= valid
