"""Full-ETL integration: raw VST csv -> TreeData regeneration
(pattern: reference tests/test_data.py — debug mode, asserts train/test
disjointness and schema), plus filter/split unit behavior."""
import os

import numpy as np
import pandas as pd
import pytest

from deeptreeattention_tpu.data.filter import filter_data
from deeptreeattention_tpu.data.split import sample_plots, train_test_split
from deeptreeattention_tpu.data.datamodule import TreeData


@pytest.fixture(scope="module")
def raw_csv(fixtures_dir):
    return os.path.join(fixtures_dir, "sample_neon.csv")


def test_filter_data(raw_csv, config):
    shp = filter_data(raw_csv, config=config)
    assert len(shp) > 0
    # one row per individual, all live, diameters above threshold
    assert shp.individual.is_unique
    assert (shp.stemDiameter > config["min_stem_diameter"]).all()
    assert "geometry" in shp.columns


def test_filter_drops_small_and_dead(raw_csv, config, tmp_path):
    df = pd.read_csv(raw_csv)
    df.loc[0, "plantStatus"] = "Standing dead"
    df.loc[1, "stemDiameter"] = 1.0
    df.loc[2, "growthForm"] = "liana"
    path = str(tmp_path / "edited.csv")
    df.to_csv(path, index=False)
    shp = filter_data(path, config=config)
    dropped = set(df.loc[[0, 1, 2], "individualID"])
    assert not dropped.intersection(set(shp.individual))


def test_sample_plots_split(raw_csv, config):
    shp = filter_data(raw_csv, config=config)
    train, test = sample_plots(shp, min_train_samples=1, min_test_samples=1, seed=3)
    assert len(train) and len(test)
    assert not set(train.plotID).intersection(test.plotID)
    # species closed under both splits
    assert set(test.taxonID) <= set(train.taxonID)


def test_train_test_split_search(raw_csv, config):
    shp = filter_data(raw_csv, config=config)
    cfg = dict(config)
    cfg["iterations"] = 3
    train, test = train_test_split(shp, config=cfg)
    assert "point_id" in train.columns
    assert test.taxonID.nunique() >= 1


def test_full_etl_regeneration(raw_csv, config, tmp_path):
    """The whole pipeline with the deterministic detector and no CHM filter."""
    cfg = dict(config)
    cfg["use_data_commit"] = None
    cfg["replace"] = True
    cfg["new_train_test_split"] = True
    cfg["iterations"] = 1
    cfg["crop_dir"] = str(tmp_path / "crops")
    cfg["min_CHM_height"] = 1  # exercise the CHM filter against fixture CHM
    os.makedirs(cfg["crop_dir"], exist_ok=True)

    dm = TreeData(csv_file=raw_csv, config=cfg, data_dir=str(tmp_path), debug=True)
    assert len(dm.train) > 0 and len(dm.test) > 0
    assert not set(dm.train.plotID).intersection(dm.test.plotID)
    assert {"individual", "taxonID", "image_path", "tile_year", "label", "site"} <= set(
        dm.train.columns
    )
    # artifacts written for resume
    for f in ["canopy_points.shp", "crowns.shp", "annotations.csv", "train.csv", "test.csv"]:
        assert os.path.exists(os.path.join(str(tmp_path), f)), f
    # crops exist on disk
    sample = dm.train.image_path.iloc[0]
    assert os.path.exists(os.path.join(cfg["crop_dir"], sample))


def test_etl_dead_scoring_and_image_logging(raw_csv, config, tmp_path):
    """ETL-time alive/dead scoring + dead-crown review images (reference
    src/data.py:405-419, where the feature is latent dead code; here it
    runs when config["dead_model"] is set)."""
    from deeptreeattention_tpu.models import dead as dead_mod
    from deeptreeattention_tpu.utils.logging import Experiment

    dead_model = dead_mod.AliveDead(config=config, depth=18)
    ckpt = dead_model.save_checkpoint(str(tmp_path / "dead_ckpt"))

    cfg = dict(config)
    cfg["use_data_commit"] = None
    cfg["replace"] = True
    cfg["new_train_test_split"] = True
    cfg["iterations"] = 1
    cfg["crop_dir"] = str(tmp_path / "crops")
    cfg["dead_model"] = ckpt
    os.makedirs(cfg["crop_dir"], exist_ok=True)
    exp = Experiment(savedir=str(tmp_path / "exp"))

    dm = TreeData(csv_file=raw_csv, config=cfg, data_dir=str(tmp_path),
                  debug=True, comet_logger=exp)
    assert {"dead_label", "dead_score"} <= set(dm.crowns.columns)
    assert dm.crowns.dead_label.notna().any()
    assert hasattr(dm, "predicted_dead")
    # an image logged per predicted-dead crown (an untrained net labels
    # some of the fixture crowns dead; if none, nothing to log)
    import glob as _glob

    n_dead = len(dm.predicted_dead)
    logged = _glob.glob(os.path.join(str(tmp_path / "exp"), "**", "*Dead*"),
                        recursive=True)
    if n_dead:
        assert len(logged) == n_dead, (n_dead, logged)
