"""End-to-end pipeline on the reference's REAL committed data artifact.

The reference's own test suite exercises
tests/data/110ac77ae89043898f618466359c2a2e/ — real multi-year 369-band HSI
crops (OSBS, 53 train/test rows, 3,077 crowns, 15 species) — as its core
`dm` fixture (reference tests/conftest.py:92-97, with
use_data_commit="110ac77ae89043898f618466359c2a2e"). These tests run OUR
full pipeline on the same real data: TreeData(use_data_commit) ->
MultiStage.fit(fast_dev_run) -> predict -> gather_predictions -> ensemble ->
evaluation_scores.

Real-schema quirks this covers that synthetic fixtures can't:
- `Unnamed: 0*` index junk columns in train/test CSVs
- `tile_year` arriving as int64 (canonically str in-repo)
- absolute `RGB_tile` paths pointing at the reference cluster (unused here)
- shapefile column-name abbreviation on the committed crowns/points layers
"""
import os

import numpy as np
import pandas as pd
import pytest

ARTIFACT = "/root/reference/tests/data/110ac77ae89043898f618466359c2a2e"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(ARTIFACT), reason="reference checkout not available")


@pytest.fixture(scope="module")
def real_config(tmp_path_factory):
    from deeptreeattention_tpu.utils.config import read_config

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = read_config(os.path.join(root, "config.yml"))
    # the commit value alone locates the artifact (no data_dir second knob)
    cfg["use_data_commit"] = ARTIFACT
    cfg["crop_dir"] = ARTIFACT
    cfg["data_dir"] = str(tmp_path_factory.mktemp("real_artifact_out"))
    cfg["workers"] = 0
    cfg["preload_images"] = False
    cfg["gpus"] = 0
    cfg["batch_size"] = 8
    cfg["predict_batch_size"] = 8
    cfg["epochs"] = 1
    cfg["fast_dev_run"] = True
    cfg["pretrain_state_dict"] = None
    cfg["existing_test_csv"] = None
    return cfg


@pytest.fixture(scope="module")
def real_dm(real_config):
    from deeptreeattention_tpu.data.datamodule import TreeData

    return TreeData(
        csv_file=os.path.join(ARTIFACT, "train.csv"),
        config=real_config,
        debug=True,
    )


def test_real_artifact_loads(real_dm):
    """The artifact loads through use_data_commit alone: real CSV schema,
    crowns/canopy shapefiles, 15-species label dict."""
    assert len(real_dm.train) == 53 and len(real_dm.test) == 53
    assert real_dm.num_classes == 15
    assert len(real_dm.crowns) > 3000
    # label dict is alphabetical over the union of train/test taxonIDs
    species = sorted(real_dm.species_label_dict)
    assert species == list(real_dm.species_label_dict)
    assert "QULA2" in real_dm.species_label_dict


def test_real_artifact_crops_decode(real_dm, real_config):
    """Real 369-band HSI crops decode through the in-house codec and
    preprocess to [11, 11, 349] in [0, 1]."""
    from deeptreeattention_tpu.data.dataset import TreeDataset

    ds = TreeDataset(df=real_dm.train.head(4), config=real_config, train=True)
    individual, images, label = ds[0]
    arr = np.asarray(images)  # [years, S, S, C]
    assert arr.ndim == 4 and arr.shape[1:] == (11, 11, 349), arr.shape
    assert np.isfinite(arr).all()
    assert 0.0 <= float(arr.min()) and float(arr.max()) <= 1.0
    # at least one real (non-zero-filled) year decoded from disk
    assert np.abs(arr).sum() > 0
    assert 0 <= int(label) < 15


def test_real_artifact_end_to_end(real_dm, real_config):
    """fit(fast_dev_run) -> predict -> gather -> ensemble ->
    evaluation_scores on the real 15-species data."""
    from deeptreeattention_tpu.models.multi_stage import MultiStage

    m = MultiStage(train_df=real_dm.train, test_df=real_dm.test,
                   crowns=real_dm.crowns, config=real_config)
    m.fit(fast_dev_run=True)
    results = m.gather_predictions(m.predict(real_dm.test))
    assert "individual" in results.columns
    assert len(results) == real_dm.test.individual.nunique()
    ensemble_df = m.ensemble(results)
    assert set(ensemble_df.ensembleTaxonID.dropna().unique()) <= set(
        real_dm.species_label_dict)
    merged = ensemble_df.merge(
        real_dm.test.groupby("individual").head(1), on="individual")
    scored = m.evaluation_scores(merged)
    # per-level score sanity: accuracies are defined and within [0, 1]
    for k, v in scored.items():
        if isinstance(v, float) and not np.isnan(v):
            assert 0.0 <= v <= 1.0, (k, v)


def test_use_data_commit_id_style(real_config):
    """Reference style (tests/conftest.py:78): use_data_commit is a bare
    commit id joined onto config['data_dir'] — the commit locates the
    artifact without a second knob agreeing with it."""
    from deeptreeattention_tpu.data.datamodule import TreeData

    cfg = dict(real_config)
    cfg["data_dir"] = os.path.dirname(ARTIFACT)
    cfg["use_data_commit"] = os.path.basename(ARTIFACT)
    dm = TreeData(csv_file=os.path.join(ARTIFACT, "train.csv"),
                  config=cfg, debug=True)
    assert dm.num_classes == 15
    assert dm.data_dir == ARTIFACT
