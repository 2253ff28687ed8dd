"""Data layer tests: artifact loading, dataset shapes, split disjointness
(pattern: reference tests/test_data.py)."""
import numpy as np
import pandas as pd
import pytest

from deeptreeattention_tpu.data.dataset import Loader, TreeDataset


def test_artifact_datamodule(dm):
    assert len(dm.train) > 0 and len(dm.test) > 0
    # plot-disjoint split
    assert not set(dm.train.plotID).intersection(dm.test.plotID)
    assert dm.num_classes == 6
    assert set(dm.train.columns) >= {"individual", "taxonID", "image_path", "tile_year", "label"}
    assert dm.species_label_dict["ACRU"] == 0  # sorted species


def test_tree_dataset_item(dm, config):
    ds = TreeDataset(df=dm.train, config=config)
    individual, images, label = ds[0]
    assert images.shape == (3, 11, 11, 8)
    assert images.dtype == np.float32
    assert 0 <= label < dm.num_classes
    assert 0.0 <= images.max() <= 1.0


def test_missing_year_is_zero(dm, config):
    ds = TreeDataset(df=dm.train, config=config)
    # find an individual with a missing year
    for i, ind in enumerate(ds.individuals):
        missing = [y for y in ds.years if y not in ds.image_paths[ind]]
        if missing:
            _, images, _ = ds[i]
            yi = ds.years.index(missing[0])
            assert np.all(images[yi] == 0)
            return
    pytest.skip("fixture has no missing years")


def test_loader_batches_and_padding(dm, config):
    ds = TreeDataset(df=dm.train, config=config)
    loader = Loader(ds, batch_size=16, shuffle=True, pad_to_batch=True)
    batches = list(loader)
    assert all(b["HSI"].shape == (16, 3, 11, 11, 8) for b in batches)
    total_real = sum(b["mask"].sum() for b in batches)
    assert total_real == len(ds)
    last = batches[-1]
    assert np.all(last["HSI"][~last["mask"]] == 0)


def test_predict_mode_dataset(dm, config):
    ds = TreeDataset(df=dm.test, config=config, train=False)
    out = ds[0]
    assert len(out) == 2  # no label


def test_loader_workers_identical(dm, config):
    """Thread-pool decode (workers>0) yields byte-identical batches in the
    same order as the serial path — decode parallelism must not change
    results (VERDICT round-2 item 7)."""
    import numpy as np

    from deeptreeattention_tpu.data.dataset import Loader, TreeDataset

    cfg = dict(config)
    cfg["preload_images"] = False  # the path workers exist for
    ds = TreeDataset(df=dm.train, config=cfg, train=True)
    serial = list(Loader(ds, batch_size=3, shuffle=True, seed=7, pad_to_batch=True))
    threaded = list(Loader(ds, batch_size=3, shuffle=True, seed=7, pad_to_batch=True,
                           workers=4))
    assert len(serial) == len(threaded) > 0
    for a, b in zip(serial, threaded):
        assert list(a["individual"]) == list(b["individual"])
        np.testing.assert_array_equal(a["HSI"], b["HSI"])
        np.testing.assert_array_equal(a["label"], b["label"])
        np.testing.assert_array_equal(a["mask"], b["mask"])


def test_loader_workers_noop_when_preloaded(dm, config):
    from deeptreeattention_tpu.data.dataset import Loader, TreeDataset

    cfg = dict(config)
    cfg["preload_images"] = True
    ds = TreeDataset(df=dm.train, config=cfg, train=True)
    loader = Loader(ds, batch_size=4, workers=8)
    assert loader.workers == 0  # preloaded data is pure slicing
    assert len(list(loader)) == len(loader)
