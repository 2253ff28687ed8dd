"""TreeModel / metadata-fusion / backbone-transfer tests (patterns:
reference tests/test_main-ish coverage via test_multi_stage, test_metadata,
test_year backbone loading)."""
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeptreeattention_tpu.data.dataset import Loader, TreeDataset
from deeptreeattention_tpu.models.hang2020 import SpectralNetwork
from deeptreeattention_tpu.models.metadata import Metadata, MetadataSensorFusion, MetadataModel
from deeptreeattention_tpu.models.year import LearnedEnsemble, load_year_backbones
from deeptreeattention_tpu.train.treemodel import TreeModel


@pytest.fixture(scope="module")
def tm(config, dm):
    cfg = dict(config)
    cfg["n_years"] = 3
    cfg["lr"] = 1e-3
    model = LearnedEnsemble(years=3, classes=dm.num_classes, bands=cfg["bands"])
    return TreeModel(
        model=model, classes=dm.num_classes, label_dict=dm.species_label_dict, config=cfg
    )


def test_fit_and_predict_dataloader(tm, dm, config):
    train_ds = TreeDataset(df=dm.train, config=config)
    val_ds = TreeDataset(df=dm.test, config=config)
    history = tm.fit(train_ds, val_ds, fast_dev_run=True)
    assert np.isfinite(history[0]["train_loss"])
    assert "Micro Accuracy" in history[0]

    loader = Loader(val_ds, 8, pad_to_batch=True)
    df = tm.predict_dataloader(loader)
    assert {"pred_label_top1", "pred_taxa_top1", "top1_score", "individual", "label"} <= set(
        df.columns
    )
    assert df.top1_score.between(0, 1).all()
    assert (df.top1_score >= df.top2_score).all()


def test_evaluate_crowns(tm, dm, config):
    val_ds = TreeDataset(df=dm.test, config=config)
    loader = Loader(val_ds, 8, pad_to_batch=True)
    results = tm.evaluate_crowns(loader, crowns=dm.crowns)
    assert "geometry" in results.columns
    assert len(results) > 0


def test_checkpoint_roundtrip(tm, tmp_path, config, dm):
    path = str(tmp_path / "tm")
    tm.save_checkpoint(path)
    model2 = LearnedEnsemble(years=3, classes=dm.num_classes, bands=config["bands"])
    cfg = dict(config)
    cfg["n_years"] = 3
    tm2 = TreeModel(model2, dm.num_classes, dm.species_label_dict, config=cfg)
    tm2.load_checkpoint(path)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 3, 11, 11, config["bands"]), jnp.float32)
    np.testing.assert_allclose(np.asarray(tm.predict(x)), np.asarray(tm2.predict(x)), atol=1e-6)


def test_metadata_modules(config, dm):
    meta = Metadata(sites=3, classes=4)
    variables = meta.init(jax.random.PRNGKey(0), jnp.zeros((2,), jnp.int32))
    out = meta.apply(variables, jnp.asarray([0, 2]))
    assert out.shape == (2, 4)

    fusion = MetadataSensorFusion(bands=config["bands"], sites=3, classes=4)
    fv = fusion.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((2, 11, 11, config["bands"])), jnp.zeros((2,), jnp.int32),
    )
    out = fusion.apply(fv, jnp.ones((2, 11, 11, config["bands"])), jnp.asarray([0, 1]))
    assert out.shape == (2, 4)


def test_metadata_model_fit(config, dm):
    cfg = dict(config)
    cfg["lr"] = 1e-3
    fusion = MetadataSensorFusion(
        bands=cfg["bands"], sites=dm.num_sites, classes=dm.num_classes
    )
    mm = MetadataModel(
        model=fusion, classes=dm.num_classes, label_dict=dm.species_label_dict, config=cfg
    )

    ds = TreeDataset(df=dm.train, config=cfg)
    loader = Loader(ds, 4, pad_to_batch=True)  # batches carry "site" natively
    # drive one fused step directly
    batch = next(iter(loader))
    mm.key, rng = jax.random.split(mm.key)
    images = jnp.asarray(batch["HSI"])[:, 0]
    params, stats, opt_state, loss = mm._fusion_train_step(
        mm.variables["params"], mm.variables.get("batch_stats", {}), mm.opt_state,
        images, jnp.asarray(batch["site"]), jnp.asarray(batch["label"]),
        jnp.asarray(batch["mask"]), mm.loss_weight, rng,
    )
    assert np.isfinite(float(loss))
    probs = mm.predict({"HSI": batch["HSI"], "site": batch["site"]})
    assert probs.shape[1] == dm.num_classes

    # the full public fit loop (prefetch pipeline reads self.mesh)
    history = mm.fit(ds, fast_dev_run=True)
    assert np.isfinite(history[0]["train_loss"])


def test_year_backbone_broadcast(config):
    bands = config["bands"]
    backbone = SpectralNetwork(bands=bands, classes=4)
    bvars = backbone.init(jax.random.PRNGKey(1), jnp.zeros((1, 11, 11, bands)))

    model = LearnedEnsemble(years=3, classes=4, bands=bands)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 11, 11, bands)))
    merged = load_year_backbones(variables, bvars, years=3)

    k = np.asarray(merged["params"]["year_models"]["conv1"]["conv"]["kernel"])
    assert k.shape[0] == 3
    for y in range(3):
        np.testing.assert_array_equal(k[y], np.asarray(bvars["params"]["conv1"]["conv"]["kernel"]))
    # classifiers keep their per-year random init (not broadcast)
    ck = np.asarray(merged["params"]["year_models"]["classifier1"]["fc1"]["kernel"])
    assert not np.allclose(ck[0], ck[1])


def test_metadata_model_validate_and_predict_dataloader(config, dm):
    """The inherited TreeModel evaluation surface works on the two-input
    model: validate() computes loss+metrics through the fusion steps and
    predict_dataloader feeds HSI + site through the batch hook."""
    cfg = dict(config)
    cfg["lr"] = 1e-3
    fusion = MetadataSensorFusion(
        bands=cfg["bands"], sites=dm.num_sites, classes=dm.num_classes
    )
    mm = MetadataModel(
        model=fusion, classes=dm.num_classes, label_dict=dm.species_label_dict, config=cfg
    )
    ds = TreeDataset(df=dm.train, config=cfg)
    val_loss, metric_dict = mm.validate(ds)
    assert np.isfinite(val_loss)
    assert "Micro Accuracy" in metric_dict or metric_dict

    loader = Loader(ds, 4, pad_to_batch=True)
    df = mm.predict_dataloader(loader)
    assert len(df) == len(ds)
    assert {"pred_taxa_top1", "top1_score", "individual"} <= set(df.columns)


def test_tree_dataset_empty_frame_with_preload(config, dm):
    """An empty hierarchy level (e.g. a site with no oaks) must construct
    under preload_images=True (np.stack([]) raised before)."""
    cfg = dict(config)
    cfg["preload_images"] = True
    empty = dm.train.iloc[0:0]
    ds = TreeDataset(df=empty, config=cfg)
    assert len(ds) == 0
    assert list(Loader(ds, 4)) == []


def test_tree_dataset_nan_tile_year_raises_clearly(config, dm):
    import pytest

    df = dm.train.copy()
    df.loc[df.index[0], "tile_year"] = np.nan
    with pytest.raises(ValueError, match="missing tile_year"):
        TreeDataset(df=df, config=dict(config))
