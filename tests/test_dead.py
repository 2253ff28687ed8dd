"""Alive/Dead model tests (pattern: reference tests/test_dead.py)."""
import numpy as np
import os

import pytest

from deeptreeattention_tpu.geo import vector
from deeptreeattention_tpu.models import dead


@pytest.fixture(scope="module")
def model(config):
    m = dead.AliveDead(config=config, depth=18)
    m.fit(fast_dev_run=True)
    return m


def test_folder_dataset(config, fixtures_dir):
    ds = dead.FolderDataset(os.path.join(fixtures_dir, "dead", "train"), augment=False)
    assert len(ds) == 12
    name, x, y = ds[0]
    assert x.shape == (224, 224, 3)
    assert y in (0, 1)


def test_fit_and_validate(model, config, fixtures_dir):
    val = model.validate(dead.FolderDataset(os.path.join(fixtures_dir, "dead", "test")))
    assert np.isfinite(val["val_loss"])
    assert {"Alive Accuracy", "Dead Accuracy"} <= set(val)


def test_utm_dataset_and_predict(model, config, fixtures_dir):
    crowns = vector.read_file(os.path.join(fixtures_dir, "artifact", "crowns.shp"))
    crowns = crowns.head(4)
    import glob

    crowns["RGB_tile"] = sorted(glob.glob(os.path.join(fixtures_dir, "rgb", "*.tif")))[0]
    ds = dead.UTMDataset(crowns=crowns, config=config)
    assert len(ds) == 4
    name, x = ds[0]
    assert x.shape == (224, 224, 3)
    probs = model.predict_dataset(ds)
    assert probs.shape == (4, 2)
    np.testing.assert_allclose(probs.sum(axis=1), np.ones(4), atol=1e-5)


def test_ondevice_dead_matches_utm_dataset(model, config, fixtures_dir):
    """predict_crowns_ondevice (tile uploaded once, windows gathered on
    device) is bit-equal to the UTMDataset host-window path, including the
    train-mode-BN batch-statistics quirk."""
    import glob

    crowns = vector.read_file(os.path.join(fixtures_dir, "artifact", "crowns.shp"))
    crowns = crowns.head(5)
    crowns["RGB_tile"] = sorted(glob.glob(os.path.join(fixtures_dir, "rgb", "*.tif")))[0]

    ds = dead.UTMDataset(crowns=crowns, config=config)
    host = model.predict_dataset(ds, batch_size=2)
    device = model.predict_crowns_ondevice(crowns, batch_size=2)
    np.testing.assert_allclose(device, host, atol=1e-6)

    # and with running stats (use_batch_stats=False) too
    host2 = model.predict_dataset(ds, batch_size=2, use_batch_stats=False)
    device2 = model.predict_crowns_ondevice(crowns, batch_size=2, use_batch_stats=False)
    np.testing.assert_allclose(device2, host2, atol=1e-6)


def test_ondevice_dead_partial_batch_bn_parity(model, config, fixtures_dir):
    """A HETEROGENEOUS partial final batch (1 < k < batch_size) must match
    predict_dataset bit-for-bit in batch-BN mode: the fused program pads the
    batch with duplicates, and those must never leak into batch statistics
    (round-4 review finding — k=1 partials are BN-neutral and hid this)."""
    import glob

    crowns = vector.read_file(os.path.join(fixtures_dir, "artifact", "crowns.shp"))
    crowns = crowns.head(6)
    crowns["RGB_tile"] = sorted(glob.glob(os.path.join(fixtures_dir, "rgb", "*.tif")))[0]

    ds = dead.UTMDataset(crowns=crowns, config=config)
    host = model.predict_dataset(ds, batch_size=4)  # batches: 4 + 2
    device = model.predict_crowns_ondevice(crowns, batch_size=4)
    np.testing.assert_allclose(device, host, atol=1e-6)


def test_ondevice_dead_multi_tile_and_validation(model, config, fixtures_dir, tmp_path):
    """Crown-order batching keeps batch-BN parity even when a batch spans
    two tiles; crowns without an RGB_tile are rejected loudly."""
    import glob
    import shutil

    crowns = vector.read_file(os.path.join(fixtures_dir, "artifact", "crowns.shp"))
    crowns = crowns.head(5)
    rgb = sorted(glob.glob(os.path.join(fixtures_dir, "rgb", "*.tif")))[0]
    rgb2 = str(tmp_path / "copy_of_tile.tif")
    shutil.copy(rgb, rgb2)
    # interleave two tiles so batches of 2 straddle the tile boundary
    crowns["RGB_tile"] = [rgb, rgb2, rgb, rgb2, rgb]

    ds = dead.UTMDataset(crowns=crowns, config=config)
    host = model.predict_dataset(ds, batch_size=2)
    device = model.predict_crowns_ondevice(crowns, batch_size=2)
    np.testing.assert_allclose(device, host, atol=1e-6)

    bad = crowns.copy()
    bad.loc[bad.index[2], "RGB_tile"] = None
    import pytest

    with pytest.raises(ValueError, match="no RGB_tile"):
        model.predict_crowns_ondevice(bad, batch_size=2)


def test_checkpoint_roundtrip(model, config, tmp_path):
    path = str(tmp_path / "dead_ckpt")
    model.save_checkpoint(path)
    loaded = dead.AliveDead.load_from_checkpoint(path, config=config, depth=18)
    x = np.random.RandomState(0).rand(2, 224, 224, 3).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(model.predict_batch(x)), np.asarray(loaded.predict_batch(x)), atol=1e-6
    )


def test_dataset_confusion(model, config, fixtures_dir):
    ds = dead.FolderDataset(os.path.join(fixtures_dir, "dead", "test"))
    true, pred = model.dataset_confusion(ds)
    assert true.shape == (len(ds), 2)
    assert pred.shape == (len(ds), 2)


def test_bn_folded_eval_matches_module(model, config):
    """dead.bn_mode: eval_folded — BN folded into conv weights must equal the
    module's eval-mode apply (same math, restructured); and the config knob
    routes the default-prediction paths through the folded step."""
    import copy

    x = np.random.RandomState(1).rand(4, 224, 224, 3).astype(np.float32)
    # identical math at f32: folded vs module eval-mode forward
    p_eval = np.asarray(model.predict_batch(x, use_batch_stats=False))
    model.bn_mode = "eval_folded"
    try:
        p_fold = np.asarray(model.predict_batch(x, use_batch_stats=None))
    finally:
        model.bn_mode = "batch"
    np.testing.assert_allclose(p_fold, p_eval, rtol=2e-4, atol=2e-5)

    # knob resolution: None defers to config, explicit args pin their mode
    cfg = copy.deepcopy(config)
    cfg["dead"]["bn_mode"] = "eval_folded"
    m = dead.AliveDead(config=cfg, depth=18, seed=0)
    assert m._resolve_mode(None) == "eval_folded"
    assert m._resolve_mode(True) == "batch"
    assert m._resolve_mode(False) == "eval"
    cfg["dead"]["bn_mode"] = "bogus"
    with pytest.raises(ValueError):
        dead.AliveDead(config=cfg, depth=18, seed=0)


@pytest.mark.parametrize("depth", [34, 50])
def test_resnet_eval_folded_parity_deep(depth):
    """Pins fused.resnet_eval's Bottleneck branch (depth 50 — the production
    dead scorer) and the projection-BasicBlock branch (34) against the
    module's eval-mode forward; the module-level test above only exercises
    depth 18. Running stats are perturbed away from init's (0, 1) so the
    fold arithmetic is actually load-bearing."""
    import jax
    import jax.numpy as jnp

    from deeptreeattention_tpu.models.fused import resnet_eval
    from deeptreeattention_tpu.models.resnet import ResNet

    model = ResNet(num_classes=2, depth=depth)
    x = jnp.asarray(np.random.RandomState(depth).rand(2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    rng = np.random.RandomState(depth + 1)
    stats = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a) + jnp.asarray(rng.rand(*a.shape), a.dtype) + 0.1,
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}

    ref = model.apply(variables, x, train=False)
    got = resnet_eval(variables, x, depth=depth, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_dead_bf16_compute_option(config, fixtures_dir):
    """dead.compute_dtype: bfloat16 runs the scorer in bf16 (measured +13%
    on chip) with scores close to the f32 default."""
    import copy

    cfg = copy.deepcopy(config)
    cfg["dead"]["compute_dtype"] = "bfloat16"
    m16 = dead.AliveDead(config=cfg, depth=18, seed=0)
    m32 = dead.AliveDead(config=config, depth=18, seed=0)

    x = np.random.RandomState(0).rand(2, 224, 224, 3).astype(np.float32)
    p16 = np.asarray(m16.predict_batch(x))
    p32 = np.asarray(m32.predict_batch(x))
    assert p16.shape == (2, 2) and np.all(np.isfinite(p16))
    np.testing.assert_allclose(p16, p32, atol=0.05)


def test_score_conventions():
    """The reference's softmax-of-sigmoid (reference src/models/dead.py:97-99)
    caps every score at e/(e+1) ~ 0.7311, making its own 0.95 production
    gate (reference config.yml:81, src/predict.py:96-98) unreachable; the
    calibrated convention preserves argmax but reaches ~1.0. docs/PARITY.md."""
    cap = np.e / (np.e + 1.0)
    confident = np.array([[0.001, 0.999], [0.999, 0.001], [0.4, 0.6]])
    ref = dead.scores_reference(confident)
    cal = dead.scores_calibrated(confident)
    assert ref.max() <= cap + 1e-9
    assert cal[0, 1] > 0.95 and cal[1, 0] > 0.95  # gate reachable
    np.testing.assert_array_equal(np.argmax(ref, 1), np.argmax(cal, 1))
    np.testing.assert_allclose(ref.sum(1), 1.0)
    np.testing.assert_allclose(cal.sum(1), 1.0)


def test_evaluate_arrays_score_modes(config):
    m = dead.AliveDead(config=config, depth=18, seed=0)
    x = np.random.RandomState(0).randint(0, 256, (4, 64, 64, 3), np.uint8)
    ref = m.evaluate_arrays(x, batch_size=4, score_mode="reference")
    cal = m.evaluate_arrays(x, batch_size=4, score_mode="calibrated")
    assert ref.shape == cal.shape == (4, 2)
    assert ref.max() <= np.e / (np.e + 1.0) + 1e-6
    np.testing.assert_array_equal(np.argmax(ref, 1), np.argmax(cal, 1))
    with pytest.raises(ValueError):
        m.evaluate_arrays(x, batch_size=4, score_mode="bogus")
    # calibrated == the production predict_batch math (normalize of sigmoid)
    np.testing.assert_allclose(cal.sum(1), 1.0)


def test_fit_arrays_select_best(config):
    """select_best restores the lowest-val-loss epoch (the round-4 CPU run
    regressed 0.92 -> 0.81 dead accuracy by keeping last-epoch weights)."""
    rng = np.random.RandomState(0)
    x = rng.randint(0, 256, (24, 32, 32, 3), np.uint8)
    y = (x.reshape(24, -1).mean(1) > 127).astype(np.int32)
    m = dead.AliveDead(config=config, depth=18, seed=0)
    history = m.fit_arrays(x, y, x, y, epochs=3, batch_size=8, seed=0,
                           select_best=True)
    assert m.best_epoch == int(np.argmin([h["val_loss"] for h in history]))
    # restored weights reproduce the best epoch's val loss
    probs = m.evaluate_arrays(x, batch_size=8)
    from deeptreeattention_tpu.models.dead import _classification_metrics

    got = _classification_metrics(probs, y)["val_loss"]
    np.testing.assert_allclose(got, history[m.best_epoch]["val_loss"],
                               rtol=1e-5, atol=1e-6)


def test_fit_arrays_smaller_than_batch(config):
    """pad > n (dataset smaller than one batch): np.resize cycles the
    permutation so the padded batch is full-length (review finding)."""
    rng = np.random.RandomState(1)
    x = rng.randint(0, 256, (3, 32, 32, 3), np.uint8)
    y = np.array([0, 1, 0], np.int32)
    m = dead.AliveDead(config=config, depth=18, seed=0)
    history = m.fit_arrays(x, y, epochs=1, batch_size=8, seed=0)
    assert len(history) == 1 and np.isfinite(history[0]["train_loss"])


def test_evaluate_arrays_empty_and_raw(config):
    m = dead.AliveDead(config=config, depth=18, seed=0)
    out = m.evaluate_arrays(np.zeros((0, 32, 32, 3), np.uint8), batch_size=4)
    assert out.shape == (0, 2)
    x = np.random.RandomState(0).randint(0, 256, (2, 32, 32, 3), np.uint8)
    raw = m.evaluate_arrays(x, batch_size=4, score_mode="raw")
    assert raw.shape == (2, 2) and (raw > 0).all() and (raw < 1).all()
    np.testing.assert_allclose(
        dead.scores_reference(raw),
        m.evaluate_arrays(x, batch_size=4, score_mode="reference"))


def test_fit_arrays_dihedral_augment(config):
    """augment="dihedral" (all 8 square symmetries on device) trains and
    caches its own jit pair without clobbering the hflip programs."""
    rng = np.random.RandomState(2)
    x = rng.randint(0, 256, (16, 32, 32, 3), np.uint8)
    y = (x.reshape(16, -1).mean(1) > 127).astype(np.int32)
    m = dead.AliveDead(config=config, depth=18, seed=0)
    history = m.fit_arrays(x, y, epochs=1, batch_size=8, seed=0,
                           augment="dihedral")
    assert len(history) == 1 and np.isfinite(history[0]["train_loss"])
    assert set(m._array_steps) == {"dihedral"}
    # eval path reuses/builds the hflip pair; scores well-formed
    probs = m.evaluate_arrays(x, batch_size=8)
    assert probs.shape == (16, 2)
    np.testing.assert_allclose(probs.sum(1), 1.0, rtol=1e-4)
    assert "hflip" in m._array_steps
