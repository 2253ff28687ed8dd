"""MultiStage tests: level construction, 1-step fit, predict->gather->
ensemble, checkpoint round trip (pattern: reference tests/test_multi_stage.py)."""
import os

import numpy as np
import pytest

from deeptreeattention_tpu.data.dataset import TreeDataset
from deeptreeattention_tpu.models.multi_stage import MultiStage


def test_level_construction(m, dm):
    assert m.levels == 5
    assert m.level_label_dicts[0] == {"PIPA2": 0, "OTHER": 1}
    assert m.level_label_dicts[1] == {"CONIFER": 0, "BROADLEAF": 1}
    assert m.level_label_dicts[2] == {"ACRU": 0, "OAK": 1}
    assert set(m.level_label_dicts[3]) == {"PITA", "PIEL"}
    assert set(m.level_label_dicts[4]) == {"QULA2", "QUGE2"}
    # L0 collapses everything non-pine to OTHER
    assert set(m.train_frames[0].taxonID.unique()) <= {"PIPA2", "OTHER"}
    # L3 contains only conifers (no PIPA2)
    assert set(m.train_frames[3].taxonID.unique()) <= {"PITA", "PIEL"}


def test_fit_one_epoch_reduces_nothing_but_runs(m):
    history = m.fit(epochs=1, fast_dev_run=True)
    assert len(history) == 1
    assert len(history[0]["train_loss"]) == 5
    assert all(np.isfinite(history[0]["train_loss"]))
    assert all(np.isfinite(history[0]["val_loss"]))


def test_predict_accepts_dataframe(m, dm, config):
    """Lightning-surface conveniences: predict() wraps a crowns DataFrame in
    the predict Loader itself, and TreeData.setup() is the inherited no-op
    (reference src/data.py:312 — ETL runs in __init__)."""
    assert dm.setup() is None and dm.setup("fit") is None
    via_df = m.gather_predictions(m.predict(dm.test))
    ds = TreeDataset(df=dm.test, config=config, train=False)
    via_loader = m.gather_predictions(m.predict(m.predict_dataloader(ds)))
    assert len(via_df) == len(via_loader)
    np.testing.assert_allclose(
        via_df["top1_score_level_0"], via_loader["top1_score_level_0"], rtol=1e-5
    )
    # predict_dataloader itself must accept a raw DataFrame too (the
    # natural call m.predict(m.predict_dataloader(m.test_df)) used to
    # KeyError inside the Loader, which indexed the frame by row int)
    via_dl_df = m.gather_predictions(m.predict(m.predict_dataloader(dm.test)))
    assert len(via_dl_df) == len(via_df)
    np.testing.assert_allclose(
        via_df["top1_score_level_0"], via_dl_df["top1_score_level_0"], rtol=1e-5
    )


def test_predict_dataframe_year_subset_and_order(m, dm, config):
    """predict(df) must stack images on the MODEL's year axis. A frame
    whose tile_years are a subset of the training years used to build a
    wrong-width stack (vmap crash — hit by the leave-one-out folds in
    scripts/train_species_real.py); a frame whose unique-year ORDER
    differs used to silently map years onto the wrong parameter slots."""
    years = [str(y) for y in m.years]
    assert len(years) >= 2
    # subset: rows carrying only the model's second year — missing years
    # must zero-fill + mask on the model's axis, not shrink the stack
    sub = dm.test[dm.test.tile_year.astype(str) == years[1]].reset_index(
        drop=True)
    assert len(sub)
    out = m.gather_predictions(m.predict(sub))
    assert len(out) == sub.individual.nunique()
    # order: arrange rows so pd.unique() sees the years reversed — per-
    # individual scores must match the canonical-order frame exactly
    rev = dm.test.sort_values(
        "tile_year", ascending=False, kind="stable").reset_index(drop=True)
    assert list(rev.tile_year.astype(str).unique()) != years
    via_rev = m.gather_predictions(m.predict(rev))
    via_can = m.gather_predictions(m.predict(dm.test))
    merged = via_rev.merge(via_can, on="individual", suffixes=("_r", "_c"))
    assert len(merged) == len(via_can)
    np.testing.assert_allclose(
        merged["top1_score_level_0_r"], merged["top1_score_level_0_c"],
        rtol=1e-5)


def test_predict_gather_ensemble(m, dm, config):
    ds = TreeDataset(df=dm.test, config=config, train=False)
    loader = m.predict_dataloader(ds)
    predictions = m.predict(loader)
    assert predictions
    results = m.gather_predictions(predictions)
    assert len(results) == len(ds.individuals)
    for level in range(5):
        assert "pred_taxa_top1_level_{}".format(level) in results.columns
        scores = results["top1_score_level_{}".format(level)]
        assert scores.between(0, 1).all()

    ensemble_df = m.ensemble(results)
    assert set(ensemble_df.ensembleTaxonID.unique()) <= set(m.species_label_dict) | {None}
    # decision-tree consistency: PIPA2 rows take the level-0 score
    pipa = ensemble_df[ensemble_df.pred_taxa_top1_level_0 == "PIPA2"]
    if len(pipa):
        np.testing.assert_allclose(pipa.ens_score, pipa.top1_score_level_0)

    merged = ensemble_df.merge(dm.test.groupby("individual").head(1), on="individual")
    scored = m.evaluation_scores(merged)
    assert "ens_label" in scored.columns


def test_pretrain_backbone_broadcast(dm, config, tmp_path):
    """pretrain_state_dict: a saved spectral backbone seeds every year model
    of every level."""
    import jax
    import jax.numpy as jnp

    from deeptreeattention_tpu.models.hang2020 import SpectralNetwork
    from deeptreeattention_tpu.train import checkpoints

    backbone = SpectralNetwork(bands=config["bands"], classes=4)
    bvars = backbone.init(
        jax.random.PRNGKey(7), jnp.zeros((1, 11, 11, config["bands"]))
    )
    path = str(tmp_path / "backbone")
    checkpoints.save_checkpoint(path, dict(bvars))

    cfg = dict(config)
    cfg["pretrain_state_dict"] = path
    m2 = MultiStage(train_df=dm.train, test_df=dm.test, crowns=dm.crowns, config=cfg)
    k = np.asarray(m2.variables[0]["params"]["year_models"]["conv1"]["conv"]["kernel"])
    expected = np.asarray(bvars["params"]["conv1"]["conv"]["kernel"])
    for y in range(k.shape[0]):
        np.testing.assert_array_equal(k[y], expected)


def test_checkpoint_roundtrip(m, dm, config, tmp_path):
    path = str(tmp_path / "snapshot")
    m.save_checkpoint(path)
    assert os.path.exists(os.path.join(path, "state.msgpack"))

    loaded = MultiStage.load_from_checkpoint(path, config=config)
    assert loaded.levels == m.levels
    assert loaded.species_label_dict == m.species_label_dict

    ds = TreeDataset(df=dm.test.head(4), config=config, train=False)
    loader = m.predict_dataloader(ds)
    a = m.predict(loader)
    b = loaded.predict(m.predict_dataloader(ds))
    for (ia, pa), (ib, pb) in zip(a, b):
        for la, lb in zip(pa, pb):
            np.testing.assert_allclose(la, lb, atol=1e-6)


def test_checkpoint_bf16_prediction_snapshot(m, dm, config, tmp_path):
    """Committed-artifact shape: bf16 storage + no optimizer state. Loads
    with f32 params and predicts within bf16 storage error of the source."""
    path = str(tmp_path / "snap_bf16")
    m.save_checkpoint(path, include_opt=False, save_dtype="bfloat16")
    full = os.path.getsize(os.path.join(
        str(tmp_path / "snap_bf16"), "state.msgpack"))
    loaded = MultiStage.load_from_checkpoint(path, config=config)
    import jax

    for level in range(loaded.levels):
        leaves = jax.tree_util.tree_leaves(loaded.variables[level]["params"])
        assert all(l.dtype == np.float32 for l in leaves)
    ds = TreeDataset(df=dm.test.head(4), config=config, train=False)
    a = m.predict(m.predict_dataloader(ds))
    b = loaded.predict(m.predict_dataloader(ds))
    for (ia, pa), (ib, pb) in zip(a, b):
        for la, lb in zip(pa, pb):
            # probabilities; bf16 weight rounding shifts them ~1e-2 worst case
            np.testing.assert_allclose(la, lb, atol=2e-2)
    # and it really is smaller than the full f32+opt snapshot
    full_path = str(tmp_path / "snap_full")
    m.save_checkpoint(full_path)
    assert full < 0.25 * os.path.getsize(
        os.path.join(full_path, "state.msgpack"))


def test_checkpoint_restores_optimizer_state(m, config, tmp_path):
    """Adam moments and the scheduler-reduced learning rate survive a
    checkpoint round-trip (exact mid-training recovery)."""
    import jax

    from deeptreeattention_tpu.models.multi_stage import MultiStage

    from deeptreeattention_tpu.train import optim

    # simulate a plateau reduction and some training history; the fixture
    # is session-scoped, so restore its lr state even on assertion failure
    try:
        for level in range(m.levels):
            m.schedulers[level].lr = m.schedulers[level].lr * 0.5
            m.opt_states[level] = optim.set_learning_rate(
                m.opt_states[level], m.schedulers[level].lr
            )
        path = m.save_checkpoint(str(tmp_path / "opt_ckpt"))

        loaded = MultiStage.load_from_checkpoint(path, config=config)
        for level in range(m.levels):
            orig = jax.tree_util.tree_leaves(m.opt_states[level])
            rest = jax.tree_util.tree_leaves(loaded.opt_states[level])
            assert len(orig) == len(rest)
            for a, b in zip(orig, rest):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
            assert float(
                loaded.opt_states[level].hyperparams["learning_rate"]
            ) == pytest.approx(m.schedulers[level].lr)
    finally:
        for level in range(m.levels):
            m.schedulers[level].lr = m.schedulers[level].lr * 2.0
            m.opt_states[level] = optim.set_learning_rate(
                m.opt_states[level], m.schedulers[level].lr
            )


def test_old_checkpoint_mask_mode_defaults_to_batch(m, config, tmp_path):
    """Checkpoints whose meta predates the mask_mode key were trained under
    the only semantics that existed then ('batch'); reload must NOT pick up
    the config's newer default ('sample') — that would silently change
    year-mask behavior for batches containing all-zero years."""
    import json

    path = m.save_checkpoint(str(tmp_path / "pre_mask_mode"))
    meta_path = os.path.join(path, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    meta.pop("mask_mode", None)
    with open(meta_path, "w") as f:
        json.dump(meta, f)

    cfg = dict(config)
    cfg["mask_mode"] = "sample"
    loaded = MultiStage.load_from_checkpoint(path, config=cfg)
    assert loaded.mask_mode == "batch"
