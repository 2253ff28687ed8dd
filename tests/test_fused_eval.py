"""Parity of the fused MXU inference forwards (models/fused.py) with the
reference-faithful flax modules. In float32 the fused math is the same ops
reassociated (BN folding, channel-concat convs), so tolerance is tight."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deeptreeattention_tpu.models import fused
from deeptreeattention_tpu.models.hang2020 import Hang2020
from deeptreeattention_tpu.models.year import LearnedEnsemble

BANDS, CLASSES, B, YEARS = 12, 5, 4, 3


@pytest.fixture(scope="module")
def hang_setup():
    model = Hang2020(bands=BANDS, classes=CLASSES, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 11, 11, BANDS)))
    # non-trivial batch_stats so BN folding is actually exercised
    variables = jax.tree_util.tree_map(
        lambda v: v + 0.05 * np.random.RandomState(1).standard_normal(v.shape).astype(v.dtype)
        if v.ndim else v,
        variables,
    )
    x = jnp.asarray(np.random.RandomState(2).rand(B, 11, 11, BANDS).astype(np.float32))
    return model, variables, x


def test_hang2020_fused_parity_f32(hang_setup):
    model, variables, x = hang_setup
    expected = model.apply(variables, x, train=False)
    got = fused.hang2020_eval(variables, x, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5, rtol=1e-5)


def test_hang2020_fused_bf16_close(hang_setup):
    model, variables, x = hang_setup
    expected = model.apply(variables, x, train=False)
    got = fused.hang2020_eval(variables, x, dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=0.05, rtol=0.05)


@pytest.mark.parametrize("mask_mode", ["batch", "sample"])
def test_learned_ensemble_fused_parity(mask_mode):
    model = LearnedEnsemble(years=YEARS, classes=CLASSES, bands=BANDS,
                            dtype=jnp.float32, mask_mode=mask_mode)
    images = np.random.RandomState(3).rand(B, YEARS, 11, 11, BANDS).astype(np.float32)
    images[:, 1] = 0.0  # missing year, must be masked identically
    if mask_mode == "sample":
        images[0, 2] = 0.0  # per-sample hole
    images = jnp.asarray(images)
    variables = model.init(jax.random.PRNGKey(4), images)
    variables = jax.tree_util.tree_map(
        lambda v: v + 0.05 * np.random.RandomState(5).standard_normal(v.shape).astype(v.dtype)
        if v.ndim else v,
        variables,
    )
    expected = model.apply(variables, images, train=False)
    got = fused.learned_ensemble_eval(variables, images, mask_mode=mask_mode,
                                      dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5, rtol=1e-5)


def test_multistage_fused_predict_matches_unfused(config, dm):
    """config["fused_inference"] plumbing through MultiStage leaves
    predictions unchanged (for LearnedEnsemble the dispatch keeps the module
    apply — measured faster — so this pins the flag being safe end to end)."""
    import os

    from deeptreeattention_tpu.data.dataset import TreeDataset
    from deeptreeattention_tpu.models.multi_stage import MultiStage

    cfg_f = dict(config, fused_inference=True)
    cfg_u = dict(config, fused_inference=False)
    m1 = MultiStage(train_df=dm.train, test_df=dm.test, crowns=dm.crowns, config=cfg_u)
    m2 = MultiStage(train_df=dm.train, test_df=dm.test, crowns=dm.crowns, config=cfg_f,
                    seed=0)
    m2.variables = m1.variables  # identical weights
    ds = TreeDataset(csv_file=os.path.join(dm.data_dir, "test.csv"), config=config)
    out1 = m1.predict(m1.predict_dataloader(ds))
    out2 = m2.predict(m2.predict_dataloader(ds))
    for (ind1, probs1), (ind2, probs2) in zip(out1, out2):
        assert list(ind1) == list(ind2)
        for p1, p2 in zip(probs1, probs2):
            np.testing.assert_allclose(p1, p2, atol=1e-5, rtol=1e-5)


def test_metadata_fusion_fused_parity():
    from deeptreeattention_tpu.models.metadata import MetadataSensorFusion

    model = MetadataSensorFusion(bands=BANDS, sites=4, classes=CLASSES,
                                 dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(8).rand(B, 11, 11, BANDS).astype(np.float32))
    sites = jnp.asarray([0, 3, 1, 2])
    variables = model.init(
        {"params": jax.random.PRNGKey(9), "dropout": jax.random.PRNGKey(10)},
        x, sites, train=False,
    )
    variables = jax.tree_util.tree_map(
        lambda v: v + 0.05 * np.random.RandomState(11).standard_normal(v.shape).astype(v.dtype)
        if v.ndim else v,
        variables,
    )
    expected = model.apply(variables, x, sites, train=False)
    got = fused.metadata_fusion_eval(variables, x, sites, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5, rtol=1e-5)


def test_learned_ensemble_fused_single_year():
    model = LearnedEnsemble(years=1, classes=CLASSES, bands=BANDS, dtype=jnp.float32)
    images = jnp.asarray(
        np.random.RandomState(6).rand(B, 1, 11, 11, BANDS).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(7), images)
    expected = model.apply(variables, images, train=False)
    got = fused.learned_ensemble_eval(variables, images, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5, rtol=1e-5)


def test_multistage_eval_cross_level_parity():
    """fused.multistage_eval == per-level module applies (both mask modes),
    with different class counts per level and a missing year."""
    import jax
    import numpy as np

    from deeptreeattention_tpu.models.fused import multistage_eval
    from deeptreeattention_tpu.models.year import LearnedEnsemble

    Y, BANDS, B = 3, 16, 6
    class_counts = [2, 2, 5, 3, 4]
    rng = np.random.RandomState(0)
    x = rng.rand(B, Y, 11, 11, BANDS).astype(np.float32)
    x[1, 2] = 0.0  # missing year for one sample
    for mode in ("batch", "sample"):
        models, variables = [], []
        key = jax.random.PRNGKey(0)
        for c in class_counts:
            m = LearnedEnsemble(years=Y, classes=c, bands=BANDS,
                                dtype=jnp.float32, mask_mode=mode)
            key, sub = jax.random.split(key)
            variables.append(dict(m.init(sub, jnp.asarray(x))))
            models.append(m)
        ref = [np.asarray(m.apply(v, jnp.asarray(x)))
               for m, v in zip(models, variables)]
        out = multistage_eval(variables, jnp.asarray(x), mask_mode=mode,
                              dtype=jnp.float32)
        for l in range(len(class_counts)):
            np.testing.assert_allclose(ref[l], np.asarray(out[l]), atol=1e-5)


def test_multistage_predict_fused_all_matches_per_level(m, dm, config):
    """MultiStage.predict through the fused all-level step == the per-level
    eval loop on the fixture model."""
    import numpy as np

    from deeptreeattention_tpu.data.dataset import TreeDataset

    assert m._eval_all is not None  # fused_inference default
    ds = TreeDataset(df=dm.test, train=False, config=config, years=m.years)
    fused_out = m.predict(m.predict_dataloader(ds))
    orig = m._eval_all
    m._eval_all = None
    try:
        plain_out = m.predict(m.predict_dataloader(ds))
    finally:
        m._eval_all = orig
    assert len(fused_out) == len(plain_out)
    for (fi, fp), (pi, pp) in zip(fused_out, plain_out):
        assert list(fi) == list(pi)
        for level in range(m.levels):
            np.testing.assert_allclose(fp[level], pp[level], atol=1e-5)
