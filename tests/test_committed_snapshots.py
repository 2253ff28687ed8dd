"""The committed trained artifacts under snapshots/ must load and score.

The reference ships its production behavior through downloaded release
weights (DeepForest) and comet-tracked checkpoints; this repo commits the
snapshots in-tree (bf16 msgpack) and wires them into config.yml, so
`python predict.py` runs the full reference pipeline (crowns -> dead gate
-> species) with zero manual setup (reference predict.py:135-161,
src/predict.py:96-98).
"""
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEAD_SNAPSHOT = os.path.join(REPO, "snapshots", "dead_real")


@pytest.mark.skipif(not os.path.exists(DEAD_SNAPSHOT),
                    reason="committed dead snapshot absent")
def test_dead_snapshot_loads_and_scores(config):
    from deeptreeattention_tpu.models.dead import AliveDead

    m = AliveDead.load_from_checkpoint(DEAD_SNAPSHOT, config)
    assert m.depth == 50  # reference production depth (src/models/dead.py:34)
    # bf16 storage restores to f32 compute dtypes
    leaves = __import__("jax").tree_util.tree_leaves(m.variables["params"])
    assert all(l.dtype == np.float32 for l in leaves)

    # one small batch end-to-end: calibrated probabilities, rows sum to 1
    from deeptreeattention_tpu.models.dead import rgb_transform_np

    rng = np.random.RandomState(0)
    x = rng.randint(0, 255, (2, 224, 224, 3)).astype(np.uint8)
    xs = np.stack([rgb_transform_np(x[i]) for i in range(2)])
    probs = np.asarray(m.predict_batch(xs, use_batch_stats=False))
    assert probs.shape == (2, 2)
    assert np.all(np.isfinite(probs))
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-5)


@pytest.mark.skipif(not os.path.exists(DEAD_SNAPSHOT),
                    reason="committed dead snapshot absent")
def test_config_dead_model_points_at_committed_snapshot():
    from deeptreeattention_tpu.utils.config import read_config

    cfg = read_config(os.path.join(REPO, "config.yml"))
    assert cfg.get("dead_model") == "snapshots/dead_real"
