"""Alive/Dead on the reference's REAL labeled crowns (subsampled).

The reference ships its actual training data in-repo (4,819 Alive / 882
Dead train, 536/99 test PNG crowns; consumed by reference
src/models/dead.py:47-50 + train_dead.py:19-41). This test trains on a
small balanced subsample from scratch (no pretrained weights exist offline)
and checks real generalization on the full real test set — pinning the
device-resident fit_arrays path end to end on real data. The full-run
numbers live in BENCH_DEAD_REAL.json (scripts/train_dead_real.py).
"""
import os

import numpy as np
import pytest

REF_TRAIN = "/root/reference/data/raw/dead_train"
REF_TEST = "/root/reference/data/raw/dead_test"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_TRAIN), reason="reference checkout not available")


def test_folder_to_arrays_cache_keys_on_content(tmp_path):
    """Two dataset roots with the SAME basename sharing one cache_dir must
    not alias (round-4 review finding: basename-only keys returned stale
    arrays for a different dataset version)."""
    from PIL import Image

    from deeptreeattention_tpu.models.dead import folder_to_arrays

    cache = str(tmp_path / "cache")
    for version, value in (("v1", 10), ("v2", 200)):
        root = tmp_path / version / "dead_train"
        for cls in ("Alive", "Dead"):
            (root / cls).mkdir(parents=True)
            Image.fromarray(
                np.full((8, 8, 3), value, np.uint8)).save(
                    str(root / cls / "a.png"))
    x1, _ = folder_to_arrays(str(tmp_path / "v1" / "dead_train"),
                             size=8, cache_dir=cache)
    x2, _ = folder_to_arrays(str(tmp_path / "v2" / "dead_train"),
                             size=8, cache_dir=cache)
    assert int(x1[0, 0, 0, 0]) == 10 and int(x2[0, 0, 0, 0]) == 200


def test_real_dead_subsample_learns(tmp_path):
    from deeptreeattention_tpu.models.dead import (
        AliveDead, _classification_metrics, folder_to_arrays)
    from deeptreeattention_tpu.utils.config import read_config

    cache = str(tmp_path / "cache")
    x_tr, y_tr = folder_to_arrays(REF_TRAIN, size=64, cache_dir=cache)
    x_te, y_te = folder_to_arrays(REF_TEST, size=64, cache_dir=cache)
    assert len(y_tr) == 5701 and len(y_te) == 635
    assert int((y_tr == 0).sum()) == 4819 and int((y_tr == 1).sum()) == 882
    assert x_tr.dtype == np.uint8 and x_tr.shape[1:] == (64, 64, 3)

    # balanced 180-crown subsample, fixed seed; from-scratch resnet18
    rs = np.random.RandomState(0)
    ia = rs.permutation(np.where(y_tr == 0)[0])[:90]
    idx_dead = rs.permutation(np.where(y_tr == 1)[0])[:90]
    it = np.concatenate([ia, idx_dead])

    cfg = read_config(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "config.yml"))
    m = AliveDead(cfg, depth=18)
    m.fit_arrays(x_tr[it], y_tr[it], epochs=8, batch_size=16, seed=0)
    metrics = _classification_metrics(m.evaluate_arrays(x_te, batch_size=64),
                                      y_te)
    # calibrated on this exact seed: 0.81 overall, 0.80/0.84 per class;
    # asserted with slack. The bar that matters: BOTH classes learned
    # (an all-Alive predictor scores 0.844 overall but 0.0 on Dead)
    assert metrics["Accuracy"] >= 0.70, metrics
    assert metrics["Dead Accuracy"] >= 0.60, metrics
    assert metrics["Alive Accuracy"] >= 0.60, metrics
