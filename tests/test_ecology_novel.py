"""novel_prediction OOD scoring over a csv of unseen species."""
import os

import numpy as np
import pytest

from deeptreeattention_tpu.models.year import LearnedEnsemble
from deeptreeattention_tpu.train.ecology import novel_prediction
from deeptreeattention_tpu.train.treemodel import TreeModel


def test_novel_prediction(dm, config, tmp_path):
    cfg = dict(config)
    cfg["n_years"] = 3
    model = LearnedEnsemble(years=3, classes=dm.num_classes, bands=cfg["bands"])
    tm = TreeModel(model, dm.num_classes, dm.species_label_dict, config=cfg)

    csv = os.path.join(str(tmp_path), "novel.csv")
    dm.test.head(6).to_csv(csv, index=False)
    out = novel_prediction(tm, csv, cfg)
    assert {"individualID", "top_score", "softmax_score"} <= set(out.columns)
    assert len(out) > 0
    assert (out.softmax_score <= 1).all() and (out.softmax_score > 0).all()
