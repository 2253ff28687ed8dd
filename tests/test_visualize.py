"""Visualization tests: crown plot rendering + confusion matrix logging."""
import glob
import os

import numpy as np
import pandas as pd

from deeptreeattention_tpu.geo import vector
from deeptreeattention_tpu.utils import visualize
from deeptreeattention_tpu.utils.logging import Experiment


def test_plot_crown(fixtures_dir, tmp_path):
    crowns = vector.read_file(os.path.join(fixtures_dir, "artifact", "crowns.shp"))
    points = vector.read_file(os.path.join(fixtures_dir, "artifact", "canopy_points.shp"))
    rgb_pool = glob.glob(os.path.join(fixtures_dir, "rgb", "*.tif"))
    individual = crowns.individual.iloc[0]
    out = visualize.plot_crown(individual, crowns, points, rgb_pool, savedir=str(tmp_path))
    assert os.path.exists(out)
    assert os.path.getsize(out) > 1000


def test_confusion_matrix_logging(tmp_path):
    exp = Experiment(savedir=str(tmp_path))
    results = pd.DataFrame(
        {"label": [0, 1, 1, 2], "pred_label_top1": [0, 1, 0, 2]}
    )
    out = visualize.confusion_matrix(exp, results, {"A": 0, "B": 1, "C": 2})
    assert np.asarray(out["matrix"]).sum() == 4
    assert os.path.exists(os.path.join(exp.dir, "confusion_matrix.json"))


def test_confusion_matrix_array():
    results = pd.DataFrame({"label": [0, 1], "pred_label_top1": [1, 1]})
    mat = visualize.confusion_matrix_array(results, 2)
    np.testing.assert_array_equal(mat, [[0, 1], [0, 1]])
