"""CLI smoke tests for the post-processing entry points: abundance.py,
create_prediction_shp.py, sample_multinomial.py, mine.py."""
import glob
import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

from deeptreeattention_tpu.geo import geometry, vector


def _run(script, overrides, root, timeout=300):
    env = dict(os.environ)
    env["DTA_PLATFORM"] = "cpu"
    cmd = [sys.executable, script, "-d", json.dumps(overrides)]
    return subprocess.run(cmd, cwd=root, env=env, capture_output=True, text=True,
                          timeout=timeout)


@pytest.fixture(scope="module")
def results_dir(tmp_path_factory):
    """A fake experiment results tree with two predicted tile shapefiles."""
    root = tmp_path_factory.mktemp("results")
    exp = root / "model_a"
    exp.mkdir()
    rng = np.random.RandomState(0)
    for t, easting in [("726000", 726000), ("727000", 727000)]:
        n = 30
        gdf = vector.GeoDataFrame(
            pd.DataFrame(
                {
                    "ensembleTaxonID": ["PIPA2"] * 18 + ["QULA2"] * 9 + ["DEAD"] * 3,
                    "ens_score": np.concatenate([rng.uniform(0.6, 1, 27), [np.nan] * 3]),
                    "tile_year": ["2021"] * n,
                }
            ),
            geometry=[geometry.box(easting + i, 0, easting + i + 1, 1) for i in range(n)],
            crs=32617,
        )
        gdf.to_file(str(exp / "{}_3282000_image.shp".format(t)))
    confusion = pd.DataFrame(
        {"predicted": ["PIPA2", "QULA2"], "PIPA2": [0.9, 0.2], "QULA2": [0.1, 0.8]}
    )
    confusion.to_csv(str(root / "confusion.csv"))
    return str(root)


def test_abundance_cli(ROOT, results_dir):
    result = _run("abundance.py", {"results_dir": results_dir, "workers": 1}, ROOT)
    assert result.returncode == 0, result.stderr[-2000:]
    out = pd.read_csv(os.path.join(results_dir, "abundance.csv"))
    assert set(out.columns) == {"model", "taxonID", "crowns"}
    assert out.crowns.sum() == 60


def test_create_prediction_shp_cli(ROOT, results_dir):
    result = _run(
        "create_prediction_shp.py",
        {"results_dir": results_dir, "experiment_key": "model_a"}, ROOT,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    merged = vector.read_file(os.path.join(results_dir, "model_a_predictions.shp"))
    assert len(merged) == 60


def test_sample_multinomial_cli(ROOT, results_dir):
    result = _run(
        "sample_multinomial.py",
        {
            "results_dir": results_dir, "experiment_key": "model_a",
            "n_permutations": 2, "workers": 1,
            "confusion_path": os.path.join(results_dir, "confusion.csv"),
            "predict_year": "2021",
        },
        ROOT,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    perms = glob.glob(os.path.join(results_dir, "model_a", "multinomial_permutation_*.csv"))
    assert len(perms) == 2
    counts = pd.read_csv(perms[0], index_col=0)
    assert counts.iloc[:, 0].sum() == 60


def test_mine_cli(ROOT, fixtures_dir, tmp_path_factory):
    mining = str(tmp_path_factory.mktemp("mining"))
    result = _run(
        "mine.py",
        {
            "HSI_sensor_pool": os.path.join(fixtures_dir, "hsi", "*.tif"),
            "mining_dir": mining, "n_crops": 12, "workers": 1,
        },
        ROOT,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    mined = pd.read_csv(os.path.join(mining, "mined.csv"))
    assert len(mined) >= 12
    sample = np.load(os.path.join(mining, mined.image_path.iloc[0]))
    assert sample.ndim == 3 and sample.shape[0] == 28
