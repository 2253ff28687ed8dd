"""Multinomial abundance sampling tests (pattern: reference
tests/test_multinomial.py)."""
import os

import numpy as np
import pandas as pd
import pytest

from deeptreeattention_tpu.geo import geometry, vector
from deeptreeattention_tpu.predict import multinomial


@pytest.fixture()
def confusion_csv(tmp_path):
    df = pd.DataFrame(
        {
            "predicted": ["PIPA2", "QULA2"],
            "PIPA2": [0.9, 0.2],
            "QULA2": [0.1, 0.8],
        }
    )
    path = str(tmp_path / "confusion.csv")
    df.to_csv(path)
    return path


@pytest.fixture()
def tile_shp(tmp_path):
    n = 50
    rng = np.random.RandomState(0)
    gdf = vector.GeoDataFrame(
        pd.DataFrame(
            {
                "ensembleTaxonID": ["PIPA2"] * 30 + ["QULA2"] * 15 + ["DEAD"] * 5,
                "ens_score": np.concatenate([rng.uniform(0.7, 1, 45), [np.nan] * 5]),
                "tile_year": ["2021"] * n,
            }
        ),
        geometry=[geometry.box(i, 0, i + 1, 1) for i in range(n)],
        crs=32617,
    )
    path = str(tmp_path / "t_image.shp")
    gdf.to_file(path)
    return path


def test_run_counts(tile_shp, confusion_csv):
    counts = multinomial.run(tile_shp, confusion_path=confusion_csv, seed=1)
    assert counts.sum() == 50
    assert counts.get("DEAD", 0) == 5  # nan scores keep their label
    assert set(counts.index) <= {"PIPA2", "QULA2", "DEAD"}


def test_run_is_stochastic_but_seeded(tile_shp, confusion_csv):
    a = multinomial.run(tile_shp, confusion_path=confusion_csv, seed=1)
    b = multinomial.run(tile_shp, confusion_path=confusion_csv, seed=1)
    pd.testing.assert_series_equal(a, b)


def test_wrapper_writes_csv(tile_shp, confusion_csv, tmp_path):
    shp_dir = os.path.dirname(tile_shp)
    exp_dir = os.path.join(shp_dir, "exp1")
    os.makedirs(exp_dir, exist_ok=True)
    for ext in [".shp", ".shx", ".dbf", ".prj", ".cpg"]:
        src = tile_shp.replace(".shp", ext)
        if os.path.exists(src):
            import shutil

            shutil.copy(src, os.path.join(exp_dir, os.path.basename(src)))
    total = multinomial.wrapper(
        client=None, iteration=0, experiment_key="exp1", shp_dir=shp_dir,
        savedir=str(tmp_path), confusion_path=confusion_csv, year="2021",
    )
    assert total.sum() == 50
    assert os.path.exists(os.path.join(str(tmp_path), "exp1", "multinomial_permutation_0.csv"))


def test_wrapper_all_matches_per_iteration(tile_shp, confusion_csv, tmp_path):
    """Tile-major wrapper_all (one tile load, all permutations) writes the
    same per-permutation totals as sequential wrapper() calls."""
    shp_dir, key = os.path.split(os.path.dirname(tile_shp))
    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    n = 4
    for it in range(n):
        multinomial.wrapper(client=None, iteration=it, experiment_key=key,
                            shp_dir=shp_dir, savedir=out_a,
                            confusion_path=confusion_csv)
    multinomial.wrapper_all(client=None, n_permutations=n, experiment_key=key,
                            shp_dir=shp_dir, savedir=out_b,
                            confusion_path=confusion_csv)
    for it in range(n):
        a = pd.read_csv(os.path.join(out_a, key, "multinomial_permutation_{}.csv".format(it)))
        b = pd.read_csv(os.path.join(out_b, key, "multinomial_permutation_{}.csv".format(it)))
        pd.testing.assert_frame_equal(a, b)
