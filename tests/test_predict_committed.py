"""predict.py runs the reference's two-step landscape sweep from COMMITTED
artifacts alone: config.yml's `dead_model` (snapshots/dead_real) and
`species_model_paths` (snapshots/species/*) — no checkpoint overrides, the
way a user would run it after cloning (reference predict.py:135-161 loads
its ~20 replicate checkpoints the same way).

Only the DATA paths are overridden (synthetic OSBS-named tiles in tmp);
model paths come from the committed config.
"""
import glob
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEAD_SNAPSHOT = os.path.join(REPO, "snapshots", "dead_real")
SPECIES_GLOB = os.path.join(REPO, "snapshots", "species", "*", "state.msgpack")

EASTING, NORTHING = 405000, 3286000  # inside the OSBS station bounds


def _build_tiles(root):
    from deeptreeattention_tpu.data.synthetic import make_forest_tile
    from deeptreeattention_tpu.geo import raster
    from deeptreeattention_tpu.geo.affine import Affine

    size, res = 800, 0.1  # 80 m: a handful of crowns, CPU-affordable
    for sub in ("rgb", "hsi", "chm"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    rgb, _ = make_forest_tile(size=size, res=res, seed=7)
    t_rgb = Affine(res, 0, EASTING, 0, -res, NORTHING + size * res)
    rgb_path = os.path.join(
        root, "rgb", "2021_OSBS_5_{}_{}_image.tif".format(EASTING, NORTHING))
    raster.write_raster(rgb_path, np.moveaxis(rgb, -1, 0), transform=t_rgb,
                        crs=32617, tiled=True)
    hsi_px = int(size * res)
    t_1m = Affine(1.0, 0, EASTING, 0, -1.0, NORTHING + size * res)
    rng = np.random.RandomState(8)
    cube = rng.randint(500, 9000, size=(369, hsi_px, hsi_px)).astype(np.int16)
    raster.write_raster(
        os.path.join(root, "hsi",
                     "2021_OSBS_5_{}_{}_image_hyperspectral_2021.tif".format(
                         EASTING, NORTHING)),
        cube, transform=t_1m, crs=32617, tiled=True)
    chm = (np.abs(rng.randn(1, hsi_px, hsi_px)) * 2 + 8).astype(np.float32)
    raster.write_raster(
        os.path.join(root, "chm", "OSBS_{}_{}_CHM.tif".format(EASTING, NORTHING)),
        chm, transform=t_1m, crs=32617, tiled=True)
    return rgb_path


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(DEAD_SNAPSHOT),
                    reason="committed dead snapshot absent")
@pytest.mark.skipif(not glob.glob(SPECIES_GLOB),
                    reason="committed species snapshots absent")
def test_predict_entry_from_committed_artifacts(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("predict_committed"))
    _build_tiles(root)

    overrides = {
        # DATA paths only — dead_model and species_model_paths come from
        # the committed config.yml
        "rgb_sensor_pool": os.path.join(root, "rgb", "*.tif"),
        "HSI_sensor_pool": os.path.join(root, "hsi", "*.tif"),
        "CHM_pool": os.path.join(root, "chm", "*.tif"),
        "convert_h5": False,
        "site": "OSBS",
        "predict_year": "2021",
        "results_dir": os.path.join(root, "results"),
        "prediction_crop_dir": os.path.join(root, "crops"),
        "workers": 0,
        "comet_workspace": None,
    }
    env = dict(os.environ)
    env["DTA_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    result = subprocess.run(
        [sys.executable, "predict.py", "-d", json.dumps(overrides)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800)
    assert result.returncode == 0, result.stderr[-4000:]

    # step 1 artifacts: crowns with dead scores from the committed weights
    crown_shps = glob.glob(os.path.join(root, "results", "crowns", "*.shp"))
    assert crown_shps, result.stderr[-2000:]
    from deeptreeattention_tpu.geo import vector

    crowns = vector.read_file(crown_shps[0])
    assert len(crowns) > 0
    assert "dead_label" in crowns.columns and "dead_score" in crowns.columns
    scores = crowns["dead_score"].astype(float)
    assert np.isfinite(scores).all() and (scores >= 0.5).all()

    # step 2: one result shapefile per committed species replicate
    n_models = len(glob.glob(SPECIES_GLOB))
    shps = glob.glob(os.path.join(root, "results", "*", "*.shp"))
    shps = [s for s in shps if "crowns" not in os.path.dirname(s)]
    assert len(shps) == n_models, (shps, result.stderr[-2000:])
    trees = vector.read_file(shps[0])
    col = "ensembleTa" if "ensembleTa" in trees.columns else "ensembleTaxonID"
    assert len(trees) > 0 and trees[col].notna().all()
