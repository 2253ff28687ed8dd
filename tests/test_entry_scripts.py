"""CLI entry-script smoke tests: drive train.py / train_dead.py exactly as a
user would (subprocess + -d JSON overrides), on the fixture artifact."""
import glob
import json
import os
import subprocess
import sys

import pytest


def _run(script, overrides, root, extra_args=(), timeout=600):
    env = dict(os.environ)
    env["DTA_PLATFORM"] = "cpu"
    # explicit (conftest already exported an 8-device XLA_FLAGS): CLI
    # subprocesses run a small 2-device mesh on this 1-core host
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    cmd = [sys.executable, script, *extra_args, "-d", json.dumps(overrides)]
    return subprocess.run(
        cmd, cwd=root, env=env, capture_output=True, text=True, timeout=timeout
    )


@pytest.fixture(scope="module")
def overrides(ROOT, fixtures_dir):
    # stale checkpoints from an earlier run would make the entry assertions
    # pass vacuously
    import shutil

    shutil.rmtree("/tmp/dta_test_snapshots", ignore_errors=True)
    artifact = os.path.join(fixtures_dir, "artifact")
    return {
        "use_data_commit": "artifact",
        "data_dir": fixtures_dir,
        "csv_file": os.path.join(fixtures_dir, "sample_neon.csv"),
        "rgb_sensor_pool": os.path.join(fixtures_dir, "rgb", "*.tif"),
        "HSI_sensor_pool": os.path.join(fixtures_dir, "hsi", "*.tif"),
        "CHM_pool": os.path.join(fixtures_dir, "chm", "*.tif"),
        "bands": 8,
        "batch_size": 4,
        "workers": 0,
        "epochs": 1,
        "fast_dev_run": True,
        "preload_images": False,
        "convert_h5": False,
        "min_CHM_height": None,
        "megaplot_dir": None,
        "iterations": 1,
        "compute_dtype": "float32",
        "plot_n_individuals": 0,
        "snapshot_dir": "/tmp/dta_test_snapshots",
        "dead": {
            "train_dir": os.path.join(fixtures_dir, "dead", "train"),
            "test_dir": os.path.join(fixtures_dir, "dead", "test"),
            "epochs": 1, "lr": 0.0001,
            "savedir": "/tmp/dta_test_snapshots/dead",
            "batch_size": 2, "num_workers": 0,
        },
    }


@pytest.mark.slow
def test_train_entry(ROOT, overrides):
    result = _run("train.py", overrides, ROOT, extra_args=["testbranch", "deadbeef"])
    assert result.returncode == 0, result.stderr[-4000:]
    # a checkpoint directory was written
    snaps = glob.glob("/tmp/dta_test_snapshots/*/state.msgpack")
    assert snaps, result.stdout[-2000:]


@pytest.mark.slow
def test_train_dead_entry(ROOT, overrides):
    result = _run("train_dead.py", overrides, ROOT)
    assert result.returncode == 0, result.stderr[-4000:]
    snaps = glob.glob("/tmp/dta_test_snapshots/dead/*/state.msgpack")
    assert snaps, result.stdout[-2000:]


@pytest.mark.slow
def test_predict_entry(ROOT, overrides, m, config, tmp_path_factory):
    """Full landscape sweep CLI: crowns -> dead scores -> crops -> species
    shapefiles, idempotent across reruns."""
    out_root = str(tmp_path_factory.mktemp("predict_cli"))
    species_ckpt = os.path.join(out_root, "species_model")
    m.save_checkpoint(species_ckpt)

    from deeptreeattention_tpu.models import dead as dead_mod

    dead_model = dead_mod.AliveDead(config=config, depth=18)
    dead_ckpt = os.path.join(out_root, "dead_model")
    dead_model.save_checkpoint(dead_ckpt)

    ov = dict(overrides)
    ov.update(
        {
            "site": "HARV",
            "predict_year": "2019",
            "results_dir": os.path.join(out_root, "results"),
            "prediction_crop_dir": os.path.join(out_root, "crops"),
            "species_model_paths": [species_ckpt],
            "dead_model": dead_ckpt,
            "dead_depth": 18,
        }
    )
    result = _run("predict.py", ov, ROOT, timeout=900)
    assert result.returncode == 0, result.stderr[-4000:]
    shps = glob.glob(os.path.join(out_root, "results", "species_model", "*.shp"))
    assert shps, result.stdout[-3000:] + result.stderr[-2000:]

    # NO TILE SKIPPED: every matched RGB tile must yield crowns + a result
    # shapefile (predict.py's per-tile try/except must not have eaten one)
    sys.path.insert(0, ROOT)
    import predict as predict_entry

    from deeptreeattention_tpu.utils.config import read_config

    cfg_all = read_config(os.path.join(ROOT, "config.yml"), overrides=ov,
                          parse_cli=False)
    tiles = predict_entry.find_rgb_files(site="HARV", config=cfg_all,
                                         year="2019", bounds=None)
    assert len(tiles) >= 1
    crown_shps = glob.glob(os.path.join(out_root, "results", "crowns", "*.shp"))
    assert len(crown_shps) == len(tiles), (tiles, crown_shps)
    assert len(shps) == len(tiles), (tiles, shps)
    assert "failed to build crowns" not in result.stderr
    assert "failed to generate prediction crops" not in result.stderr

    from deeptreeattention_tpu.geo import vector

    trees = vector.read_file(shps[0])
    col = "ensembleTa" if "ensembleTa" in trees.columns else "ensembleTaxonID"
    assert len(trees) > 0
    assert trees[col].notna().all()

    # idempotent rerun: outputs exist, so the sweep should be quick and clean
    result2 = _run("predict.py", ov, ROOT, timeout=600)
    assert result2.returncode == 0, result2.stderr[-3000:]


def test_train_detector_entry(ROOT, fixtures_dir, tmp_path):
    """train_detector.py: fit the CenterNet on fixture crown boxes and write
    a checkpoint loadable through the detector factory."""
    rgb = sorted(glob.glob(os.path.join(fixtures_dir, "rgb", "*.tif")))[0]
    labels = os.path.join(fixtures_dir, "artifact", "crowns.shp")
    savedir = str(tmp_path / "det")
    overrides = {
        "detector_train": {
            "tiles": [rgb],
            "labels": [labels],
            "savedir": savedir,
            "patch": 64,
            "steps": 30,
            "width": 8,
            "crops_per_tile": 8,
            "batch_size": 4,
        }
    }
    result = _run("train_detector.py", overrides, ROOT, timeout=900)
    assert result.returncode == 0, result.stderr[-4000:]
    summary = json.loads(result.stdout.strip().splitlines()[-1])
    assert summary["final_loss"] < summary["first_loss"]

    from deeptreeattention_tpu.data.detection import load_detector

    det = load_detector({"crown_detector": savedir})
    boxes = det.predict_tile(rgb)
    assert boxes is None or set(["xmin", "ymin", "xmax", "ymax"]) <= set(boxes.columns)
