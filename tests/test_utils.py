"""Config reader, experiment logger, futures pool, profiling, misc utils."""
import json
import os
import sys
import time

import numpy as np
import pandas as pd
import pytest

from deeptreeattention_tpu import cluster
from deeptreeattention_tpu.utils import misc, profiling
from deeptreeattention_tpu.utils.config import default_config, merge, read_config
from deeptreeattention_tpu.utils.logging import Experiment


def test_default_config_keys():
    cfg = default_config()
    # reference key surface present
    for key in ["rgb_sensor_pool", "min_stem_diameter", "image_size", "bands",
                "lr_0", "lr_4", "dead", "use_data_commit", "batch_size"]:
        assert key in cfg, key
    # TPU-native additions
    assert cfg["mesh_axis"] == "data"


def test_read_config_cli_override(tmp_path, monkeypatch):
    path = str(tmp_path / "c.yml")
    with open(path, "w") as f:
        f.write("batch_size: 4\nworkers: 2\n")
    monkeypatch.setattr(
        sys, "argv", ["prog", "-d", json.dumps({"batch_size": 99, "new_key": "x"})]
    )
    cfg = read_config(path)
    assert cfg["batch_size"] == 99
    assert cfg["new_key"] == "x"
    assert cfg["workers"] == 2


def test_merge_is_functional():
    a = default_config()
    b = merge(a, batch_size=1)
    assert a["batch_size"] != 1 and b["batch_size"] == 1


def test_experiment_logging(tmp_path):
    exp = Experiment(savedir=str(tmp_path))
    exp.log_parameter("lr", 1e-3)
    exp.log_metric("loss", 0.5, epoch=1)
    exp.log_metrics({"a": 1, "b": 2}, prefix="val")
    exp.log_table("t.csv", pd.DataFrame({"x": [1, 2]}))
    exp.log_confusion_matrix([0, 1, 1], [0, 1, 0], labels=["A", "B"])
    exp.add_tag("test")
    exp.end()
    assert os.path.exists(os.path.join(exp.dir, "metrics.jsonl"))
    with open(os.path.join(exp.dir, "metrics.jsonl")) as f:
        lines = [json.loads(l) for l in f]
    assert any(l["name"] == "loss" for l in lines)
    assert any(l["name"] == "val_a" for l in lines)
    with open(os.path.join(exp.dir, "params.json")) as f:
        params = json.load(f)
    assert params["params"]["lr"] == 1e-3 and "test" in params["tags"]
    assert os.path.exists(os.path.join(exp.dir, "t.csv"))
    with open(os.path.join(exp.dir, "confusion_matrix.json")) as f:
        cm = json.load(f)
    assert cm["matrix"][1] == [1, 1]


def test_local_pool_submit_map_wait():
    client = cluster.start(cpus=2)
    futures = client.map(lambda x: x * 2, range(5))
    client.wait(futures)
    assert [f.result() for f in futures] == [0, 2, 4, 6, 8]
    bad = client.submit(lambda: 1 / 0)
    client.wait([bad])
    assert bad.exception() is not None
    # dask semantics: gather raises on a failed task by default
    import pytest

    with pytest.raises(ZeroDivisionError):
        client.gather(futures + [bad])
    # opt-in log-and-continue keeps the reference pipeline's behavior
    assert client.gather(futures + [bad], skip_errors=True) == [0, 2, 4, 6, 8]
    client.close()


def test_stage_timer():
    timer = profiling.StageTimer()
    with timer.stage("io"):
        time.sleep(0.01)
    with timer.stage("io"):
        pass
    summary = timer.log()
    assert summary["io"]["calls"] == 2
    assert summary["io"]["total_s"] >= 0.01


def test_tee_experiment(tmp_path):
    from deeptreeattention_tpu.utils.logging import Experiment, TeeExperiment

    a = Experiment(savedir=str(tmp_path / "a"))
    b = Experiment(savedir=str(tmp_path / "b"))

    class Broken:
        def log_metric(self, *a, **k):
            raise RuntimeError("down")

    tee = TeeExperiment(a, b, Broken())
    tee.log_metric("x", 1.0)
    tee.log_parameter("p", 2)
    tee.add_tag("t")
    for exp in (a, b):
        assert os.path.exists(os.path.join(exp.dir, "metrics.jsonl"))
    assert tee.get_key() == a.get_key()
    # plain attributes resolve from the primary experiment (train.py logs
    # experiment.dir at the end of a run)
    assert tee.dir == a.dir


def test_profiler_trace_smoke(tmp_path):
    import jax.numpy as jnp

    from deeptreeattention_tpu.utils import profiling

    out = str(tmp_path / "trace")
    with profiling.trace(out):
        with profiling.annotate("work"):
            jnp.sum(jnp.ones(16)).block_until_ready()
    assert os.path.exists(out)
    assert any(os.scandir(out))


def test_cprofile_context(tmp_path):
    from deeptreeattention_tpu.utils import profiling

    path = str(tmp_path / "prof.pstats")
    with profiling.cprofile_to(path):
        sum(range(1000))
    assert os.path.getsize(path) > 0


def test_predictions_to_df():
    preds = [(np.array(["a", "b"]), np.random.rand(2, 3)),
             (np.array(["c"]), np.random.rand(1, 3))]
    df = misc.predictions_to_df(preds)
    assert len(df) == 3
    assert list(df.individual) == ["a", "b", "c"]


def test_trainer_facade_checkpointing(tmp_path):
    """Lightning-shaped Trainer honors enable_checkpointing/default_root_dir."""
    from deeptreeattention_tpu.train.trainer import Trainer

    class Stub:
        def fit(self, epochs=None, experiment=None, fast_dev_run=False):
            return [{"epoch": 0}]

        def save_checkpoint(self, path):
            os.makedirs(path, exist_ok=True)
            with open(os.path.join(path, "ok"), "w") as f:
                f.write("1")
            return path

    t = Trainer(max_epochs=1, default_root_dir=str(tmp_path / "snaps"))
    t.fit(Stub())
    assert os.path.exists(os.path.join(str(tmp_path), "snaps", "last", "ok"))

    t2 = Trainer(max_epochs=1, enable_checkpointing=False,
                 default_root_dir=str(tmp_path / "nosnaps"))
    t2.fit(Stub())
    assert not os.path.exists(os.path.join(str(tmp_path), "nosnaps"))
