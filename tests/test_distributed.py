"""Multi-host helper tests (single-process paths; pod paths are exercised by
the driver's dryrun and real deployments)."""
import jax
import numpy as np
import pytest

from deeptreeattention_tpu.parallel import distributed


def test_initialize_noop_single_process(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("SLURM_NTASKS", raising=False)
    assert distributed.initialize() is False


def test_make_pod_mesh_single_slice():
    mesh = distributed.make_pod_mesh()
    assert mesh.axis_names == ("slice", "data")
    assert mesh.shape["slice"] == 1
    assert mesh.shape["data"] == len(jax.devices())


def test_local_batch_slice_single_process():
    sl = distributed.local_batch_slice(128)
    assert (sl.start, sl.stop) == (0, 128)


def _run_two_workers(mode, timeout=300, extra_env=None):
    """Spawn 2 coordinator-connected worker processes; return their stdouts."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:  # free port for the coordinator
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers pick their own device count
    env["DTA_PLATFORM"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # APPEND (CLAUDE.md): replacing PYTHONPATH drops /root/.axon_site and
    # with it the TPU backend registration in subprocesses
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env.update(extra_env or {})
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)), "distributed_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", port, mode],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=timeout)
        assert p.returncode == 0, err[-3000:]
        outs.append(out)
    return outs


def test_two_process_distributed_allreduce():
    """Real jax.distributed: two OS processes, 2 CPU devices each, one
    coordinator, a cross-process all-reduce over the pod mesh, and
    local_batch_slice sharding — initialize/make_pod_mesh beyond world
    size 1 (reference's dask cluster analogue, exercised like its
    test_generate local-Client test)."""
    outs = _run_two_workers("allreduce")
    # sum(range(4)) == 6 reduced across both processes
    assert all("DISTOK 6.0" in o for o in outs), outs


def test_two_process_multistage_fit_matches_single(dm, config):
    """THE production multi-host path: MultiStage.fit(fast_dev_run) runs in
    two OS processes on one pod mesh (resolve_mesh auto-detect, global
    batches assembled from process-local rows) and its per-level train/val
    losses equal the single-process single-device run."""
    import numpy as np

    from deeptreeattention_tpu.models.multi_stage import MultiStage

    # single-process reference, no mesh; batch_size matches the workers'
    # (divisible by their 4-device pod mesh -> identical batch contents)
    cfg = dict(config)
    cfg["mesh_devices"] = 1
    cfg["batch_size"] = 4
    ref = MultiStage(train_df=dm.train, test_df=dm.test, crowns=dm.crowns, config=cfg)
    rec = ref.fit(fast_dev_run=True)[0]

    outs = _run_two_workers("multistage", timeout=900)
    lines = [
        l for o in outs for l in o.splitlines() if l.startswith("MSLOSS ")
    ]
    assert len(lines) == 2, outs
    # both processes observed identical (replicated) losses
    assert lines[0] == lines[1], lines
    train_s, val_s = lines[0][len("MSLOSS "):].split("|")
    pod_train = [float(x) for x in train_s.split(",")]
    pod_val = [float(x) for x in val_s.split(",")]
    np.testing.assert_allclose(pod_train, rec["train_loss"], atol=2e-4)
    np.testing.assert_allclose(pod_val, rec["val_loss"], atol=2e-4)


def test_two_process_predict_fanout_no_tile_skipped(m, config, tmp_path):
    """predict.py's multi-host mode: two processes partition the tile list,
    each sweeps on a LOCAL-device mesh (no cross-process collectives), and
    every tile yields a result shapefile matching the single-process run."""
    import glob
    import os

    import numpy as np
    import pandas as pd

    from deeptreeattention_tpu.geo import geometry, vector
    from deeptreeattention_tpu.predict import tiles as predict_api

    ckpt = m.save_checkpoint(str(tmp_path / "species_ckpt"))
    out_dir = str(tmp_path / "fanout")
    os.makedirs(out_dir, exist_ok=True)

    outs = _run_two_workers(
        "predict", timeout=900,
        extra_env={"DTA_TEST_CKPT": ckpt, "DTA_TEST_OUT": out_dir},
    )
    assert all("PREDOK" in o for o in outs), outs

    fixtures_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
    tiles = sorted(glob.glob(os.path.join(fixtures_dir, "rgb", "*.tif")))
    shps = sorted(glob.glob(os.path.join(out_dir, "*.shp")))
    assert len(shps) == len(tiles), (tiles, shps)  # nothing skipped

    # content matches a single-process sweep of the same crowns
    ref_dir = str(tmp_path / "ref")
    for rgb in tiles:
        crowns = vector.GeoDataFrame(
            pd.DataFrame({"individual": ["p1", "p2"]}),
            geometry=[
                geometry.box(726020, 4699020, 726024, 4699024),
                geometry.box(726060, 4699120, 726066, 4699126),
            ],
            crs=32617,
        )
        crowns["RGB_tile"] = rgb
        predict_api.predict_tile_ondevice(crowns, m=m, config=config,
                                          savedir=ref_dir)
    for shp in shps:
        got = vector.read_file(shp).sort_values("individual").reset_index(drop=True)
        ref = vector.read_file(os.path.join(ref_dir, os.path.basename(shp)))
        ref = ref.sort_values("individual").reset_index(drop=True)
        col = "ensembleTa" if "ensembleTa" in got.columns else "ensembleTaxonID"
        assert list(got[col]) == list(ref[col])
        np.testing.assert_allclose(
            got.ens_score.astype(float), ref.ens_score.astype(float), atol=1e-4
        )
