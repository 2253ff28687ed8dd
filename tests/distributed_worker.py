"""Subprocess body for the multi-process jax.distributed tests.

Usage: python tests/distributed_worker.py <process_id> <num_processes> <port> [mode]

Modes:
  allreduce  (default) — pod-mesh all-reduce smoke; prints "DISTOK <total>".
  multistage — REAL production path: MultiStage.fit(fast_dev_run) over a pod
      mesh spanning both OS processes (resolve_mesh auto-detects the pod,
      shard_batch assembles global batches from process-local rows); prints
      "MSLOSS <train losses>|<val losses>" for equality checks against the
      single-process run.
"""
import os
import sys


def _init(process_id, num_processes, port):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    from deeptreeattention_tpu.parallel import distributed as D

    assert D.initialize(
        coordinator_address="localhost:{}".format(port),
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes
    return jax


def allreduce(process_id, num_processes, port):
    jax = _init(process_id, num_processes, port)
    from deeptreeattention_tpu.parallel import distributed as D

    mesh = D.make_pod_mesh()
    assert mesh.devices.size == 2 * num_processes, mesh.devices.shape

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.devices.size
    sharding = NamedSharding(mesh, P(("slice", "data")))
    # each process contributes its local shards of [0, 1, ..., n)
    arr = jax.make_array_from_callback(
        (n,), sharding, lambda idx: np.arange(n, dtype=np.float32)[idx]
    )
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
    # device->host read forces the cross-process reduction
    total = float(np.asarray(jax.device_get(total)))
    sl = D.local_batch_slice(8)
    assert sl == slice(4 * process_id, 4 * process_id + 4), sl
    print("DISTOK {:.1f}".format(total), flush=True)


def multistage(process_id, num_processes, port):
    jax = _init(process_id, num_processes, port)

    from tests.make_fixtures import fixture_config

    fixtures_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
    cfg = fixture_config(fixtures_dir)
    # divisible by the 4-device pod mesh so shard_batch adds no padding rows
    # (padding would shift BN batch statistics vs the single-process run;
    # the Loader's own pad-to-batch_size is identical in both runs)
    cfg["batch_size"] = 4

    from deeptreeattention_tpu.data.datamodule import TreeData
    from deeptreeattention_tpu.models.multi_stage import MultiStage
    from deeptreeattention_tpu.parallel import spans_processes

    artifact = os.path.join(fixtures_dir, "artifact")
    dm = TreeData(
        csv_file=os.path.join(artifact, "train.csv"),
        config=cfg, data_dir=artifact, debug=True,
    )
    m = MultiStage(train_df=dm.train, test_df=dm.test, crowns=dm.crowns, config=cfg)
    # resolve_mesh must have auto-built the pod mesh over BOTH processes
    assert m.mesh is not None and m.mesh.devices.size == 2 * num_processes, m.mesh
    assert spans_processes(m.mesh)

    history = m.fit(fast_dev_run=True)
    rec = history[0]
    print(
        "MSLOSS "
        + ",".join("%.6f" % l for l in rec["train_loss"])
        + "|"
        + ",".join("%.6f" % l for l in rec["val_loss"]),
        flush=True,
    )


def predict_fanout(process_id, num_processes, port):
    """Multi-host tile sweep (predict.py's production mode): each process
    takes a stride of the tile list and predicts it on a mesh of its OWN
    devices (mesh_scope=local) — per-tile outputs are idempotent files.
    Env: DTA_TEST_CKPT (MultiStage checkpoint), DTA_TEST_OUT (savedir)."""
    import glob

    jax = _init(process_id, num_processes, port)

    from tests.make_fixtures import fixture_config

    fixtures_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
    cfg = fixture_config(fixtures_dir)
    cfg["mesh_scope"] = "local"  # predict.py sets this for multi-process runs

    from deeptreeattention_tpu.models.multi_stage import MultiStage
    from deeptreeattention_tpu.parallel import spans_processes

    m = MultiStage.load_from_checkpoint(os.environ["DTA_TEST_CKPT"], config=cfg)
    # local fan-out mode: the mesh covers only THIS host's devices
    assert m.mesh is not None and m.mesh.devices.size == 2, m.mesh
    assert not spans_processes(m.mesh)

    import pandas as pd

    from deeptreeattention_tpu.geo import geometry, vector
    from deeptreeattention_tpu.predict import tiles as predict_api

    tiles = sorted(glob.glob(os.path.join(fixtures_dir, "rgb", "*.tif")))
    tiles = tiles[process_id::num_processes]  # predict.py's partition
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
        predict_api.predict_tile_ondevice(
            crowns, m=m, config=cfg, savedir=os.environ["DTA_TEST_OUT"]
        )
    print("PREDOK {}".format(len(tiles)), flush=True)


def main():
    process_id, num_processes, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "allreduce"
    if mode == "multistage":
        multistage(process_id, num_processes, port)
    elif mode == "predict":
        predict_fanout(process_id, num_processes, port)
    else:
        allreduce(process_id, num_processes, port)


if __name__ == "__main__":
    main()
