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
