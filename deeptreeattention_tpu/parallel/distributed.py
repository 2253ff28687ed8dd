"""Multi-host (pod / multi-slice) initialization.

Single-host multi-chip needs nothing: the mesh spans local devices and
collectives ride ICI. For TPU pods or multi-slice deployments, call
`initialize()` once per host before any jax computation; the global mesh then
spans all hosts (data-parallel gradient all-reduce stays on ICI within a
slice, DCN only carries the cross-slice reduction — the axis order in
`make_pod_mesh` puts "slice" outermost so GSPMD routes it that way).

This replaces the reference's SLURM-provisioned dask workers for the compute
path; the host-side ETL still fans out per host via cluster.pool and
idempotent per-tile outputs (see SLURM/predict.sh).
"""
import os

import jax
import numpy as np
from jax.sharding import Mesh

from deeptreeattention_tpu.utils.logging import get_logger

log = get_logger(__name__)


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """jax.distributed.initialize with env fallbacks (JAX_COORDINATOR_ADDRESS,
    SLURM_NTASKS/SLURM_PROCID work out of the box on SLURM clusters)."""
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "SLURM_NTASKS" in os.environ:
        num_processes = int(os.environ["SLURM_NTASKS"])
    if process_id is None and "SLURM_PROCID" in os.environ:
        process_id = int(os.environ["SLURM_PROCID"])
    if coordinator_address is None and (num_processes or 1) <= 1:
        log.info("single-process run; skipping jax.distributed.initialize")
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    log.info(
        "distributed initialized: process %d/%d, %d global devices",
        jax.process_index(), jax.process_count(), len(jax.devices()),
    )
    return True


def make_pod_mesh(data_axis="data", slice_axis="slice"):
    """Mesh over all global devices: ("slice", "data") with slices outermost
    so the cross-slice axis maps to DCN and within-slice to ICI."""
    devices = np.asarray(jax.devices())
    n_slices = max(getattr(d, "slice_index", 0) for d in devices) + 1
    if n_slices > 1:
        devices = devices.reshape(n_slices, -1)
        return Mesh(devices, (slice_axis, data_axis))
    return Mesh(devices.reshape(1, -1), (slice_axis, data_axis))


def local_batch_slice(global_batch):
    """This host's shard of a global batch size (per-process data loading)."""
    per = global_batch // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)
