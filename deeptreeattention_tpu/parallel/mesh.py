"""Device mesh + data-parallel sharding utilities.

This framework's scale-out model (replaces the reference's single-GPU
Lightning + dask CPU fan-out, SURVEY.md §2 "parallelism strategies"): a 1-D
``jax.sharding.Mesh`` over the batch axis. Batches are placed with
``NamedSharding(P("data"))`` on their leading axis, parameters are
replicated, and ``jit`` (GSPMD) inserts the gradient all-reduces over ICI.
Multi-host expansion is the same code with ``jax.distributed.initialize`` —
the mesh simply spans more devices.
"""
import collections
import itertools
import os
import zlib

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=-1, axis="data", devices=None):
    if devices is None:
        devices = jax.devices()
    if n_devices in (-1, None):
        n_devices = len(devices)
    return Mesh(np.array(devices[:n_devices]), (axis,))


def resolve_mesh(config=None, mesh=None):
    """Mesh precedence: explicit mesh > pod mesh when running multi-process
    (after `parallel.distributed.initialize()`) > config["mesh_devices"]
    (-1 = all devices) > None (single-device).

    config["mesh_scope"]="local" keeps the mesh to THIS host's devices even
    in a multi-process run — the per-tile fan-out mode (each host sweeps its
    own tile partition independently; collectives stay on local ICI), versus
    the default global mesh where every process executes the same program in
    lockstep (synchronized data-parallel training).

    config["model_parallel"] > 1 builds a 2-D ("data", "model") mesh: the
    batch shards over "data", year-stacked LearnedEnsemble parameters over
    "model" (parallel/train.place_variables). Single-process (or
    mesh_scope=local) only — a pod's DCN axis stays data-parallel."""
    if mesh is not None:
        return mesh
    cfg = config or {}
    local_scope = cfg.get("mesh_scope") == "local"
    mp = int(cfg.get("model_parallel") or 1)
    if not local_scope and jax.process_count() > 1:
        if mp > 1:
            raise ValueError(
                "model_parallel > 1 is single-process (or mesh_scope=local) "
                "only; pod meshes are data-parallel over DCN")
        from deeptreeattention_tpu.parallel.distributed import make_pod_mesh

        return make_pod_mesh()
    devices = jax.local_devices() if local_scope else jax.devices()
    n = cfg.get("mesh_devices")
    if mp > 1:
        from deeptreeattention_tpu.parallel.train import make_mesh_2d

        if n in (None, 0, -1):
            n = len(devices)
        return make_mesh_2d(n, model_parallel=mp, devices=devices)
    if n in (None, 0, 1):
        return None
    if n == -1:
        n = len(devices)
    return make_mesh(n, devices=devices) if n > 1 else None


def _batch_axes(mesh, axis=None):
    """Mesh axes the batch shards over: every axis EXCEPT "model" (a
    2-D data x model mesh replicates the batch across the model groups; a
    pod ("slice", "data") mesh shards over both — within-slice portions ride
    ICI, the outer axis DCN)."""
    if axis is not None:
        return axis if isinstance(axis, tuple) else (axis,)
    names = tuple(a for a in mesh.axis_names if a != "model")
    return names or mesh.axis_names


def data_sharding(mesh, axis=None):
    names = _batch_axes(mesh, axis)
    return NamedSharding(mesh, P(names if len(names) > 1 else names[0]))


def _spans_processes(mesh):
    pid = jax.process_index()
    return any(d.process_index != pid for d in mesh.devices.flat)


def replicated(mesh):
    return NamedSharding(mesh, P())


def _pad_to(arr, n):
    if arr.shape[0] == n:
        return arr
    pad = n - arr.shape[0]
    widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, widths)


# Cross-host batch-consistency check: shard_batch's multihost path assumes
# every process built a bit-identical global batch (seeded loaders). Any
# divergence (glob order, fixture drift) silently assembles a wrong global
# array. Set DTA_VERIFY_GLOBAL_BATCH=N to all-gather a CRC of the batch
# every Nth shard_batch call and raise on mismatch (N=1: every call).
_VERIFY_EVERY = int(os.environ.get("DTA_VERIFY_GLOBAL_BATCH", "0") or 0)
_verify_calls = itertools.count()


def _batch_crc(batch):
    items = sorted(batch.items()) if isinstance(batch, dict) else [("", batch)]
    h = 0
    for k, v in items:
        v = np.ascontiguousarray(np.asarray(v))
        h = zlib.crc32(str((k, v.dtype.str, v.shape)).encode(), h)
        h = zlib.crc32(v.tobytes(), h)
    return h


def _verify_global_batch(batch):
    from jax.experimental import multihost_utils

    crc = _batch_crc(batch)
    gathered = multihost_utils.process_allgather(np.array([crc], np.int64))
    if not (np.asarray(gathered) == crc).all():
        raise RuntimeError(
            "shard_batch: processes disagree on the global batch "
            "(per-process CRCs {}); seeded loaders must produce identical "
            "rows on every host".format(np.asarray(gathered).ravel().tolist())
        )


def shard_batch(batch, mesh, axis=None):
    """Place a dict/array batch with the leading axis sharded over the mesh.

    Pads the leading axis up to a multiple of the mesh size (padded rows are
    zeros; pair with a "mask" entry to drop them in the loss).

    Every process passes the same GLOBAL batch (loaders are seeded, so hosts
    agree; set DTA_VERIFY_GLOBAL_BATCH=N to check). On a mesh that spans
    processes, `jax.device_put` cannot place onto non-addressable devices —
    each process instead contributes its own `local_batch_slice` rows via
    `jax.make_array_from_process_local_data`, and the global array assembles
    without any cross-host data movement.
    """
    sharding = data_sharding(mesh, axis)
    # pad to the batch-shard count, not total devices: a 2-D data x model
    # mesh replicates the batch over "model"
    n = int(np.prod([mesh.shape[a] for a in _batch_axes(mesh, axis)]))
    multihost = _spans_processes(mesh)
    if multihost and _VERIFY_EVERY and next(_verify_calls) % _VERIFY_EVERY == 0:
        _verify_global_batch(batch)

    def place(x):
        x = np.asarray(x)
        if x.dtype.kind in "US":  # host-side strings stay on host
            return x
        target = ((x.shape[0] + n - 1) // n) * n
        x = _pad_to(x, target)
        if multihost:
            from deeptreeattention_tpu.parallel.distributed import local_batch_slice

            local = x[local_batch_slice(x.shape[0])]
            return jax.make_array_from_process_local_data(sharding, local, x.shape)
        return jax.device_put(x, sharding)

    if isinstance(batch, dict):
        return {k: place(v) for k, v in batch.items()}
    return place(batch)


def spans_processes(mesh):
    """True when the mesh includes devices owned by other processes (a pod
    mesh after jax.distributed.initialize)."""
    return _spans_processes(mesh)


def replicate(tree, mesh):
    """Replicate a pytree onto every mesh device. On a multi-process mesh
    each process holds the full (identical, seeded) value, so the global
    replicated array assembles from process-local copies."""
    sh = replicated(mesh)
    if _spans_processes(mesh):
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            tree,
        )
    return jax.device_put(tree, sh)


def gather_to_host(x):
    """Device array -> full host numpy array, also for arrays sharded over a
    multi-process mesh (np.asarray alone fails on non-addressable shards)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def prefetch_to_device(iterator, size=2, mesh=None, axis=None):
    """Double-buffered host->device pipeline (replaces DataLoader workers).

    Eagerly issues `size` device transfers ahead of consumption so H2D copies
    overlap with the previous step's compute.
    """
    # guard against re-iterable sequences: islice on a list would restart
    # from index 0 every enqueue, yielding the first batch forever
    iterator = iter(iterator)
    queue = collections.deque()

    def _put(v):
        arr = np.asarray(v)
        return v if arr.dtype.kind in "US" else jax.device_put(arr)

    def enqueue(k):
        for batch in itertools.islice(iterator, k):
            if mesh is not None:
                queue.append(shard_batch(batch, mesh, axis))
            elif isinstance(batch, dict):
                queue.append({k2: _put(v) for k2, v in batch.items()})
            else:
                queue.append(jax.device_put(batch))

    enqueue(size)
    while queue:
        yield queue.popleft()
        enqueue(1)
