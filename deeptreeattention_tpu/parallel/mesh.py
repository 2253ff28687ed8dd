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
    """Mesh precedence: explicit mesh > config["mesh_devices"] (-1 = all
    devices) > None (single-device)."""
    if mesh is not None:
        return mesh
    n = (config or {}).get("mesh_devices")
    if n in (None, 0, 1):
        return None
    if n == -1:
        n = len(jax.devices())
    return make_mesh(n) if n > 1 else None


def data_sharding(mesh, axis=None):
    axis = axis or mesh.axis_names[0]
    return NamedSharding(mesh, P(axis))


def replicated(mesh):
    return NamedSharding(mesh, P())


def _pad_to(arr, n):
    if arr.shape[0] == n:
        return arr
    pad = n - arr.shape[0]
    widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, widths)


def shard_batch(batch, mesh, axis=None):
    """Place a dict/array batch with the leading axis sharded over the mesh.

    Pads the leading axis up to a multiple of the mesh size (padded rows are
    zeros; pair with a "mask" entry to drop them in the loss).
    """
    sharding = data_sharding(mesh, axis)
    n = mesh.devices.size

    def place(x):
        x = np.asarray(x)
        target = ((x.shape[0] + n - 1) // n) * n
        if x.dtype.kind in "US":  # host-side strings stay on host
            return x
        return jax.device_put(_pad_to(x, target), sharding)

    if isinstance(batch, dict):
        return {k: place(v) for k, v in batch.items()}
    return place(batch)


def replicate(tree, mesh):
    return jax.device_put(tree, replicated(mesh))


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
