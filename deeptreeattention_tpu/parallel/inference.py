"""shard_map data-parallel inference over the device mesh.

Tile-scale prediction is embarrassingly parallel over crowns/windows: shard
the batch axis with shard_map (explicit SPMD — each device runs the forward
on its shard, no collectives needed until aggregation), replicating the
parameters. Used for the landscape sweep where one tile yields tens of
thousands of windows (SURVEY §5: batch-shard the pixel-window axis over ICI).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

try:  # jax >= 0.5 moved shard_map out of experimental
    from jax import shard_map as _shard_map_fn

    def _shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_fn(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_fn

    def _shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_fn(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


def make_sharded_infer(apply_fn, mesh, axis=None):
    """jit(shard_map) forward: params replicated, batch sharded on axis 0.

    Returns fn(variables, images) -> probs with the same leading axis.
    Batch size must be a multiple of the mesh size (pad + mask upstream).
    """
    axis = axis or mesh.axis_names[0]

    def local_forward(variables, images):
        logits = apply_fn(variables, images)
        if isinstance(logits, (list, tuple)):
            logits = logits[-1]
        return jax.nn.softmax(logits, axis=-1)

    sharded = _shard_map(
        local_forward, mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(axis),
    )
    return jax.jit(sharded)


_INFER_CACHE = {}


def sharded_predict(apply_fn, mesh, variables, images, axis=None):
    """One-shot helper: pads the batch to the mesh size, runs the shard_map
    forward, strips the padding.

    The jitted shard_map forward is cached per (apply_fn, mesh, axis) —
    rebuilding it per call would retrace and recompile every time (a new
    program through the axon relay is minutes, CLAUDE.md)."""
    axis = axis or mesh.axis_names[0]
    n = mesh.devices.size
    images = jnp.asarray(images)
    b = images.shape[0]
    target = ((b + n - 1) // n) * n
    if target != b:
        pad = jnp.zeros((target - b,) + images.shape[1:], images.dtype)
        images = jnp.concatenate([images, pad])
    key = (apply_fn, mesh, axis)
    fn = _INFER_CACHE.get(key)
    if fn is None:
        fn = _INFER_CACHE[key] = make_sharded_infer(apply_fn, mesh, axis)
    with mesh:
        out = fn(variables, images)
    return np.asarray(out)[:b]
