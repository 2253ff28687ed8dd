"""Sharded training: batch data-parallel x year-model parallel.

The flagship LearnedEnsemble stacks per-year SpectralNetwork parameters on a
leading year axis (models/year.py). That gives two natural mesh axes:

  * "data"  — the batch axis (gradient all-reduce over ICI), and
  * "model" — the stacked year axis (each device group holds a slice of the
              year models; their forwards are independent, so the only
              collective is the masked year-mean's implicit reduce).

place_variables shards every `year_models` leaf over "model" when the year
count divides the axis; everything else is replicated. The train step is the
shared steps.make_train_step jit — GSPMD inserts the collectives from the
input shardings alone.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deeptreeattention_tpu.train import steps


def make_mesh_2d(n_devices, model_parallel=1, devices=None):
    devices = devices or jax.devices()
    if len(devices) < n_devices:
        raise ValueError(
            "make_mesh_2d: need {} devices, backend has {} "
            "(set --xla_force_host_platform_device_count before backend init)".format(
                n_devices, len(devices)
            )
        )
    if n_devices % model_parallel:
        raise ValueError(
            "make_mesh_2d: n_devices={} not divisible by model_parallel={}".format(
                n_devices, model_parallel
            )
        )
    devices = np.array(devices[:n_devices]).reshape(n_devices // model_parallel, model_parallel)
    return Mesh(devices, ("data", "model"))


def place_variables(variables, mesh):
    """Replicate params, shard year-stacked leaves over the "model" axis."""
    model_size = mesh.shape.get("model", 1)
    repl = NamedSharding(mesh, P())
    year_shard = NamedSharding(mesh, P("model"))

    def place(path, leaf):
        on_year_axis = any(getattr(p, "key", None) == "year_models" for p in path)
        if (
            on_year_axis
            and model_size > 1
            and leaf.ndim > 0
            and leaf.shape[0] % model_size == 0
        ):
            return jax.device_put(leaf, year_shard)
        return jax.device_put(leaf, repl)

    return jax.tree_util.tree_map_with_path(place, variables)


def place_batch(batch, mesh):
    data_shard = NamedSharding(mesh, P("data"))

    def place(x):
        x = jnp.asarray(x)
        return jax.device_put(x, data_shard)

    return jax.tree_util.tree_map(place, batch)


def sharded_train_step(model, optimizer, remat=False):
    """Same compiled step as single-chip training; shardings come from the
    placed inputs (GSPMD)."""
    return steps.make_train_step(model.apply, optimizer, remat=remat)
