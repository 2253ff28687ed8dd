"""Checkpoint save/load: params + batch_stats + optimizer/scheduler + meta.

Equivalent capability to Lightning's save_checkpoint/load_from_checkpoint
with save_hyperparameters (reference train.py:103,
src/models/multi_stage.py:80): one directory per checkpoint containing a
msgpack tree (flax.serialization) and a JSON meta blob (config, label dicts,
years). The layout is a plain directory so the ETL artifact-resume concept
(use_data_commit) and model checkpoints share one mechanism.
"""
import json
import os

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _write_meta(path, meta):
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(_jsonable(meta or {}), f, indent=1)


def _read_meta(path):
    meta_path = os.path.join(path, "meta.json")
    if not os.path.exists(meta_path):
        return {}
    with open(meta_path) as f:
        return json.load(f)


def save_checkpoint(path, tree, meta=None, save_dtype=None):
    """Write tree -> {path}/state.msgpack and meta -> {path}/meta.json.

    `path` may also end in .pt/.ckpt — then a directory of that name is made
    (keeps reference-style call sites valid).

    `save_dtype="bfloat16"` casts floating leaves before serializing —
    halves committed-artifact size (bf16 keeps f32's exponent range; the
    measured accuracy delta on the shipped dead snapshot is zero at 4
    decimals, BENCH_DEAD_REAL.json). load_checkpoint(target=...) restores
    into the target's dtypes; targetless loads get bf16 leaves back.
    """
    if jax.process_count() > 1 and jax.process_index() != 0:
        # multi-host runs share a filesystem (SLURM layout, like the
        # reference's): process 0 writes once, everyone returns the path
        return path
    os.makedirs(path, exist_ok=True)
    host = _to_host(tree)
    if save_dtype is not None:
        import jax.numpy as jnp

        target = jnp.dtype(save_dtype)

        def cast(x):
            a = np.asarray(x)
            return a.astype(target) if np.issubdtype(a.dtype, np.floating) else a

        host = jax.tree_util.tree_map(cast, host)
    with open(os.path.join(path, "state.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(host))
    _write_meta(path, meta)
    return path


def load_checkpoint(path, target=None):
    """Returns (tree, meta). With `target` the tree is restored into the
    target's structure/dtypes; without, a raw nested dict is returned."""
    with open(os.path.join(path, "state.msgpack"), "rb") as f:
        data = f.read()
    if target is not None:
        tree = serialization.from_bytes(target, data)
    else:
        tree = serialization.msgpack_restore(data)
    return tree, _read_meta(path)


def _jsonable(obj):
    if isinstance(obj, dict):
        return {str(k): _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    return obj


# ---------------------------------------------------------------------------
# orbax backend (optional): the JAX-ecosystem standard for pod-scale and
# async checkpointing. Same (tree, meta) contract as the msgpack backend.
# ---------------------------------------------------------------------------

def save_checkpoint_orbax(path, tree, meta=None):
    """Write tree with orbax StandardCheckpointer (+ meta.json sidecar).

    Use over msgpack when running multi-host: orbax coordinates per-host
    shards and fsyncs atomically (ocdbt)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "state"), _to_host(tree), force=True)
    _write_meta(path, meta)
    return path


def load_checkpoint_orbax(path, target=None):
    """Returns (tree, meta) from a save_checkpoint_orbax directory."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            # StandardCheckpointer.restore wraps a bare target itself —
            # passing StandardRestore here double-wraps and raises
            tree = ckptr.restore(os.path.join(path, "state"), _to_host(target))
        else:
            tree = ckptr.restore(os.path.join(path, "state"))
    return tree, _read_meta(path)


def is_orbax_checkpoint(path):
    return os.path.isdir(os.path.join(path, "state"))
