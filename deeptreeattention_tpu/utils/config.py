"""Config system: single YAML dict with CLI JSON override.

Mirrors the reference's flag surface (reference src/utils.py:15-34 and
config.yml:1-96) so a reference user can bring their config.yml unchanged.
TPU-specific knobs (mesh shape, precision, prefetch depth) are additive and
default sensibly when absent.
"""
import argparse
import copy
import json
import os

import yaml

# Keys the TPU build adds on top of the reference's config.yml surface.
_TPU_DEFAULTS = {
    # device mesh: data-parallel axis size; -1 = all local devices
    "mesh_devices": -1,
    "mesh_axis": "data",
    # compute dtype for the model forward ("bfloat16" | "float32")
    "compute_dtype": "bfloat16",
    # host->device prefetch depth for the input pipeline
    "prefetch_depth": 2,
    # pallas fused kernels on the hot path (falls back to XLA when False)
    "use_pallas": False,
    # per-level batch padding for jit shape stability
    "pad_batches": True,
}


def default_config():
    """Return the packaged default config (mirrors reference config.yml keys)."""
    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "default_config.yml")
    with open(path) as f:
        config = yaml.safe_load(f)
    for k, v in _TPU_DEFAULTS.items():
        config.setdefault(k, v)
    return config


def read_config(config_path, overrides=None, parse_cli=True):
    """Read a YAML config; allow `-d '{json}'` CLI override like the reference.

    Args:
        config_path: path to a YAML file.
        overrides: optional dict applied after the file (highest priority
            below CLI).
        parse_cli: when True, parse known args for `-d/--my-dict`.
    """
    try:
        with open(config_path) as f:
            config = yaml.safe_load(f)
    except Exception as e:
        raise FileNotFoundError(
            "There is no config at {}, yields {}".format(config_path, e)
        )
    if config is None:
        config = {}

    for k, v in _TPU_DEFAULTS.items():
        config.setdefault(k, v)

    if overrides:
        config.update(overrides)

    if parse_cli:
        parser = argparse.ArgumentParser("DeepTreeAttention-TPU config")
        parser.add_argument("-d", "--my-dict", type=json.loads, default=None)
        args, _ = parser.parse_known_args()
        if args.my_dict:
            for key, value in args.my_dict.items():
                config[key] = value

    return config


def merge(config, **kwargs):
    """Functional update: return a new config dict with kwargs applied."""
    out = copy.deepcopy(config)
    out.update(kwargs)
    return out
