"""Import reference PyTorch checkpoints into this framework's parameter trees.

Migration path for users of the reference (weecology/DeepTreeAttention):
a torch `spectral_network`/`Hang2020` state_dict (reference
src/models/Hang2020.py) maps onto our flax modules:

  * Conv2d weight [O, I, kh, kw]  -> flax kernel [kh, kw, I, O]
  * Linear weight [O, I]          -> flax kernel [I, O]
  * BatchNorm weight/bias/running_mean/running_var -> scale/bias/mean/var
  * spectral attention Conv1d [F, F, k] -> Dense kernel = middle tap
    (w[:, :, k//2].T) — exactly the math the reference computes on its
    length-1 pooled sequence (see models/hang2020.py docstring).
  * spatial classifier Linear: torch flattens NCHW (c, h, w); our NHWC
    flatten is (h, w, c) — rows are permuted accordingly.

Only needs torch to unpickle; everything else is numpy.
"""
import numpy as np

from deeptreeattention_tpu.utils.logging import get_logger

log = get_logger(__name__)

STAGE_DIMS = {1: 32, 2: 64, 3: 128}
SPATIAL_POOLED = {1: (2, 2, 32), 2: (2, 2, 64), 3: (2, 2, 128)}


def load_state_dict(path):
    import torch

    state = torch.load(path, map_location="cpu")
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    if "state_dict" in state:
        state = state["state_dict"]
    return {k: np.asarray(v) for k, v in state.items()}


def _conv2d(w):
    return np.transpose(w, (2, 3, 1, 0))


def _linear(w):
    return np.transpose(w, (1, 0))


def _conv1d_middle_tap(w):
    k = w.shape[-1]
    return np.transpose(w[:, :, k // 2], (1, 0))


def _linear_from_nchw_flatten(w, chw):
    """Reorder a torch Linear acting on flattened NCHW features to act on our
    flattened NHWC features."""
    c = chw[2]
    h, w_, = chw[0], chw[1]
    idx = np.arange(c * h * w_).reshape(h, w_, c)  # our order
    torch_idx = np.transpose(idx, (2, 0, 1)).reshape(-1)  # torch order of same elements
    # torch weight column j corresponds to torch feature j; our feature order
    # inverse-permutes the columns
    inv = np.empty_like(torch_idx)
    inv[torch_idx] = np.arange(len(torch_idx))
    return np.transpose(w[:, inv], (1, 0))


def _bn(prefix, state):
    return {
        "scale": state[prefix + ".weight"],
        "bias": state[prefix + ".bias"],
    }, {
        "mean": state[prefix + ".running_mean"],
        "var": state[prefix + ".running_var"],
    }


def import_spectral_network(state, prefix=""):
    """torch spectral_network state_dict -> (params, batch_stats) dicts
    matching models.hang2020.SpectralNetwork."""
    p = {}
    bs = {}
    for i in (1, 2, 3):
        conv = "{}conv{}".format(prefix, i)
        p["conv{}".format(i)] = {
            "conv": {
                "kernel": _conv2d(state[conv + ".conv_layer.weight"]),
                "bias": state[conv + ".conv_layer.bias"],
            }
        }
        bn_p, bn_s = _bn(conv + ".bn1", state)
        p["conv{}".format(i)]["bn"] = bn_p
        bs["conv{}".format(i)] = {"bn": bn_s}

        att = "{}attention_{}".format(prefix, i)
        p["attention_{}".format(i)] = {
            "attention_fc1": {
                "kernel": _conv1d_middle_tap(state[att + ".attention_conv1.weight"]),
                "bias": state[att + ".attention_conv1.bias"],
            },
            "attention_fc2": {
                "kernel": _conv1d_middle_tap(state[att + ".attention_conv2.weight"]),
                "bias": state[att + ".attention_conv2.bias"],
            },
        }
        cls = "{}classifier{}".format(prefix, i)
        p["classifier{}".format(i)] = {
            "fc1": {
                "kernel": _linear(state[cls + ".fc1.weight"]),
                "bias": state[cls + ".fc1.bias"],
            }
        }
    return p, bs


def import_spatial_network(state, prefix=""):
    p = {}
    bs = {}
    for i in (1, 2, 3):
        conv = "{}conv{}".format(prefix, i)
        p["conv{}".format(i)] = {
            "conv": {
                "kernel": _conv2d(state[conv + ".conv_layer.weight"]),
                "bias": state[conv + ".conv_layer.bias"],
            }
        }
        bn_p, bn_s = _bn(conv + ".bn1", state)
        p["conv{}".format(i)]["bn"] = bn_p
        bs["conv{}".format(i)] = {"bn": bn_s}

        att = "{}attention_{}".format(prefix, i)
        p["attention_{}".format(i)] = {
            "channel_pool": {
                "kernel": _conv2d(state[att + ".channel_pool.weight"]),
                "bias": state[att + ".channel_pool.bias"],
            },
            "attention_conv1": {
                "kernel": _conv2d(state[att + ".attention_conv1.weight"]),
                "bias": state[att + ".attention_conv1.bias"],
            },
            "attention_conv2": {
                "kernel": _conv2d(state[att + ".attention_conv2.weight"]),
                "bias": state[att + ".attention_conv2.bias"],
            },
        }
        cls = "{}classifier{}".format(prefix, i)
        p["classifier{}".format(i)] = {
            "fc1": {
                "kernel": _linear_from_nchw_flatten(
                    state[cls + ".fc1.weight"], SPATIAL_POOLED[i]
                ),
                "bias": state[cls + ".fc1.bias"],
            }
        }
    return p, bs


def import_hang2020(state_or_path, prefix=""):
    """Full Hang2020 (both branches + alpha) -> flax variables dict."""
    state = (
        load_state_dict(state_or_path) if isinstance(state_or_path, str) else
        {k: np.asarray(v) for k, v in state_or_path.items()}
    )
    sp_p, sp_bs = import_spectral_network(state, prefix=prefix + "spectral_network.")
    sa_p, sa_bs = import_spatial_network(state, prefix=prefix + "spatial_network.")
    params = {
        "spectral_network": sp_p,
        "spatial_network": sa_p,
        "alpha": np.float32(state[prefix + "alpha"]),
    }
    batch_stats = {"spectral_network": sp_bs, "spatial_network": sa_bs}
    return {"params": params, "batch_stats": batch_stats}


def import_metadata_fusion(state_or_path):
    """torch metadata_sensor_fusion state_dict (reference
    src/models/metadata.py:26-44: site-embedding metadata MLP + Hang2020 under
    `sensor_model.` + concat fc1) -> variables for
    models.metadata.MetadataSensorFusion."""
    state = (
        load_state_dict(state_or_path) if isinstance(state_or_path, str) else
        {k: np.asarray(v) for k, v in state_or_path.items()}
    )
    meta_bn_p, meta_bn_s = _bn("metadata_model.batch_norm", state)
    meta_p = {
        "embedding": {"embedding": state["metadata_model.embedding.weight"]},
        "batch_norm": meta_bn_p,
        "mlp": {
            "kernel": _linear(state["metadata_model.mlp.weight"]),
            "bias": state["metadata_model.mlp.bias"],
        },
    }
    sensor = import_hang2020(state, prefix="sensor_model.")
    params = {
        "metadata_model": meta_p,
        "sensor_model": sensor["params"],
        "fc1": {
            "kernel": _linear(state["fc1.weight"]),
            "bias": state["fc1.bias"],
        },
    }
    batch_stats = {
        "metadata_model": {"batch_norm": meta_bn_s},
        "sensor_model": sensor["batch_stats"],
    }
    return {"params": params, "batch_stats": batch_stats}


RESNET_STAGES = {50: [3, 4, 6, 3], 101: [3, 4, 23, 3]}


def import_resnet50(state_or_path, num_classes=2, depth=50):
    """torchvision resnet50-style state_dict -> models.resnet.ResNet variables.

    Covers migrating the reference's alive/dead checkpoints (torchvision
    resnet50 + 2-class head, reference src/models/dead.py:34-36). Bottleneck
    sub-modules map onto flax auto-names: Conv_0..2 / BatchNorm_0..2 are the
    main path, Conv_3 / BatchNorm_3 the downsample (when present). A missing
    fc head (backbone-only) leaves the new head randomly initialized absent.
    """
    state = (
        load_state_dict(state_or_path) if isinstance(state_or_path, str) else
        {k: np.asarray(v) for k, v in state_or_path.items()}
    )
    # strip lightning "model." prefixes
    state = {k[len("model."):] if k.startswith("model.") else k: v for k, v in state.items()}

    params = {}
    batch_stats = {}

    def put_bn(dst_p, dst_s, prefix):
        dst_p["scale"] = state[prefix + ".weight"]
        dst_p["bias"] = state[prefix + ".bias"]
        dst_s["mean"] = state[prefix + ".running_mean"]
        dst_s["var"] = state[prefix + ".running_var"]

    params["stem_conv"] = {"kernel": _conv2d(state["conv1.weight"])}
    params["stem_bn"], bn_s = {}, {}
    put_bn(params["stem_bn"], bn_s, "bn1")
    batch_stats["stem_bn"] = bn_s

    for stage_i, blocks in enumerate(RESNET_STAGES[depth], start=1):
        for b in range(blocks):
            src = "layer{}.{}".format(stage_i, b)
            name = "stage{}_block{}".format(stage_i, b)
            p = {}
            s = {}
            for ci in (1, 2, 3):
                p["Conv_{}".format(ci - 1)] = {
                    "kernel": _conv2d(state["{}.conv{}.weight".format(src, ci)])
                }
                bp, bsd = {}, {}
                put_bn(bp, bsd, "{}.bn{}".format(src, ci))
                p["BatchNorm_{}".format(ci - 1)] = bp
                s["BatchNorm_{}".format(ci - 1)] = bsd
            if "{}.downsample.0.weight".format(src) in state:
                p["Conv_3"] = {"kernel": _conv2d(state["{}.downsample.0.weight".format(src)])}
                bp, bsd = {}, {}
                put_bn(bp, bsd, "{}.downsample.1".format(src))
                p["BatchNorm_3"] = bp
                s["BatchNorm_3"] = bsd
            params[name] = p
            batch_stats[name] = s

    if "fc.weight" in state and state["fc.weight"].shape[0] == num_classes:
        params["fc"] = {"kernel": _linear(state["fc.weight"]), "bias": state["fc.bias"]}
    return {"params": params, "batch_stats": batch_stats}


def import_spectral_only(state_or_path):
    state = (
        load_state_dict(state_or_path) if isinstance(state_or_path, str) else
        {k: np.asarray(v) for k, v in state_or_path.items()}
    )
    p, bs = import_spectral_network(state)
    return {"params": p, "batch_stats": bs}


# ---------------------------------------------------------------------------
# learned_ensemble / MultiStage Lightning checkpoints
# ---------------------------------------------------------------------------

def _stack_trees(trees):
    """Stack a list of identical-structure nested dicts leaf-wise on axis 0 —
    the per-year torch submodules become our nn.vmap'd year-stacked params."""
    out = {}
    for k in trees[0]:
        vals = [t[k] for t in trees]
        if isinstance(vals[0], dict):
            out[k] = _stack_trees(vals)
        else:
            out[k] = np.stack(vals, axis=0)
    return out


def _ensemble_years(state, prefix):
    return sorted(
        {
            int(k[len(prefix + "year_models."):].split(".")[0])
            for k in state
            if k.startswith(prefix + "year_models.")
        }
    )


def import_learned_ensemble(state_or_path, years=None, prefix=""):
    """torch learned_ensemble state_dict (reference src/models/year.py:13-22:
    one spectral_network per year under `year_models.{y}.`) -> variables for
    models.year.LearnedEnsemble (single tree, params year-stacked on axis 0
    for the nn.vmap forward)."""
    state = (
        load_state_dict(state_or_path) if isinstance(state_or_path, str) else
        {k: np.asarray(v) for k, v in state_or_path.items()}
    )
    found = _ensemble_years(state, prefix)
    if not found:
        raise KeyError("no '{}year_models.*' keys in state_dict".format(prefix))
    if years is not None and len(found) != years:
        raise ValueError(
            "checkpoint has {} year models, expected {}".format(len(found), years)
        )
    per_year = [
        import_spectral_network(state, prefix="{}year_models.{}.".format(prefix, y))
        for y in found
    ]
    params = _stack_trees([p for p, _ in per_year])
    stats = _stack_trees([s for _, s in per_year])
    return {"params": {"year_models": params},
            "batch_stats": {"year_models": stats}}


def import_multi_stage(state_or_path):
    """Reference MultiStage Lightning checkpoint -> per-level variables.

    The reference registers one learned_ensemble per taxonomy level in an
    nn.ModuleList (`models.{L}.`, src/models/multi_stage.py:41,62-66) and an
    inverse-frequency loss-weight buffer per level (`loss_weight_{L}`,
    src/models/multi_stage.py:76-79). Returns
    `(variables, loss_weights, info)` where `variables[L]` loads straight
    into our MultiStage (year-stacked LearnedEnsemble trees), and
    `info = {"levels", "years", "num_classes"}` (classes read from each
    level's classifier head).
    """
    state = (
        load_state_dict(state_or_path) if isinstance(state_or_path, str) else
        {k: np.asarray(v) for k, v in state_or_path.items()}
    )
    levels = sorted(
        {int(k.split(".")[1]) for k in state if k.startswith("models.")}
    )
    if not levels:
        raise KeyError("no 'models.{level}.' keys — not a MultiStage checkpoint")
    variables, loss_weights, num_classes = [], [], []
    years = None
    for lvl in levels:
        prefix = "models.{}.".format(lvl)
        found = _ensemble_years(state, prefix)
        if years is None:
            years = found
        elif found != years:
            raise ValueError(
                "level {} has years {}, level {} has {}".format(
                    lvl, found, levels[0], years
                )
            )
        v = import_learned_ensemble(state, prefix=prefix)
        variables.append(v)
        head = v["params"]["year_models"]["classifier3"]["fc1"]["kernel"]
        num_classes.append(int(head.shape[-1]))
        lw = state.get("loss_weight_{}".format(lvl))
        loss_weights.append(None if lw is None else np.asarray(lw, np.float32))
    info = {"levels": len(levels), "years": len(years), "num_classes": num_classes}
    return variables, loss_weights, info


def load_multistage_weights(ms, state_or_path):
    """Load a reference MultiStage Lightning checkpoint into an existing
    deeptreeattention_tpu MultiStage (built from the same train/test frames,
    as the reference rebuilds the module before `load_from_checkpoint`).
    Replaces per-level variables + loss weights and re-initializes optimizer
    state; shape-checks classes/years against the target.

    Year-order contract: the checkpoint stores year models by POSITION
    (`year_models.{0..Y-1}`) with no year identity — position y is year
    `train_df.tile_year.unique()[y]` of the frames the reference was trained
    with (reference src/models/multi_stage.py:40). Build `ms` from frames
    whose tile_year appearance order matches, or the year slots will be
    silently permuted; only the COUNT is checkable here."""
    import jax
    import jax.numpy as jnp

    variables, loss_weights, info = import_multi_stage(state_or_path)
    if info["levels"] != ms.levels:
        raise ValueError(
            "checkpoint has {} levels, model has {}".format(info["levels"], ms.levels)
        )
    if info["years"] != len(ms.years):
        raise ValueError(
            "checkpoint has {} years, model has {}".format(info["years"], len(ms.years))
        )
    for lvl in range(ms.levels):
        if info["num_classes"][lvl] != ms.num_classes[lvl]:
            raise ValueError(
                "level {}: checkpoint classes {} != model classes {}".format(
                    lvl, info["num_classes"][lvl], ms.num_classes[lvl]
                )
            )
        ms.variables[lvl] = jax.tree_util.tree_map(jnp.asarray, variables[lvl])
        if loss_weights[lvl] is not None:
            ms.loss_weights[lvl] = jnp.asarray(loss_weights[lvl])
        ms.opt_states[lvl] = ms.optimizers[lvl].init(ms.variables[lvl]["params"])
    return ms


def import_retinanet(state_or_path, num_classes=1, depth=50):
    """torchvision retinanet_resnet50_fpn / DeepForest state_dict ->
    models.retinanet.RetinaNet variables.

    The reference's production detector is DeepForest's released RetinaNet
    (reference src/generate.py:17-42); this makes those weights a file-drop.
    Handles both torchvision head layouts: plain Sequential towers
    (`head.classification_head.conv.{0,2,4,6}.weight`, relu interleaved) and
    Conv2dNormActivation (`conv.{i}.0.weight`), plus FPN block naming with
    and without the trailing `.0`. Lightning/DeepForest `model.` prefixes are
    stripped.
    """
    state = (
        load_state_dict(state_or_path) if isinstance(state_or_path, str) else
        {k: np.asarray(v) for k, v in state_or_path.items()}
    )
    state = {k[len("model."):] if k.startswith("model.") else k: v
             for k, v in state.items()}

    def pick(*names):
        for n in names:
            if n in state:
                return state[n]
        raise KeyError("retinanet import: none of {} in state_dict".format(names))

    # -- backbone body: reuse the resnet50 mapping ------------------------
    body_state = {k[len("backbone.body."):]: v for k, v in state.items()
                  if k.startswith("backbone.body.")}
    if not body_state:
        raise KeyError("no 'backbone.body.*' keys in state_dict")
    body = import_resnet50(body_state, num_classes=0, depth=depth)

    # -- FPN ---------------------------------------------------------------
    fpn_p = {}
    for i in range(3):
        fpn_p["inner{}".format(i)] = {
            "kernel": _conv2d(pick(
                "backbone.fpn.inner_blocks.{}.weight".format(i),
                "backbone.fpn.inner_blocks.{}.0.weight".format(i))),
            "bias": pick("backbone.fpn.inner_blocks.{}.bias".format(i),
                         "backbone.fpn.inner_blocks.{}.0.bias".format(i)),
        }
        fpn_p["layer{}".format(i)] = {
            "kernel": _conv2d(pick(
                "backbone.fpn.layer_blocks.{}.weight".format(i),
                "backbone.fpn.layer_blocks.{}.0.weight".format(i))),
            "bias": pick("backbone.fpn.layer_blocks.{}.bias".format(i),
                         "backbone.fpn.layer_blocks.{}.0.bias".format(i)),
        }
    for name, key in (("p6", "p6"), ("p7", "p7")):
        fpn_p[name] = {
            "kernel": _conv2d(state["backbone.fpn.extra_blocks.{}.weight".format(key)]),
            "bias": state["backbone.fpn.extra_blocks.{}.bias".format(key)],
        }

    # -- heads ---------------------------------------------------------------
    # retinanet_resnet50_fpn_v2-style towers are Conv2dNormActivation WITH a
    # GroupNorm ('conv.{i}.1.weight'); our flax head is the v1 conv->relu
    # layout with no norm slot, so importing those weights and silently
    # dropping the GN scale/bias would produce garbage predictions. Fail loud.
    norm_keys = [k for k in state
                 if k.startswith("head.") and ".conv." in k
                 and k.split(".conv.")[1].split(".")[1:2] == ["1"]]
    if norm_keys:
        raise ValueError(
            "retinanet import: state_dict has normalization tensors inside "
            "the head towers (e.g. {!r}) — a v2-style GroupNorm head, which "
            "this v1 conv/relu architecture cannot represent".format(
                norm_keys[0]))
    head_p = {}
    for tower, flax_prefix in (("classification_head", "cls_conv"),
                               ("regression_head", "reg_conv")):
        for i in range(4):
            head_p["{}{}".format(flax_prefix, i)] = {
                "kernel": _conv2d(pick(
                    "head.{}.conv.{}.weight".format(tower, 2 * i),
                    "head.{}.conv.{}.0.weight".format(tower, i),
                    "head.{}.conv.{}.weight".format(tower, i))),
                "bias": pick(
                    "head.{}.conv.{}.bias".format(tower, 2 * i),
                    "head.{}.conv.{}.0.bias".format(tower, i),
                    "head.{}.conv.{}.bias".format(tower, i)),
            }
    head_p["cls_logits"] = {
        "kernel": _conv2d(state["head.classification_head.cls_logits.weight"]),
        "bias": state["head.classification_head.cls_logits.bias"],
    }
    head_p["bbox_reg"] = {
        "kernel": _conv2d(state["head.regression_head.bbox_reg.weight"]),
        "bias": state["head.regression_head.bbox_reg.bias"],
    }
    n_out = head_p["cls_logits"]["bias"].shape[0]
    if n_out != 9 * num_classes:
        raise ValueError(
            "cls_logits has {} outputs; expected 9 anchors x {} classes".format(
                n_out, num_classes))

    return {
        "params": {"body": body["params"], "fpn": fpn_p, "head": head_p},
        "batch_stats": {"body": body["batch_stats"]},
    }
