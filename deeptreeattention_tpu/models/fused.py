"""Fused inference forwards for the Hang2020 family (eval-only fast path).

Measured on v5e (scripts/bench_conv_probe.py): a 3x3 conv 349->32 on 11x11
runs at ~40 TFLOP/s while 349->64 runs at ~68 TFLOP/s — the MXU's 128-wide
lane dimension is underfed by the reference architecture's 32-filter stages.
These forwards keep the exact module math (reference src/models/Hang2020.py
ladders) but restructure it for the MXU:

  * BatchNorm folded into conv weights at call time (eval-mode BN is an
    affine map per output channel: k' = k * g/sqrt(v+eps),
    b' = (b - m) * g/sqrt(v+eps) + beta).
  * Hang2020: both branches' stage-1 convs share the same input — run them
    as ONE conv with concatenated output channels (N: 32 -> 64).
  * Stages 2/3 of the two branches (different inputs, same shapes) run as a
    grouped conv on the channel-concatenated tensor (groups=2, N doubled).
  * LearnedEnsemble: the Y per-year SpectralNetworks run as groups=Y
    convs (N: 32 -> Y*32 = 128 for 4 years — full lane width), with the
    per-year attention/classifier Denses as one batched einsum each.

Functions take the STANDARD variables trees produced by the flax modules
(models.hang2020 / models.year) — no re-training or conversion; parity with
`model.apply(train=False)` is pinned by tests/test_fused_eval.py.
"""
import jax
import jax.numpy as jnp

from deeptreeattention_tpu.models.hang2020 import SPATIAL_POOLS, STAGE_FILTERS


def _fold_bn(conv_p, bn_p, bn_s, eps=1e-5):
    """Fold eval-mode BatchNorm into conv kernel+bias (float32 math)."""
    g = bn_p["scale"] / jnp.sqrt(bn_s["var"] + eps)
    kernel = conv_p["kernel"] * g  # broadcast over trailing (out-channel) axis
    bias = (conv_p.get("bias", 0.0) - bn_s["mean"]) * g + bn_p["bias"]
    return kernel, bias


def _conv(x, kernel, bias, groups=1, dtype=jnp.bfloat16):
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    return y + bias.astype(jnp.float32)


def _maxpool(x, k):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, k, k, 1), "VALID"
    )


def _dense(x, p, dtype):
    return x.astype(dtype) @ p["kernel"].astype(dtype) + p["bias"].astype(dtype)


def _conv1_as_band_matrix(kernel, H, W):
    """k x k SAME conv on a 1-channel [H, W] map as a banded [H*W, H*W]
    matrix (built from the kernel params at trace time; indices are static).

    A C_out=1 conv leaves the MXU's 128-wide lane dimension 99% idle; as a
    flattened-spatial matmul the same op runs with N = H*W (121 at 11x11)."""
    import numpy as np

    k = kernel.shape[0]
    c = k // 2
    qs, ps, taps = [], [], []
    for di in range(k):
        for dj in range(k):
            for i in range(H):
                for j in range(W):
                    qi, qj = i + di - c, j + dj - c
                    if 0 <= qi < H and 0 <= qj < W:
                        ps.append(i * W + j)
                        qs.append(qi * W + qj)
                        taps.append(di * k + dj)
    flat = kernel.reshape(-1)
    return jnp.zeros((H * W, H * W), kernel.dtype).at[
        np.asarray(qs), np.asarray(ps)
    ].set(flat[np.asarray(taps)])


# ---------------------------------------------------------------------------
# Hang2020 (spectral + spatial fusion)
# ---------------------------------------------------------------------------

def hang2020_eval(variables, x, dtype=jnp.bfloat16):
    """Math-identical eval forward of models.hang2020.Hang2020 with fused
    stage-1 and grouped stage-2/3 convs. Returns the joint logits [B, C]."""
    params = variables["params"]
    stats = variables["batch_stats"]
    spec_p, spec_s = params["spectral_network"], stats["spectral_network"]
    spat_p, spat_s = params["spatial_network"], stats["spatial_network"]

    x = x.astype(dtype)
    spec_scores = None
    spat_scores = None

    # stage 1: shared input -> one conv, concat output channels
    k1s, b1s = _fold_bn(spec_p["conv1"]["conv"], spec_p["conv1"]["bn"],
                        spec_s["conv1"]["bn"])
    k1t, b1t = _fold_bn(spat_p["conv1"]["conv"], spat_p["conv1"]["bn"],
                        spat_s["conv1"]["bn"])
    y = _conv(x, jnp.concatenate([k1s, k1t], axis=-1),
              jnp.concatenate([b1s, b1t]), dtype=dtype)
    y = jax.nn.relu(y).astype(dtype)

    joint = y  # [B, H, W, 2*filters] — spectral block then spatial block

    for i, filters in enumerate(STAGE_FILTERS):
        if i > 0:
            # grouped conv: group 0 = spectral branch, group 1 = spatial
            ks, bs = _fold_bn(spec_p["conv{}".format(i + 1)]["conv"],
                              spec_p["conv{}".format(i + 1)]["bn"],
                              spec_s["conv{}".format(i + 1)]["bn"])
            kt, bt = _fold_bn(spat_p["conv{}".format(i + 1)]["conv"],
                              spat_p["conv{}".format(i + 1)]["bn"],
                              spat_s["conv{}".format(i + 1)]["bn"])
            y = _conv(joint, jnp.concatenate([ks, kt], axis=-1),
                      jnp.concatenate([bs, bt]), groups=2, dtype=dtype)
            y = jax.nn.relu(y)
            y = _maxpool(y, 2).astype(dtype)

        spec_y = y[..., :filters]
        spat_y = y[..., filters:]

        # spectral attention (channel gate from global pool)
        ap = spec_p["attention_{}".format(i + 1)]
        pooled = jnp.mean(spec_y, axis=(1, 2))
        a = jax.nn.relu(_dense(pooled, ap["attention_fc1"], dtype))
        a = jax.nn.sigmoid(_dense(a, ap["attention_fc2"], dtype))
        spec_gated = spec_y * a[:, None, None, :]
        if i == len(STAGE_FILTERS) - 1:
            spec_scores = _dense(pooled * a, spec_p["classifier{}".format(i + 1)]["fc1"], dtype)

        # spatial attention (spatial gate from 1x1 channel pool) — the three
        # C_out=1 convs run as flattened-spatial matmuls (N=H*W, not N=1)
        ap = spat_p["attention_{}".format(i + 1)]
        p = SPATIAL_POOLS[filters]
        Hc, Wc = spat_y.shape[1], spat_y.shape[2]
        cp = jax.nn.relu(
            spat_y.reshape(-1, Hc * Wc, filters).astype(dtype)
            @ ap["channel_pool"]["kernel"][0, 0].astype(dtype)
            + ap["channel_pool"]["bias"].astype(dtype)
        )[..., 0]  # [B, HW]
        m1 = _conv1_as_band_matrix(ap["attention_conv1"]["kernel"], Hc, Wc)
        m2 = _conv1_as_band_matrix(ap["attention_conv2"]["kernel"], Hc, Wc)
        m = jax.nn.relu(cp @ m1.astype(dtype)
                        + ap["attention_conv1"]["bias"].astype(dtype))
        m = jax.nn.sigmoid(m @ m2.astype(dtype)
                           + ap["attention_conv2"]["bias"].astype(dtype))
        spat_gated = spat_y * m.reshape(-1, Hc, Wc, 1)
        if i == len(STAGE_FILTERS) - 1:
            cls = _maxpool(spat_gated, p) if p > 1 else spat_gated
            cls = cls.reshape(cls.shape[0], -1)
            spat_scores = _dense(cls, spat_p["classifier{}".format(i + 1)]["fc1"], dtype)

        joint = jnp.concatenate([spec_gated, spat_gated], axis=-1).astype(dtype)

    w = jax.nn.sigmoid(params["alpha"])
    return (spec_scores.astype(jnp.float32) * w
            + spat_scores.astype(jnp.float32) * (1.0 - w))


def metadata_fusion_eval(variables, images, site_ids, dtype=jnp.bfloat16):
    """Math-identical eval forward of models.metadata.MetadataSensorFusion:
    site embedding + eval BN + MLP, fused-Hang2020 sensor branch, concat fc1."""
    p = variables["params"]
    s = variables["batch_stats"]

    emb = p["metadata_model"]["embedding"]["embedding"][site_ids]
    bn_p = p["metadata_model"]["batch_norm"]
    bn_s = s["metadata_model"]["batch_norm"]
    meta = (emb - bn_s["mean"]) / jnp.sqrt(bn_s["var"] + 1e-5) * bn_p["scale"] + bn_p["bias"]
    meta = jax.nn.relu(_dense(meta, p["metadata_model"]["mlp"], jnp.float32))

    sensor = hang2020_eval(
        {"params": p["sensor_model"], "batch_stats": s["sensor_model"]},
        images, dtype=dtype,
    )
    joint = jnp.concatenate([meta.astype(jnp.float32), sensor], axis=1)
    return jax.nn.relu(_dense(joint, p["fc1"], jnp.float32))


# ---------------------------------------------------------------------------
# LearnedEnsemble (Y per-year SpectralNetworks, masked year mean)
# ---------------------------------------------------------------------------

def _year_dense(x, p, dtype):
    """x [B, Y, F] with year-stacked Dense params kernel [Y, F, G]."""
    return (jnp.einsum("byf,yfg->byg", x.astype(dtype), p["kernel"].astype(dtype))
            + p["bias"].astype(dtype))


def learned_ensemble_eval(variables, images, mask_mode="batch",
                          dtype=jnp.bfloat16):
    """Math-identical eval forward of models.year.LearnedEnsemble with the Y
    per-year spectral ladders run as groups=Y convs (N = Y*filters, full MXU
    lane width at 4 years) and per-year Denses as batched einsums.

    images: [B, Y, H, W, C] year-stacked (zero-filled missing years).
    Returns logits [B, classes].
    """
    ym_p = variables["params"]["year_models"]
    ym_s = variables["batch_stats"]["year_models"]
    B, Y, H, W, C = images.shape

    x = images.astype(dtype)

    cur = None
    pooled_gated = None
    for i, filters in enumerate(STAGE_FILTERS):
        conv = ym_p["conv{}".format(i + 1)]
        bn_s = ym_s["conv{}".format(i + 1)]
        # year-stacked fold: kernel [Y, 3, 3, Cin, F], bn tensors [Y, F]
        g = conv["bn"]["scale"] / jnp.sqrt(bn_s["bn"]["var"] + 1e-5)
        k = conv["conv"]["kernel"] * g[:, None, None, None, :]
        b = (conv["conv"]["bias"] - bn_s["bn"]["mean"]) * g + conv["bn"]["bias"]
        if i == 0:
            # measured (scripts/bench_group_probe.py): at K = 9*349 a
            # groups=Y conv lowers WORSE than separate convs — run the big-K
            # stage via vmap over years (lowers to a batch-grouped conv, the
            # same form nn.vmap gives the module) into the year-blocked
            # channel layout
            y_out = jax.vmap(
                lambda xy, ky, by: _conv(xy, ky, by, dtype=dtype),
                in_axes=(1, 0, 0), out_axes=3,
            )(x, k, b)  # [B, H, W, Y, F]
            y_out = y_out.reshape(B, H, W, Y * filters)
        else:
            # small-K stages: grouped conv measured ~2.6x faster than
            # per-year (N = Y*filters fills the MXU lane width)
            kg = jnp.concatenate([k[y] for y in range(Y)], axis=-1)
            bg = b.reshape(Y * filters)
            y_out = _conv(cur, kg, bg, groups=Y, dtype=dtype)
        y_out = jax.nn.relu(y_out)
        if i > 0:
            y_out = _maxpool(y_out, 2)
        y_out = y_out.astype(dtype)

        # spectral attention per year: pool -> fc1 -> relu -> fc2 -> sigmoid
        pooled = jnp.mean(y_out, axis=(1, 2)).reshape(B, Y, filters)
        ap = ym_p["attention_{}".format(i + 1)]
        a = jax.nn.relu(_year_dense(pooled, ap["attention_fc1"], dtype))
        a = jax.nn.sigmoid(_year_dense(a, ap["attention_fc2"], dtype))
        gate = a.reshape(B, 1, 1, Y * filters)
        cur = (y_out * gate).astype(dtype)
        if i == len(STAGE_FILTERS) - 1:
            pooled_gated = pooled * a  # [B, Y, F]

    cls = ym_p["classifier3"]["fc1"]
    scores = _year_dense(pooled_gated, cls, dtype).astype(jnp.float32)  # [B, Y, cls]

    # masked year mean (reference skips all-zero years, src/models/year.py:27-31)
    if mask_mode == "batch":
        valid = jnp.any(images != 0, axis=(0, 2, 3, 4))  # [Y]
        mask = valid[None, :, None].astype(scores.dtype)
    else:
        valid = jnp.any(images != 0, axis=(2, 3, 4))  # [B, Y]
        mask = valid[:, :, None].astype(scores.dtype)
    mask = jnp.broadcast_to(mask, scores.shape)
    total = jnp.sum(scores * mask, axis=1)
    count = jnp.maximum(jnp.sum(mask, axis=1), 1.0)
    return total / count


def multistage_eval(variables_list, images, mask_mode="batch",
                    dtype=jnp.bfloat16):
    """ALL hierarchy levels in one fused forward (round-3: the 5-level
    model stack bounds tile inference at ~115k crowns/s, scripts/
    bench_tile_probe.py, because each level's stage-1 conv feeds only
    N=32 of the MXU's 128 lanes).

    Every level consumes the SAME images, so the levels' year-ladders fuse
    the way hang2020_eval fuses its two branches: stage-1 runs per year as
    ONE conv with level-concatenated output channels (N = L*32 = 160 for 5
    levels — full lane width), stages 2/3 as groups=Y*L convs, attention
    and classifier Denses as (level, year)-stacked einsums. Math-identical
    to running each LearnedEnsemble separately (tests/test_fused_eval.py).

    variables_list: one standard LearnedEnsemble variables tree per level
    (class counts may differ). images: [B, Y, H, W, C]. Returns a list of
    per-level logits [B, classes_l].
    """
    L = len(variables_list)
    B, Y, H, W, C = images.shape
    x = images.astype(dtype)

    # fold BN per (level, year) and pre-stack
    folded = []  # [stage][level] -> (k [Y,3,3,Cin,F], b [Y,F])
    for i in range(len(STAGE_FILTERS)):
        per_level = []
        for v in variables_list:
            conv = v["params"]["year_models"]["conv{}".format(i + 1)]
            bn_s = v["batch_stats"]["year_models"]["conv{}".format(i + 1)]
            g = conv["bn"]["scale"] / jnp.sqrt(bn_s["bn"]["var"] + 1e-5)
            k = conv["conv"]["kernel"] * g[:, None, None, None, :]
            b = (conv["conv"]["bias"] - bn_s["bn"]["mean"]) * g + conv["bn"]["bias"]
            per_level.append((k, b))
        folded.append(per_level)

    cur = None
    pooled_gated = None
    for i, filters in enumerate(STAGE_FILTERS):
        per_level = folded[i]
        if i == 0:
            # [Y, 3, 3, C, L*F]: same input per level -> one wide conv/year
            k = jnp.concatenate([k for k, _ in per_level], axis=-1)
            b = jnp.concatenate([b for _, b in per_level], axis=-1)  # [Y, L*F]
            y_out = jax.vmap(
                lambda xy, ky, by: _conv(xy, ky, by, dtype=dtype),
                in_axes=(1, 0, 0), out_axes=3,
            )(x, k, b)  # [B, H, W, Y, L*F]
            y_out = y_out.reshape(B, H, W, Y * L * filters)
        else:
            # inputs differ per (year, level): grouped conv, channel layout
            # (year, level, filter) matching stage-1's reshape
            kg = jnp.concatenate(
                [per_level[l][0][y] for y in range(Y) for l in range(L)], axis=-1
            )
            bg = jnp.concatenate(
                [per_level[l][1][y] for y in range(Y) for l in range(L)]
            )
            y_out = _conv(cur, kg, bg, groups=Y * L, dtype=dtype)
        y_out = jax.nn.relu(y_out)
        if i > 0:
            y_out = _maxpool(y_out, 2)
        y_out = y_out.astype(dtype)

        # attention per (year, level): stacked einsums
        pooled = jnp.mean(y_out, axis=(1, 2)).reshape(B, Y, L, filters)
        fc1_k = jnp.stack(
            [v["params"]["year_models"]["attention_{}".format(i + 1)]
              ["attention_fc1"]["kernel"] for v in variables_list], axis=1
        )  # [Y, L, F, F]
        fc1_b = jnp.stack(
            [v["params"]["year_models"]["attention_{}".format(i + 1)]
              ["attention_fc1"]["bias"] for v in variables_list], axis=1
        )  # [Y, L, F]
        fc2_k = jnp.stack(
            [v["params"]["year_models"]["attention_{}".format(i + 1)]
              ["attention_fc2"]["kernel"] for v in variables_list], axis=1
        )
        fc2_b = jnp.stack(
            [v["params"]["year_models"]["attention_{}".format(i + 1)]
              ["attention_fc2"]["bias"] for v in variables_list], axis=1
        )
        a = jax.nn.relu(
            jnp.einsum("bylf,ylfg->bylg", pooled.astype(dtype),
                       fc1_k.astype(dtype)) + fc1_b.astype(dtype)
        )
        a = jax.nn.sigmoid(
            jnp.einsum("bylf,ylfg->bylg", a, fc2_k.astype(dtype))
            + fc2_b.astype(dtype)
        )
        gate = a.reshape(B, 1, 1, Y * L * filters)
        cur = (y_out * gate).astype(dtype)
        if i == len(STAGE_FILTERS) - 1:
            pooled_gated = pooled * a  # [B, Y, L, F]

    # per-level classifier (class counts differ) + masked year mean
    if mask_mode == "batch":
        valid = jnp.any(images != 0, axis=(0, 2, 3, 4))  # [Y]
        mask = valid[None, :, None]
    else:
        valid = jnp.any(images != 0, axis=(2, 3, 4))  # [B, Y]
        mask = valid[:, :, None]
    outs = []
    for l, v in enumerate(variables_list):
        cls = v["params"]["year_models"]["classifier3"]["fc1"]
        scores = (
            jnp.einsum("byf,yfc->byc", pooled_gated[:, :, l, :],
                       cls["kernel"].astype(dtype))
            + cls["bias"].astype(dtype)
        ).astype(jnp.float32)  # [B, Y, C_l]
        m = jnp.broadcast_to(mask.astype(scores.dtype), scores.shape)
        total = jnp.sum(scores * m, axis=1)
        count = jnp.maximum(jnp.sum(m, axis=1), 1.0)
        outs.append(total / count)
    return outs


# ---------------------------------------------------------------------------
# alive/dead ResNet (BN-folded eval forward)
# ---------------------------------------------------------------------------

def resnet_eval(variables, x, depth=50, dtype=jnp.bfloat16):
    """BN-folded eval-mode forward for models.resnet.ResNet.

    The production dead-scoring quirk (reference src/predict.py:156) runs the
    ResNet in train mode, which forces two batch-statistics passes between
    every conv; eval-mode running averages are an affine map that folds into
    the conv weights. Measured on v5e (BENCH_INT8_PROBE.json): the folded
    bf16 trunk runs 11.7k crowns/s vs 6.1k for the train-BN production
    forward. Parity with `model.apply(train=False)` is pinned by
    tests/test_dead.py.

    Returns logits [B, num_classes] in float32.
    """
    params, stats = variables["params"], variables["batch_stats"]

    def fconv(h, p, s, name_c, name_b, strides=(1, 1), padding="SAME"):
        k, b = _fold_bn(p[name_c], p[name_b], s[name_b])
        y = jax.lax.conv_general_dilated(
            h.astype(dtype), k.astype(dtype), strides, padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return y + b.astype(jnp.float32)

    from deeptreeattention_tpu.models.resnet import DEPTHS

    stage_blocks, bottleneck = DEPTHS[depth]
    h = fconv(x, params, stats, "stem_conv", "stem_bn", (2, 2), [(3, 3), (3, 3)])
    h = jax.nn.relu(h)
    h = jax.lax.reduce_window(
        h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    for stage, blocks in enumerate(stage_blocks):
        for bi in range(blocks):
            p = params["stage{}_block{}".format(stage + 1, bi)]
            s = stats["stage{}_block{}".format(stage + 1, bi)]
            strides = (2, 2) if stage > 0 and bi == 0 else (1, 1)
            if bottleneck:
                y = jax.nn.relu(fconv(h, p, s, "Conv_0", "BatchNorm_0"))
                y = jax.nn.relu(fconv(y, p, s, "Conv_1", "BatchNorm_1", strides))
                y = fconv(y, p, s, "Conv_2", "BatchNorm_2")
                res = (fconv(h, p, s, "Conv_3", "BatchNorm_3", strides)
                       if "Conv_3" in p else h)
            else:
                y = jax.nn.relu(fconv(h, p, s, "Conv_0", "BatchNorm_0", strides))
                y = fconv(y, p, s, "Conv_1", "BatchNorm_1")
                res = (fconv(h, p, s, "Conv_2", "BatchNorm_2", strides)
                       if "Conv_2" in p else h)
            h = jax.nn.relu(y + res)
    h = jnp.mean(h, axis=(1, 2))
    return _dense(h, params["fc"], jnp.float32)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

def fused_apply(model):
    """Eval-only apply_fn for `model` using its fused forward when the fused
    form MEASURED faster, else the module's own apply. Drop-in for
    steps.make_eval_step(model.apply) — enabled via
    config["fused_inference"].

    Measured on v5e at batch 4096 (scripts/bench_fused.py):
      * Hang2020: fused 635k vs module 518k patches/s (+23%) -> fused.
      * LearnedEnsemble: fused 162.6k vs module 164.4k crowns/s — a wash
        (per-year-concat stage-1 measured 140k; the vmap stage-1 +
        groups=Y stages 2/3 closed the gap but doesn't win, because the
        big-K stage-1 conv dominates), so the module apply stays the
        production path; `learned_ensemble_eval` remains the measured
        record.
    """
    from deeptreeattention_tpu.models.hang2020 import Hang2020
    from deeptreeattention_tpu.models.metadata import MetadataSensorFusion

    if isinstance(model, Hang2020):
        def apply_fn(variables, images, train=False):
            return hang2020_eval(variables, images, dtype=model.dtype)

        return apply_fn
    if isinstance(model, MetadataSensorFusion):
        def apply_fn(variables, images, site_ids, train=False):
            return metadata_fusion_eval(variables, images, site_ids, dtype=model.dtype)

        return apply_fn
    return model.apply


def eval_apply(model, config):
    """The single dispatch point for config["fused_inference"]: the fused
    eval forward when enabled (and measured faster for this model type),
    else the module apply."""
    if config and config.get("fused_inference"):
        return fused_apply(model)
    return model.apply
