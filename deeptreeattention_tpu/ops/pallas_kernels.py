"""Pallas TPU kernels: fully-fused spectral-network inference.

The hot op of the framework is the Hang2020 spectral ladder over 11x11
hyperspectral patches (reference src/models/Hang2020.py:206-240; our flax
twin in models/hang2020.py). XLA runs it as a dozen separate HLOs with HBM
round-trips between stages; this kernel runs the WHOLE network for a batch
tile out of VMEM:

  stage i in {1,2,3}:
    conv3x3(SAME)          -> 9 shifted MXU matmuls, BN folded into weights
    ReLU
    channel attention      -> spatial mean, 2 small matmuls, sigmoid gate
    (stage>1: 2x2 max pool before the conv, torch floor semantics)
  final classifier matmul  -> [BT, classes]

Weights arrive pre-folded (fold_bn_params): W' = W * s / sqrt(var+eps),
b' = (b - mean) * s / sqrt(var+eps) + beta, so inference BN is free.

Status: numerics are exact against the flax forward (interpret-mode parity
tests). The compiled path is OPT-IN (`config["use_pallas"]`) and currently
experimental: Mosaic-compatible formulations are in place for every op
(matmul pooling, scatter-free conv accumulation), but remote-compile times
for the whole-ladder kernel on this environment's tunnel are prohibitive, so
the XLA path (which already exceeds the throughput target by ~10x) remains
the default. Revisit as per-stage kernels if whole-ladder compile stays slow.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STAGE_FILTERS = (32, 64, 128)


# ---------------------------------------------------------------------------
# weight folding / packing
# ---------------------------------------------------------------------------

def fold_bn(kernel, bias, scale, beta, mean, var, eps=1e-5):
    """Fold eval-mode BatchNorm into conv kernel+bias (jnp: traceable)."""
    s = jnp.asarray(scale) / jnp.sqrt(jnp.asarray(var) + eps)
    folded_kernel = jnp.asarray(kernel) * s  # [kh, kw, cin, cout] * [cout]
    folded_bias = (jnp.asarray(bias) - jnp.asarray(mean)) * s + jnp.asarray(beta)
    return folded_kernel.astype(jnp.float32), folded_bias.astype(jnp.float32)


def pack_spectral_params(variables):
    """flax SpectralNetwork variables -> flat tuple of folded arrays.

    Order per stage: conv_w [3,3,Cin,F], conv_b [F], att_w1 [F,F], att_b1 [F],
    att_w2 [F,F], att_b2 [F]; then classifier3 w [128,classes], b [classes].
    """
    p = variables["params"]
    bs = variables["batch_stats"]
    flat = []
    for i in (1, 2, 3):
        conv = p["conv{}".format(i)]
        w, b = fold_bn(
            conv["conv"]["kernel"], conv["conv"]["bias"],
            conv["bn"]["scale"], conv["bn"]["bias"],
            bs["conv{}".format(i)]["bn"]["mean"], bs["conv{}".format(i)]["bn"]["var"],
        )
        att = p["attention_{}".format(i)]
        flat += [
            jnp.asarray(w), jnp.asarray(b),
            jnp.asarray(att["attention_fc1"]["kernel"], jnp.float32),
            jnp.asarray(att["attention_fc1"]["bias"], jnp.float32),
            jnp.asarray(att["attention_fc2"]["kernel"], jnp.float32),
            jnp.asarray(att["attention_fc2"]["bias"], jnp.float32),
        ]
    cls = p["classifier3"]["fc1"]
    flat += [jnp.asarray(cls["kernel"], jnp.float32), jnp.asarray(cls["bias"], jnp.float32)]
    return tuple(flat)


# ---------------------------------------------------------------------------
# kernel body helpers (pure jnp on VMEM values; all shapes static)
# ---------------------------------------------------------------------------

def _conv3x3_relu(x, w, b, compute_dtype):
    """x [BT, H, W, Cin], w [3, 3, Cin, F] (BN-folded), zero-pad SAME."""
    bt, h, ww, cin = x.shape
    f = w.shape[-1]
    out = jnp.zeros((bt, h, ww, f), jnp.float32)
    for dy in (-1, 0, 1):
        y0, y1 = max(0, -dy), h - max(0, dy)
        for dx in (-1, 0, 1):
            x0, x1 = max(0, -dx), ww - max(0, dx)
            src = x[:, y0 + dy : y1 + dy, x0 + dx : x1 + dx, :]
            seg = jax.lax.dot_general(
                src.reshape(-1, cin).astype(compute_dtype),
                w[dy + 1, dx + 1].astype(compute_dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # pad the tap back to [bt, h, w, f] and accumulate (scatter-free:
            # .at[].add would capture index constants pallas_call rejects)
            out = out + jnp.pad(
                seg.reshape(bt, y1 - y0, x1 - x0, f),
                ((0, 0), (y0, h - y1), (x0, ww - x1), (0, 0)),
            )
    return jnp.maximum(out + b, 0.0)


def _maxpool2(x, sel=None):
    """2x2/stride-2 max pool (torch floor semantics).

    Mosaic supports neither 6-D reshapes, strided 4-D slices, nor cross-vreg
    gathers, so on the compiled path pooling is four 0/1 SELECTION MATMULS on
    the MXU (sel[k] maps flattened H*W pixels to pooled positions; one per
    2x2 tap) combined with elementwise max — data movement expressed as
    compute, the Mosaic-native formulation. Without `sel` (interpret/tests)
    the reshape form is used.
    """
    bt, h, w, f = x.shape
    h2, w2 = h // 2, w // 2
    if sel is None:
        v = x[:, : h2 * 2, : w2 * 2, :].reshape(bt, h2, 2, w2, 2, f)
        return jnp.max(v, axis=(2, 4))
    m = h2 * w2
    xf = x.reshape(bt, h * w, f)

    def tap(k):
        s = jnp.broadcast_to(sel[k][None], (bt, m, h * w))
        return jax.lax.dot_general(
            s, xf,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    pooled = jnp.maximum(jnp.maximum(tap(0), tap(1)), jnp.maximum(tap(2), tap(3)))
    return pooled.reshape(bt, h2, w2, f)


def pool_selectors(h, w):
    """Host-side [4, h2*w2, h*w] float32 0/1 selection matrices for
    _maxpool2's matmul pooling (one matrix per 2x2 tap)."""
    h2, w2 = h // 2, w // 2
    m = h2 * w2
    sel = np.zeros((4, m, h * w), np.float32)
    for i in range(h2):
        for j in range(w2):
            dst = i * w2 + j
            sel[0, dst, (2 * i) * w + 2 * j] = 1.0
            sel[1, dst, (2 * i + 1) * w + 2 * j] = 1.0
            sel[2, dst, (2 * i) * w + 2 * j + 1] = 1.0
            sel[3, dst, (2 * i + 1) * w + 2 * j + 1] = 1.0
    return sel


def _attend(x, w1, b1, w2, b2, compute_dtype):
    """Channel gating; returns (gated x, pooled gated features)."""
    pooled = jnp.mean(x, axis=(1, 2))  # [BT, F]
    a = jnp.maximum(
        jax.lax.dot_general(
            pooled.astype(compute_dtype), w1.astype(compute_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1,
        0.0,
    )
    a = jax.nn.sigmoid(
        jax.lax.dot_general(
            a.astype(compute_dtype), w2.astype(compute_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2
    )
    gated = x * a[:, None, None, :]
    return gated, jnp.mean(gated, axis=(1, 2))


def _spectral_body(x, weights, compute_dtype, pool_sel=(None, None)):
    """Full ladder on a VMEM-resident batch tile; returns [BT, classes]."""
    (w1, b1, a1w1, a1b1, a1w2, a1b2,
     w2, b2, a2w1, a2b1, a2w2, a2b2,
     w3, b3, a3w1, a3b1, a3w2, a3b2,
     cw, cb) = weights

    # stage 1 (11x11)
    x = _conv3x3_relu(x, w1, b1, compute_dtype)
    x, _ = _attend(x, a1w1, a1b1, a1w2, a1b2, compute_dtype)
    # stage 2 (conv on 11x11 then pool -> 5)
    x = _conv3x3_relu(x, w2, b2, compute_dtype)
    x = _maxpool2(x, pool_sel[0])
    x, _ = _attend(x, a2w1, a2b1, a2w2, a2b2, compute_dtype)
    # stage 3 (conv on 5x5 then pool -> 2)
    x = _conv3x3_relu(x, w3, b3, compute_dtype)
    x = _maxpool2(x, pool_sel[1])
    x, feats = _attend(x, a3w1, a3b1, a3w2, a3b2, compute_dtype)

    return jax.lax.dot_general(
        feats.astype(compute_dtype), cw.astype(compute_dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + cb


# ---------------------------------------------------------------------------
# single-network entry
# ---------------------------------------------------------------------------

def spectral_infer(variables, x, batch_tile=128, compute_dtype=jnp.bfloat16,
                   interpret=False):
    """Fused inference over [B, 11, 11, C] -> final-stage logits [B, classes].

    Numerically matches SpectralNetwork.apply(..., train=False)[-1] (BN in
    eval mode). B must be a multiple of batch_tile (pad + mask upstream).
    """
    params = pack_spectral_params(variables)
    b, h, w, c = x.shape
    classes = params[-1].shape[0]
    bt = min(batch_tile, b)
    assert b % bt == 0, "batch {} not divisible by tile {}".format(b, bt)

    # selection matrices for the two matmul pools
    sel1 = jnp.asarray(pool_selectors(h, w))
    sel2 = jnp.asarray(pool_selectors(h // 2, w // 2))
    inputs = params + (sel1, sel2)

    def kernel(x_ref, *refs):
        weight_refs = refs[: len(params)]
        sel1_ref, sel2_ref, out_ref = refs[len(params):]
        scores = _spectral_body(
            x_ref[...].astype(jnp.float32),
            tuple(r[...] for r in weight_refs),
            compute_dtype,
            pool_sel=(sel1_ref[...], sel2_ref[...]),
        )
        out_ref[...] = scores

    def _spec(p):
        return pl.BlockSpec(
            p.shape, functools.partial(lambda nd, i: (0,) * nd, p.ndim),
            memory_space=pltpu.VMEM,
        )

    input_specs = [_spec(p) for p in inputs]
    return pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
        ] + input_specs,
        out_specs=pl.BlockSpec((bt, classes), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, classes), jnp.float32),
        interpret=interpret,
    )(x, *inputs)
