"""Pallas TPU kernel, round 2: MXU-saturating fused spectral network.

Round-1's fused kernel (ops/pallas_kernels.py) lost to XLA 3.4x (263k vs
883k patches/s, docs/PERF.md). Profiling the formulation showed the loss was
NOT mostly the ~45% flat-layout padding waste (roadmap item 2's hypothesis)
but MXU lane underutilization: every conv tap ran as a [.., Cin] x [Cin, F]
matmul with N = F = 32 or 64 — 25-50% of the 128-wide MXU — and the
selection-matmul pooling added near-conv-sized FLOPs on top.

This kernel reformulates the ladder so every matmul fills the MXU:

  * conv1 (349 -> 32): TAP-MERGED N. One matmul [BT*224, 349] x [349, 288]
    computes all nine taps' products at every flat position (N = 9*32 = 288
    lanes); the SAME-conv combine is then nine VPU shift-adds
    out[p] += TP[p + off_t, t*32:(t+1)*32].
  * conv2 (32 -> 64) and conv3 (64 -> 128): IM2COL K. Nine shifted slices
    concatenate on the lane axis (K = 288 / 576), one matmul each with
    N = 64 / 128.
  * Pooling: everything stays in the ORIGINAL stride-16 flat space the
    whole way. 2x2/stride-2 max pool = elementwise max of four shifted
    slices (VPU, post-ReLU so zero junk is harmless); the "pooled grid" is
    simply the even-coordinate positions, selected by per-stage masks. The
    stage-3 conv's 3x3-on-5x5 taps become stride-2 offsets (2*dy*16 + 2*dx)
    in the same space — still contiguous slices. No selection matmuls, no
    re-striding, no compaction.

Cost: conv2/conv3 products are computed at all 176 flat positions instead
of the 25/4 valid ones, at ~4x the MXU utilization per matmul.

MEASURED RESULT (docs/PERF.md): 278k patches/s vs XLA's 895k on the real
chip — the reformulation did NOT close the gap. In-kernel accounting puts
the loss in Mosaic relayouts for the sublane-misaligned tap shifts
(dx = 1, 2 offsets at stride 16), which are intrinsic to flat layouts of an
11x11 grid. RETIRED as an optimization path; kept as parity-tested
documentation of the measured design space. Production default is XLA.

Numerics match SpectralNetwork.apply(train=False)[-1] with eval-mode BN
folded into the convs (interpret-mode parity test in tests/test_pallas.py).
Reference ladder: src/models/Hang2020.py:206-240.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deeptreeattention_tpu.ops.pallas_kernels import fold_bn

S = 16                 # flat stride: pixel (y, x) at p = y*16 + x
P = 11 * S             # 176 flat positions covering the 11x11 grid
PB = 14 * S            # embed buffer rows (offset 17 + max tap offset 34)
OFF = S + 1            # SAME-conv embed offset (row+1, col+1)
TAPS1 = [dy * S + dx for dy in range(3) for dx in range(3)]          # 3x3 on 11x11
TAPS3 = [2 * dy * S + 2 * dx for dy in range(3) for dx in range(3)]  # 3x3 on the 5x5 (stride-2)
OFF3 = 2 * OFF         # embed offset for the stride-2 stage (34)
PB3 = 16 * S           # embed rows for stage 3 (offset 34 + max offset 68 -> 244 < 256)


def _mask(valid_positions):
    m = np.zeros(P, np.float32)
    m[list(valid_positions)] = 1.0
    return m


def layout_masks():
    """Per-stage validity masks over the flat axis."""
    m1 = [y * S + x for y in range(11) for x in range(11)]
    m2 = [2 * i * S + 2 * j for i in range(5) for j in range(5)]   # 5x5 after pool1
    m3 = [4 * i * S + 4 * j for i in range(2) for j in range(2)]   # 2x2 after pool2
    return jnp.asarray(_mask(m1)), jnp.asarray(_mask(m2)), jnp.asarray(_mask(m3))


def pack_params_v2(variables, weight_dtype=jnp.bfloat16):
    """flax SpectralNetwork variables -> (W1m [C,288], b1, a1.., W2f [288,64],
    b2, a2.., W3f [576,128], b3, a3.., cls W/b) with BN folded."""
    p = variables["params"]
    bs = variables["batch_stats"]
    folded = []
    for i in (1, 2, 3):
        conv = p["conv{}".format(i)]
        w, b = fold_bn(
            conv["conv"]["kernel"], conv["conv"]["bias"],
            conv["bn"]["scale"], conv["bn"]["bias"],
            bs["conv{}".format(i)]["bn"]["mean"], bs["conv{}".format(i)]["bn"]["var"],
        )
        folded.append((w, b))

    (w1, b1), (w2, b2), (w3, b3) = folded
    c = w1.shape[2]
    # conv1: tap-merged N -> [C, 9*32]
    w1m = jnp.concatenate(
        [w1[dy, dx] for dy in range(3) for dx in range(3)], axis=1
    ).reshape(c, 9 * 32)
    # conv2/conv3: im2col K -> [9*Cin, F]
    w2f = jnp.concatenate(
        [w2[dy, dx] for dy in range(3) for dx in range(3)], axis=0
    )  # [288, 64]
    w3f = jnp.concatenate(
        [w3[dy, dx] for dy in range(3) for dx in range(3)], axis=0
    )  # [576, 128]

    cls = p["classifier3"]["fc1"]
    return tuple(
        [jnp.asarray(w1m, weight_dtype), jnp.asarray(b1, jnp.float32)]
        + [jnp.asarray(w2f, weight_dtype), jnp.asarray(b2, jnp.float32)]
        + [jnp.asarray(w3f, weight_dtype), jnp.asarray(b3, jnp.float32)]
        + [
            t
            for i in (1, 2, 3)
            for t in (
                jnp.asarray(p["attention_{}".format(i)]["attention_fc1"]["kernel"], weight_dtype),
                jnp.asarray(p["attention_{}".format(i)]["attention_fc1"]["bias"], jnp.float32),
                jnp.asarray(p["attention_{}".format(i)]["attention_fc2"]["kernel"], weight_dtype),
                jnp.asarray(p["attention_{}".format(i)]["attention_fc2"]["bias"], jnp.float32),
            )
        ]
        + [jnp.asarray(cls["kernel"], weight_dtype), jnp.asarray(cls["bias"], jnp.float32)]
    )


def _mm(a, b, compute_dtype):
    return jax.lax.dot_general(
        a.astype(compute_dtype), b.astype(compute_dtype),
        dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _attend(x, mask, n_valid, w1, b1, w2, b2, compute_dtype):
    """Masked-mean channel gating over the flat axis; returns (gated, feats)."""
    pooled = jax.lax.dot_general(
        x, mask, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / n_valid
    a = jnp.maximum(_mm(pooled, w1, compute_dtype) + b1, 0.0)
    a = jax.nn.sigmoid(_mm(a, w2, compute_dtype) + b2)
    gated = x * a[:, None, :] * mask[None, :, None]
    feats = jax.lax.dot_general(
        gated, mask, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / n_valid
    return gated, feats


def _embed(x, offset, rows):
    return jnp.pad(x, ((0, 0), (offset, rows - x.shape[1] - offset), (0, 0)))


def _pool(y, taps):
    """Shifted-slice max over pool taps; y must be >= 0 (post-ReLU)."""
    ypad = _embed(y, 0, P + taps[-1])
    out = ypad[:, taps[0] : taps[0] + P, :]
    for t in taps[1:]:
        out = jnp.maximum(out, ypad[:, t : t + P, :])
    return out


def _body_v2(xbuf, weights, masks, compute_dtype, col2_ref, col3_ref):
    (w1m, b1, w2f, b2, w3f, b3,
     a1w1, a1b1, a1w2, a1b2,
     a2w1, a2b1, a2w2, a2b2,
     a3w1, a3b1, a3w2, a3b2,
     cw, cb) = weights
    mask1, mask2, mask3 = masks
    f1 = 32

    # ---- stage 1: tap-merged conv (N = 288) + shift-add combine ----
    tp = _mm(xbuf, w1m, compute_dtype).astype(compute_dtype)  # [BT, PB, 288]
    acc = jnp.zeros((xbuf.shape[0], P, f1), jnp.float32)
    for t, off in enumerate(TAPS1):
        acc = acc + tp[:, off : off + P, t * f1 : (t + 1) * f1].astype(jnp.float32)
    x1 = jnp.maximum(acc + b1, 0.0)
    x1, _ = _attend(x1, mask1, 121.0, a1w1, a1b1, a1w2, a1b2, compute_dtype)

    # ---- stage 2: im2col conv (K = 288, N = 64) -> in-space pool -> attend ----
    # im2col buffers are built with REF STORES into VMEM scratch: Mosaic
    # rejects lane-concatenating sublane-misaligned slices, but masked
    # stores relayout fine
    x1e = _embed(x1.astype(compute_dtype), OFF, PB)
    for t, off in enumerate(TAPS1):
        col2_ref[:, :, t * f1 : (t + 1) * f1] = x1e[:, off : off + P, :]
    y2 = jnp.maximum(_mm(col2_ref[...], w2f, compute_dtype) + b2, 0.0)
    m2 = _pool(y2, [0, 1, S, S + 1])
    x2, _ = _attend(m2, mask2, 25.0, a2w1, a2b1, a2w2, a2b2, compute_dtype)

    # ---- stage 3: stride-2 im2col conv (K = 576, N = 128) -> pool -> attend ----
    x2e = _embed(x2.astype(compute_dtype), OFF3, PB3)
    for t, off in enumerate(TAPS3):
        col3_ref[:, :, t * 64 : (t + 1) * 64] = x2e[:, off : off + P, :]
    y3 = jnp.maximum(_mm(col3_ref[...], w3f, compute_dtype) + b3, 0.0)
    m3 = _pool(y3, [0, 2, 2 * S, 2 * S + 2])
    _, feats = _attend(m3, mask3, 4.0, a3w1, a3b1, a3w2, a3b2, compute_dtype)

    return _mm(feats, cw, compute_dtype) + cb


def to_flat_v2(x, dtype=jnp.bfloat16):
    """[B, 11, 11, C] -> flat embed buffer [B, PB, C] at offset (1, 1)."""
    b, h, w, c = x.shape
    assert (h, w) == (11, 11)
    xp = jnp.pad(x, ((0, 0), (1, 2), (1, 4), (0, 0)))
    return xp.reshape(b, PB, c).astype(dtype)


def spectral_infer_packed(variables, x, batch_tile=32, compute_dtype=jnp.bfloat16,
                          interpret=False):
    """Fused inference [B, 11, 11, C] -> final-stage logits [B, classes]."""
    params = pack_params_v2(variables, weight_dtype=compute_dtype)
    masks = layout_masks()
    b, c = x.shape[0], x.shape[-1]
    classes = params[-1].shape[0]
    bt = min(batch_tile, b)
    assert b % bt == 0, "batch {} not divisible by tile {}".format(b, bt)

    xflat = to_flat_v2(x, dtype=compute_dtype)
    inputs = params + masks

    def kernel(x_ref, *refs):
        weight_refs = refs[: len(params)]
        mask_refs = refs[len(params) : len(params) + 3]
        out_ref = refs[len(params) + 3]
        col2_ref, col3_ref = refs[-2:]
        out_ref[...] = _body_v2(
            x_ref[...],
            tuple(r[...] for r in weight_refs),
            tuple(r[...] for r in mask_refs),
            compute_dtype,
            col2_ref,
            col3_ref,
        )

    def _spec(p):
        return pl.BlockSpec(
            p.shape, functools.partial(lambda nd, i: (0,) * nd, p.ndim),
            memory_space=pltpu.VMEM,
        )

    flops_tile = 2 * bt * (PB * c * 288 + P * 288 * 64 + P * 576 * 128)
    return pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, PB, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ] + [_spec(p) for p in inputs],
        out_specs=pl.BlockSpec((bt, classes), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, classes), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bt, P, 288), compute_dtype),
            pltpu.VMEM((bt, P, 576), compute_dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops_tile * (b // bt),
            bytes_accessed=xflat.size * 2 + b * classes * 4,
            transcendentals=b * (32 + 64 + 128),
        ),
        interpret=interpret,
    )(xflat, *inputs)
