"""Pallas TPU kernels: fully-fused spectral-network inference.

The hot op of the framework is the Hang2020 spectral ladder over 11x11
hyperspectral patches (reference src/models/Hang2020.py:206-240; our flax
twin in models/hang2020.py). XLA runs it as separate HLOs with HBM
round-trips between stages; this kernel runs the WHOLE network for a batch
tile out of VMEM.

Mosaic-native formulation (each constraint was hit and worked around on real
hardware — see docs/PERF.md):

  * Activations live in a FLAT PADDED PIXEL LAYOUT: pixel (y, x) sits at
    flat index y*stride + x with stride a multiple of 8 (sublane-aligned),
    junk columns zeroed. 3x3 SAME convs then become nine CONTIGUOUS slices
    of the flat axis, each a single [BT, P, Cin] x [Cin, F] MXU matmul —
    no reshapes through misaligned (11, 11) shapes, no scatter, no gather.
  * 2x2 max pooling is four 0/1 SELECTION MATMULS (one per tap) + eltwise
    max; the selector also re-strides into the next stage's layout and
    drops junk rows for free. (Mosaic supports neither 6-D reshapes,
    strided slices, nor cross-vreg gathers.)
  * Eval-mode BatchNorm is folded into conv weights (fold_bn).
  * Channel attention = masked spatial mean (mask matmul) -> two small
    Dense matmuls -> sigmoid gate.

Numerics match the flax forward exactly (interpret-mode parity tests and a
compiled-on-TPU conv parity check).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STAGE_FILTERS = (32, 64, 128)

# flat layout constants for the 11x11 ladder
S1, PV1, PB1 = 16, 11 * 16, 14 * 16   # stage-1/2 conv space (11x11)
S2, PV2, PB2 = 8, 5 * 8, 8 * 8        # stage-3 conv space (5x5)
PV3 = 2 * 8                            # final 2x2 space
OFF1 = S1 + 1                          # embed offset: (row+1, col+1)
OFF2 = S2 + 1


# ---------------------------------------------------------------------------
# weight folding / packing / layout constants
# ---------------------------------------------------------------------------

def fold_bn(kernel, bias, scale, beta, mean, var, eps=1e-5):
    """Fold eval-mode BatchNorm into conv kernel+bias (jnp: traceable)."""
    s = jnp.asarray(scale) / jnp.sqrt(jnp.asarray(var) + eps)
    folded_kernel = jnp.asarray(kernel) * s  # [kh, kw, cin, cout] * [cout]
    folded_bias = (jnp.asarray(bias) - jnp.asarray(mean)) * s + jnp.asarray(beta)
    return folded_kernel.astype(jnp.float32), folded_bias.astype(jnp.float32)


def pack_spectral_params(variables, weight_dtype=jnp.float32):
    """flax SpectralNetwork variables -> flat tuple of folded arrays.

    Matmul weights are stored at weight_dtype (bf16 halves their VMEM
    footprint and matches the in-kernel compute dtype); biases stay f32."""
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
            jnp.asarray(w, weight_dtype), jnp.asarray(b),
            jnp.asarray(att["attention_fc1"]["kernel"], weight_dtype),
            jnp.asarray(att["attention_fc1"]["bias"], jnp.float32),
            jnp.asarray(att["attention_fc2"]["kernel"], weight_dtype),
            jnp.asarray(att["attention_fc2"]["bias"], jnp.float32),
        ]
    cls = p["classifier3"]["fc1"]
    flat += [jnp.asarray(cls["kernel"], weight_dtype), jnp.asarray(cls["bias"], jnp.float32)]
    return tuple(flat)


def _valid_mask(n, stride, pbuf_valid):
    """[pbuf_valid] float32 mask: 1 where (q // stride < n) and (q % stride < n)."""
    q = np.arange(pbuf_valid)
    return (((q // stride) < n) & ((q % stride) < n)).astype(np.float32)


def pool_selectors_flat(n, src_stride, dst_stride):
    """[4, dst_rows, src_rows] 0/1 selectors: 2x2/stride-2 pool from an
    n x n grid in src_stride layout to (n//2) x (n//2) in dst_stride layout."""
    n2 = n // 2
    src_rows = n * src_stride
    sel = np.zeros((4, n2 * dst_stride, src_rows), np.float32)
    for i in range(n2):
        for j in range(n2):
            m = i * dst_stride + j
            sel[0, m, (2 * i) * src_stride + 2 * j] = 1.0
            sel[1, m, (2 * i + 1) * src_stride + 2 * j] = 1.0
            sel[2, m, (2 * i) * src_stride + 2 * j + 1] = 1.0
            sel[3, m, (2 * i + 1) * src_stride + 2 * j + 1] = 1.0
    return sel


def layout_constants():
    """All host-side constant tensors the kernel consumes."""
    return (
        jnp.asarray(_valid_mask(11, S1, PV1)),            # mask1 [176]
        jnp.asarray(_valid_mask(5, S2, PV2)),             # mask2 [40]
        jnp.asarray(_valid_mask(2, S2, PV3)),             # mask3 [16]
        jnp.asarray(pool_selectors_flat(11, S1, S2)[:, :PV2, :PV1]),  # [4, 40, 176]
        jnp.asarray(pool_selectors_flat(5, S2, S2)[:, :PV3, :PV2]),   # [4, 16, 40]
    )


# ---------------------------------------------------------------------------
# kernel body helpers (pure jnp on VMEM values; all shapes static)
# ---------------------------------------------------------------------------

def _conv_flat(xbuf, w, b, stride, pv, compute_dtype):
    """3x3 SAME conv in flat layout: xbuf [BT, PBUF, Cin] (data embedded at
    offset stride+1), w [3,3,Cin,F] -> [BT, pv, F] float32 + bias + relu."""
    f = w.shape[-1]
    bt = xbuf.shape[0]
    acc = jnp.zeros((bt, pv, f), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            off = dy * stride + dx
            src = xbuf[:, off : off + pv, :]
            acc = acc + jax.lax.dot_general(
                src.astype(compute_dtype), w[dy, dx].astype(compute_dtype),
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    return jnp.maximum(acc + b, 0.0)


def _attend_flat(x, mask, n_valid, w1, b1, w2, b2, compute_dtype):
    """Channel gating with masked spatial mean over the flat pixel axis.
    Returns (gated-and-masked x, pooled gated features)."""
    pooled = jax.lax.dot_general(
        x, mask, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / n_valid  # [BT, F]
    a = jnp.maximum(
        jax.lax.dot_general(
            pooled.astype(compute_dtype), w1.astype(compute_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1, 0.0,
    )
    a = jax.nn.sigmoid(
        jax.lax.dot_general(
            a.astype(compute_dtype), w2.astype(compute_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2
    )
    gated = x * a[:, None, :] * mask[None, :, None]
    feats = jax.lax.dot_general(
        gated, mask, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / n_valid
    return gated, feats


def _pool_flat(x, sel):
    """Max pool via four selection matmuls; sel [4, M, P], x [BT, P, F]."""
    bt, _, f = x.shape
    m = sel.shape[1]

    def tap(k):
        s = jnp.broadcast_to(sel[k][None], (bt, m, sel.shape[2]))
        return jax.lax.dot_general(
            s, x, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    return jnp.maximum(jnp.maximum(tap(0), tap(1)), jnp.maximum(tap(2), tap(3)))


def _embed(x, offset, pbuf):
    """Place [BT, PV, F] into a zero [BT, pbuf, F] buffer at `offset`."""
    return jnp.pad(x, ((0, 0), (offset, pbuf - x.shape[1] - offset), (0, 0)))


def _spectral_body(xbuf, weights, consts, compute_dtype):
    """Full ladder on a VMEM-resident batch tile; returns [BT, classes]."""
    (w1, b1, a1w1, a1b1, a1w2, a1b2,
     w2, b2, a2w1, a2b1, a2w2, a2b2,
     w3, b3, a3w1, a3b1, a3w2, a3b2,
     cw, cb) = weights
    mask1, mask2, mask3, sel1, sel2 = consts

    # stage 1 (11x11): conv -> attend
    x = _conv_flat(xbuf, w1, b1, S1, PV1, compute_dtype)
    x, _ = _attend_flat(x, mask1, 121.0, a1w1, a1b1, a1w2, a1b2, compute_dtype)
    # stage 2: conv on 11x11 -> pool to 5x5 (stride-8 layout) -> attend
    x = _conv_flat(_embed(x, OFF1, PB1), w2, b2, S1, PV1, compute_dtype)
    x = _pool_flat(x, sel1)
    x, _ = _attend_flat(x, mask2, 25.0, a2w1, a2b1, a2w2, a2b2, compute_dtype)
    # stage 3: conv on 5x5 -> pool to 2x2 -> attend
    x = _conv_flat(_embed(x, OFF2, PB2), w3, b3, S2, PV2, compute_dtype)
    x = _pool_flat(x, sel2)
    _, feats = _attend_flat(x, mask3, 4.0, a3w1, a3b1, a3w2, a3b2, compute_dtype)

    return jax.lax.dot_general(
        feats.astype(compute_dtype), cw.astype(compute_dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + cb


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------

def to_flat_layout(x, dtype=jnp.bfloat16):
    """[B, 11, 11, C] -> flat padded buffer [B, PB1, C] (host/XLA side)."""
    b, h, w, c = x.shape
    assert (h, w) == (11, 11), "flat layout constants assume 11x11 patches"
    xp = jnp.pad(x, ((0, 0), (1, 2), (1, 4), (0, 0)))
    return xp.reshape(b, PB1, c).astype(dtype)


def spectral_infer(variables, x, batch_tile=16, compute_dtype=jnp.bfloat16,
                   interpret=False):
    """Fused inference over [B, 11, 11, C] -> final-stage logits [B, classes].

    Numerically matches SpectralNetwork.apply(..., train=False)[-1] (BN in
    eval mode, bf16 matmuls). B must be a multiple of batch_tile.
    """
    params = pack_spectral_params(variables, weight_dtype=compute_dtype)
    consts = layout_constants()
    b = x.shape[0]
    c = x.shape[-1]
    classes = params[-1].shape[0]
    bt = min(batch_tile, b)
    assert b % bt == 0, "batch {} not divisible by tile {}".format(b, bt)

    xflat = to_flat_layout(x, dtype=compute_dtype)
    inputs = params + consts

    def kernel(x_ref, *refs):
        weight_refs = refs[: len(params)]
        const_refs = refs[len(params) : len(params) + len(consts)]
        out_ref = refs[-1]
        out_ref[...] = _spectral_body(
            x_ref[...],
            tuple(r[...] for r in weight_refs),
            tuple(r[...] for r in const_refs),
            compute_dtype,
        )

    def _spec(p):
        return pl.BlockSpec(
            p.shape, functools.partial(lambda nd, i: (0,) * nd, p.ndim),
            memory_space=pltpu.VMEM,
        )

    return pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, PB1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ] + [_spec(p) for p in inputs],
        out_specs=pl.BlockSpec((bt, classes), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, classes), jnp.float32),
        interpret=interpret,
    )(xflat, *inputs)
