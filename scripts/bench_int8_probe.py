"""Probe: does v5e's double-rate int8 MXU path pay off for our two hot
forwards — the alive/dead ResNet-50 (the find_crowns bound, docs/PERF.md
round 3) and the Hang2020-style spectral ladder (the species headline)?

Measures, scan-chained + host-read-forced (CLAUDE.md timing rules):
  1. ResNet-50 fwd, bf16, batch 256, 224^2  — the current record holder
  2. ResNet-50 fwd, int8 convs (s8 x s8 -> s32, per-conv rescale), same shapes
  3. spectral-ladder conv stack, bf16, batch 8192 — headline-bench shape
  4. spectral-ladder conv stack, int8, same shapes

The int8 programs use FAKE static scales (quantization cost modeled as one
mul+round+clip per tensor, the same ops a real PTQ path would run); this
probe times the arithmetic, it does not calibrate. If int8 wins >=1.3x on a
path, build the real PTQ path for it; otherwise record the number and retire
the idea (the Pallas-postmortem discipline).

Writes BENCH_INT8_PROBE.json.
"""
import json
import os
import time

import numpy as np


def _timed(fn, *args):
    """min-of-3 of a scan-chained jitted fn; host read forces execution."""
    import jax

    out = fn(*args)
    jax.tree_util.tree_map(lambda a: np.asarray(a), out)  # compile + run
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(lambda a: np.asarray(a), out)
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    import jax

    from deeptreeattention_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    from jax import lax

    small = os.environ.get("DTA_BENCH_SMALL", "").lower() in ("1", "true", "yes")
    ITERS = 2 if small else 8
    results = {}

    # ---- helpers -----------------------------------------------------------
    def q8(x, scale):
        return jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)

    def conv(x, w, strides=(1, 1)):
        return lax.conv_general_dilated(
            x, w, strides, "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def conv_i8(x8, w8, strides=(1, 1)):
        # s8 x s8 -> s32 on the MXU's double-rate path
        return lax.conv_general_dilated(
            x8, w8, strides, "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )

    rng = np.random.RandomState(0)

    # ---- 1/2: ResNet-50 body shapes ---------------------------------------
    # The timed body is the conv trunk (convs are ~99.8% of ResNet FLOPs);
    # BN/relu modeled as a per-channel scale+bias+relu between convs, exactly
    # what the BN-folded eval path runs.
    B = 8 if small else 256
    S = 32 if small else 224

    def resnet_trunk(x, ws, dtype):
        # stem
        h = conv(x.astype(dtype), ws["stem"].astype(dtype), (2, 2))
        h = jax.nn.relu(h)
        h = lax.reduce_window(h, jnp.array(-jnp.inf, h.dtype), lax.max,
                              (1, 3, 3, 1), (1, 2, 2, 1), "SAME")
        # one bottleneck per stage at representative channel widths; repeat
        # counts folded into the scan below to keep program count low
        for stage, (cin, cmid, reps) in enumerate(
            [(64, 64, 3), (256, 128, 4), (512, 256, 6), (1024, 512, 3)]
        ):
            stride = (1, 1) if stage == 0 else (2, 2)
            h = conv(h, ws["s{}p".format(stage)].astype(dtype), stride)  # projection
            def body(hh, _):
                a = jax.nn.relu(conv(hh, ws["s{}a".format(stage)].astype(dtype)))
                b = jax.nn.relu(conv(a, ws["s{}b".format(stage)].astype(dtype)))
                c = conv(b, ws["s{}c".format(stage)].astype(dtype))
                return jax.nn.relu(hh + c), None
            h, _ = lax.scan(body, h, None, length=reps)
        return jnp.mean(h, axis=(1, 2))

    def resnet_trunk_i8(x, ws, scales):
        h = conv_i8(q8(x, scales), ws["stem_q"], (2, 2)).astype(jnp.bfloat16) * 0.01
        h = jax.nn.relu(h)
        h = lax.reduce_window(h, jnp.array(-jnp.inf, h.dtype), lax.max,
                              (1, 3, 3, 1), (1, 2, 2, 1), "SAME")
        for stage, (cin, cmid, reps) in enumerate(
            [(64, 64, 3), (256, 128, 4), (512, 256, 6), (1024, 512, 3)]
        ):
            stride = (1, 1) if stage == 0 else (2, 2)
            h = conv_i8(q8(h, scales), ws["s{}p_q".format(stage)], stride)
            h = h.astype(jnp.bfloat16) * 0.01
            def body(hh, _):
                a = jax.nn.relu(conv_i8(q8(hh, scales), ws["s{}a_q".format(stage)])
                                .astype(jnp.bfloat16) * 0.01)
                b = jax.nn.relu(conv_i8(q8(a, scales), ws["s{}b_q".format(stage)])
                                .astype(jnp.bfloat16) * 0.01)
                c = conv_i8(q8(b, scales), ws["s{}c_q".format(stage)]) \
                    .astype(jnp.bfloat16) * 0.01
                return jax.nn.relu(hh + c), None
            h, _ = lax.scan(body, h, None, length=reps)
        return jnp.mean(h, axis=(1, 2))

    ws = {"stem": jnp.asarray(rng.randn(7, 7, 3, 64).astype(np.float32) * 0.05)}
    for stage, (cin, cmid, _) in enumerate(
        [(64, 64, 0), (256, 128, 0), (512, 256, 0), (1024, 512, 0)]
    ):
        cout = cmid * 4
        ws["s{}p".format(stage)] = jnp.asarray(rng.randn(1, 1, cin, cout).astype(np.float32) * 0.05)
        ws["s{}a".format(stage)] = jnp.asarray(rng.randn(1, 1, cout, cmid).astype(np.float32) * 0.05)
        ws["s{}b".format(stage)] = jnp.asarray(rng.randn(3, 3, cmid, cmid).astype(np.float32) * 0.05)
        ws["s{}c".format(stage)] = jnp.asarray(rng.randn(1, 1, cmid, cout).astype(np.float32) * 0.05)
    for k in list(ws):
        ws[k + "_q"] = jnp.clip(jnp.round(ws[k] / 0.01), -127, 127).astype(jnp.int8)
    x = jnp.asarray(rng.rand(B, S, S, 3).astype(np.float32))

    def chain(fn):
        def run(x, *rest):
            def body(acc, _):
                out = fn(x + acc * 1e-6, *rest)
                return jnp.float32(out[0, 0]), None
            acc, _ = lax.scan(body, jnp.float32(0.0), None, length=ITERS)
            return acc
        return jax.jit(run)

    bf16_fn = chain(lambda xx: resnet_trunk(xx, ws, jnp.bfloat16))
    dt = _timed(bf16_fn, x)
    results["resnet50_bf16_crowns_per_s"] = round(B * ITERS / dt, 1)

    i8_fn = chain(lambda xx: resnet_trunk_i8(xx, ws, jnp.float32(0.02)))
    dt = _timed(i8_fn, x)
    results["resnet50_int8_crowns_per_s"] = round(B * ITERS / dt, 1)

    # ---- 3/4: spectral-ladder shapes (headline species path) ---------------
    # stage-1-merged Hang2020 eval shape: 3x3 convs 349->64->... on 11x11
    BB = 64 if small else 8192
    P = 11
    ladder_w = [
        jnp.asarray(rng.randn(3, 3, 349, 64).astype(np.float32) * 0.02),
        jnp.asarray(rng.randn(3, 3, 64, 64).astype(np.float32) * 0.05),
        jnp.asarray(rng.randn(3, 3, 64, 128).astype(np.float32) * 0.05),
        jnp.asarray(rng.randn(3, 3, 128, 128).astype(np.float32) * 0.05),
    ]
    ladder_w_q = [jnp.clip(jnp.round(w / 0.01), -127, 127).astype(jnp.int8)
                  for w in ladder_w]
    xs = jnp.asarray(rng.rand(BB, P, P, 349).astype(np.float32))

    def ladder(xx, dtype):
        h = xx.astype(dtype)
        for w in ladder_w:
            h = jax.nn.relu(conv(h, w.astype(dtype)))
        return jnp.mean(h, axis=(1, 2))

    def ladder_i8(xx):
        h = xx.astype(jnp.bfloat16)
        for wq in ladder_w_q:
            h = conv_i8(q8(h, jnp.float32(0.02)), wq).astype(jnp.bfloat16) * 0.01
            h = jax.nn.relu(h)
        return jnp.mean(h, axis=(1, 2))

    lad_bf16 = chain(lambda xx: ladder(xx, jnp.bfloat16))
    dt = _timed(lad_bf16, xs)
    results["ladder_bf16_patches_per_s"] = round(BB * ITERS / dt, 1)

    lad_i8 = chain(ladder_i8)
    dt = _timed(lad_i8, xs)
    results["ladder_int8_patches_per_s"] = round(BB * ITERS / dt, 1)

    results["int8_speedup_resnet"] = round(
        results["resnet50_int8_crowns_per_s"] / results["resnet50_bf16_crowns_per_s"], 3
    )
    results["int8_speedup_ladder"] = round(
        results["ladder_int8_patches_per_s"] / results["ladder_bf16_patches_per_s"], 3
    )
    results["small_shapes"] = small
    print(json.dumps(results))
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "BENCH_INT8_PROBE.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
