"""Alive/dead (ResNet-50) crown-scoring throughput on one chip.

The find_crowns stage scores every detected crown with a ResNet-50 on
224x224 RGB windows (reference src/predict.py:153-168 marks this HOT).
Measures the production f32 path and the bf16 variant, window gather
included (uint8 tile resident in HBM). Scan-chained + host-read-forced.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args):
    float(fn(*args))
    float(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax

    from deeptreeattention_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from deeptreeattention_tpu.models.dead import IMAGENET_MEAN, IMAGENET_STD
    from deeptreeattention_tpu.models.resnet import ResNet
    from deeptreeattention_tpu.ops.windows import crown_resize_windows_mm

    B = int(os.environ.get("PROBE_BATCH", 64))
    ITERS = int(os.environ.get("PROBE_ITERS", 8))
    rng = np.random.RandomState(0)
    tile = jnp.asarray(rng.randint(0, 255, (2000, 2000, 3)), jnp.uint8)
    rect = jnp.asarray(
        np.stack([rng.randint(0, 1900, B), rng.randint(0, 1900, B),
                  rng.randint(30, 80, B), rng.randint(30, 80, B)], axis=1),
        jnp.int32,
    )

    records = []
    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        model = ResNet(num_classes=2, depth=50, dtype=dtype)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 224, 224, 3), jnp.float32))

        @jax.jit
        def fn(variables, tile, rect):
            def body(carry, _):
                # the production path: selection-matmul windows (7.3x the
                # old advanced-index gather, scripts/bench_dead_probe.py)
                win = crown_resize_windows_mm(tile, rect + carry, size=224,
                                              slab=128)
                x = win / 255.0
                x = (x - IMAGENET_MEAN) / IMAGENET_STD
                # production scoring quirk: train-mode BN (batch statistics)
                probs, _ = model.apply(variables, x, train=True,
                                       mutable=["batch_stats"])
                return (jnp.mean(probs) * 1e-9).astype(jnp.int32), None

            carry, _ = jax.lax.scan(body, jnp.int32(0), None, length=ITERS)
            return carry

        dt = timed(fn, variables, tile, rect)
        rec = {
            "prog": "dead_resnet50_{}".format(name),
            "crowns_per_s": round(B * ITERS / dt),
            "batch": B,
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)

        # opt-in dead.bn_mode: eval_folded — running-average BN folded into
        # conv weights (models/fused.resnet_eval); no batch-stat passes
        from deeptreeattention_tpu.models.fused import resnet_eval

        @jax.jit
        def fn_folded(variables, tile, rect):
            def body(carry, _):
                win = crown_resize_windows_mm(tile, rect + carry, size=224,
                                              slab=128)
                x = win / 255.0
                x = (x - IMAGENET_MEAN) / IMAGENET_STD
                logits = resnet_eval(variables, x, depth=50, dtype=dtype)
                return (jnp.mean(logits) * 1e-9).astype(jnp.int32), None

            carry, _ = jax.lax.scan(body, jnp.int32(0), None, length=ITERS)
            return carry

        dt = timed(fn_folded, variables, tile, rect)
        rec = {
            "prog": "dead_resnet50_{}_folded".format(name),
            "crowns_per_s": round(B * ITERS / dt),
            "batch": B,
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)
    # driver-visible artifact (VERDICT round-2 item 5)
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "BENCH_DEAD.json")
    with open(out, "w") as f:
        json.dump(records, f, indent=1)


if __name__ == "__main__":
    main()
