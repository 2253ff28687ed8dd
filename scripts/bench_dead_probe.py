"""Decompose alive/dead scoring cost: window gather vs ResNet forward vs BN
mode (round-3 item 2 — round 2 measured 1.7k crowns/s ≈ 7% MFU and stopped).

Programs are scan-chained + host-read-forced (see bench.py: on the axon
relay only a device->host read proves execution).

    python scripts/bench_dead_probe.py
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
    from deeptreeattention_tpu.ops.windows import crown_resize_windows

    B = int(os.environ.get("PROBE_BATCH", 64))
    ITERS = int(os.environ.get("PROBE_ITERS", 8))
    rng = np.random.RandomState(0)
    tile = jnp.asarray(rng.randint(0, 255, (2000, 2000, 3)), jnp.uint8)
    rect = jnp.asarray(
        np.stack([rng.randint(0, 1900, B), rng.randint(0, 1900, B),
                  rng.randint(30, 80, B), rng.randint(30, 80, B)], axis=1),
        jnp.int32,
    )
    x64 = jnp.asarray(rng.rand(B, 224, 224, 3), jnp.float32)

    def report(name, dt, unit_count):
        print(json.dumps({"prog": name, "per_s": round(unit_count / dt),
                          "batch": B}), flush=True)

    # 1) gather + normalize only (no model)
    @jax.jit
    def gather_only(tile, rect):
        def body(carry, _):
            win = crown_resize_windows(tile, rect + carry, size=224,
                                       boundless=True)
            x = win.astype(jnp.float32) / 255.0
            x = (x - IMAGENET_MEAN) / IMAGENET_STD
            return (jnp.sum(x) * 1e-9).astype(jnp.int32), None

        carry, _ = jax.lax.scan(body, jnp.int32(0), None, length=ITERS)
        return carry

    report("gather_normalize_only", timed(gather_only, tile, rect), B * ITERS)

    # 1b) selection-matmul window path (the fix): dynamic-slice DMA + one-hot
    # matmuls instead of a 50k-offset gather
    from deeptreeattention_tpu.ops.windows import crown_resize_windows_mm

    @jax.jit
    def gather_mm_only(tile, rect):
        def body(carry, _):
            win = crown_resize_windows_mm(tile, rect + carry, size=224, slab=128)
            x = win / 255.0
            x = (x - IMAGENET_MEAN) / IMAGENET_STD
            return (jnp.sum(x) * 1e-9).astype(jnp.int32), None

        carry, _ = jax.lax.scan(body, jnp.int32(0), None, length=ITERS)
        return carry

    report("gather_mm_normalize_only", timed(gather_mm_only, tile, rect), B * ITERS)

    # 1c) full production path with the mm gather (train-BN quirk), f32+bf16
    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        model = ResNet(num_classes=2, depth=50, dtype=dtype)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 224, 224, 3), jnp.float32))

        @jax.jit
        def full_mm(variables, tile, rect):
            def body(carry, _):
                win = crown_resize_windows_mm(tile, rect + carry, size=224,
                                              slab=128)
                x = win / 255.0
                x = (x - IMAGENET_MEAN) / IMAGENET_STD
                probs, _ = model.apply(variables, x, train=True,
                                       mutable=["batch_stats"])
                return (jnp.mean(probs) * 1e-9).astype(jnp.int32), None

            carry, _ = jax.lax.scan(body, jnp.int32(0), None, length=ITERS)
            return carry

        report("full_mm_trainbn_{}".format(name),
               timed(full_mm, variables, tile, rect), B * ITERS)

    # 2) ResNet-50 forward only, train-mode BN (the production quirk)
    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        model = ResNet(num_classes=2, depth=50, dtype=dtype)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 224, 224, 3), jnp.float32))

        @jax.jit
        def fwd_trainbn(variables, x):
            def body(carry, _):
                probs, _ = model.apply(variables, x + carry.astype(jnp.float32),
                                       train=True, mutable=["batch_stats"])
                return (jnp.mean(probs) * 1e-9).astype(jnp.int32), None

            carry, _ = jax.lax.scan(body, jnp.int32(0), None, length=ITERS)
            return carry

        report("fwd_trainbn_{}".format(name), timed(fwd_trainbn, variables, x64),
               B * ITERS)

        @jax.jit
        def fwd_evalbn(variables, x):
            def body(carry, _):
                probs = model.apply(variables, x + carry.astype(jnp.float32),
                                    train=False)
                return (jnp.mean(probs) * 1e-9).astype(jnp.int32), None

            carry, _ = jax.lax.scan(body, jnp.int32(0), None, length=ITERS)
            return carry

        report("fwd_evalbn_{}".format(name), timed(fwd_evalbn, variables, x64),
               B * ITERS)


if __name__ == "__main__":
    main()
