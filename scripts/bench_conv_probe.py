"""Probe: where does the Hang2020 eval FLOP rate go on v5e?

Training measures ~108 TFLOP/s on these layers (bench_train.py) but
inference only ~22 TFLOP/s (docs/PERF.md). Hypotheses:
  (a) conv output-feature dim (N=32) underutilizes the 128-wide MXU lanes
  (b) on-device preprocessing is a hidden cost
  (c) the small 11x11 spatial extent prevents efficient tiling at batch 4096

Each probe is a scan-chained jit with a forced host read (axon relay rules,
CLAUDE.md). Run: DTA bench conventions; prints one JSON line per probe.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args):
    float(fn(*args))  # compile + first exec
    float(fn(*args))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    import jax

    from deeptreeattention_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    B, H, W, C = int(os.environ.get("PROBE_BATCH", 4096)), 11, 11, 349
    ITERS = int(os.environ.get("PROBE_ITERS", 16))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, H, W, C), jnp.bfloat16)

    def conv_probe(cout):
        k = jnp.asarray(rng.randn(3, 3, C, cout) * 0.01, jnp.bfloat16)

        @jax.jit
        def fn(x, k):
            def body(carry, _):
                y = jax.lax.conv_general_dilated(
                    x + carry, k, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32,
                )
                return jnp.mean(y).astype(jnp.bfloat16) * jnp.bfloat16(1e-6), None

            carry, _ = jax.lax.scan(body, jnp.bfloat16(0.0), None, length=ITERS)
            return carry

        dt = timed(fn, x, k)
        flops = 2 * B * H * W * 9 * C * cout * ITERS
        return dt, flops / dt / 1e12

    results = {}
    for cout in (32, 64, 128):
        dt, tflops = conv_probe(cout)
        results["conv_349_to_{}".format(cout)] = {
            "us_per_iter": round(dt / ITERS * 1e6, 1),
            "tflops": round(tflops, 1),
        }
        print(json.dumps({"probe": "conv_349_to_{}".format(cout), **results["conv_349_to_{}".format(cout)]}), flush=True)

    # preprocess cost alone
    from deeptreeattention_tpu.ops.preprocess import preprocess_batch

    raw = jnp.asarray(rng.randint(0, 10000, size=(B, H, W, 369)), jnp.float32)

    @jax.jit
    def prep_fn(raw):
        def body(carry, _):
            y = preprocess_batch(raw + carry)
            return jnp.mean(y) * 1e-6, None

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return carry

    dt = timed(prep_fn, raw)
    print(json.dumps({"probe": "preprocess_batch", "us_per_iter": round(dt / ITERS * 1e6, 1),
                      "patches_per_s": round(B * ITERS / dt)}), flush=True)

    # full eval ladders for reference under identical conditions
    from deeptreeattention_tpu.models.hang2020 import Hang2020, SpectralNetwork

    for name, cls in (("spectral", SpectralNetwork), ("hang2020", Hang2020)):
        model = cls(bands=C, classes=20, dtype=jnp.bfloat16)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, C), jnp.float32))
        xf = jnp.asarray(rng.rand(B, H, W, C), jnp.float32)

        @jax.jit
        def eval_fn(variables, xf):
            def body(carry, _):
                out = model.apply(variables, xf + carry, train=False)
                out = out[-1] if isinstance(out, (list, tuple)) else out
                return jnp.mean(out) * 1e-6, None

            carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
            return carry

        dt = timed(eval_fn, variables, xf)
        print(json.dumps({"probe": name + "_eval", "us_per_iter": round(dt / ITERS * 1e6, 1),
                          "patches_per_s": round(B * ITERS / dt)}), flush=True)


if __name__ == "__main__":
    main()
