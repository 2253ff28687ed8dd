"""Probe 2: grouped-conv lowering quality on v5e.

If feature_group_count lowers well, two fusions become available:
  * Hang2020 stage-2/3: both branches' convs as one grouped conv (groups=2)
  * LearnedEnsemble: Y per-year SpectralNetwork stage convs as groups=Y
    (N = Y*32 = 128 for 4 years -> full MXU lane width)

Also probes batch-dim scaling (is batch 4096 enough parallelism?) and a
block-diagonal dense-conv alternative (2x FLOPs but full-N) for comparison.
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

    B = int(os.environ.get("PROBE_BATCH", 4096))
    ITERS = int(os.environ.get("PROBE_ITERS", 16))
    H = W = 11
    rng = np.random.RandomState(0)

    def run(tag, cin, cout, groups, flop_cin):
        x = jnp.asarray(rng.rand(B, H, W, cin), jnp.bfloat16)
        k = jnp.asarray(rng.randn(3, 3, cin // groups, cout) * 0.01, jnp.bfloat16)

        @jax.jit
        def fn(x, k):
            def body(carry, _):
                y = jax.lax.conv_general_dilated(
                    x + carry, k, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=groups,
                    preferred_element_type=jnp.float32,
                )
                return jnp.mean(y).astype(jnp.bfloat16) * jnp.bfloat16(1e-6), None

            carry, _ = jax.lax.scan(body, jnp.bfloat16(0.0), None, length=ITERS)
            return carry

        dt = timed(fn, x, k)
        useful_flops = 2 * B * H * W * 9 * flop_cin * cout * ITERS
        print(json.dumps({
            "probe": tag,
            "us_per_iter": round(dt / ITERS * 1e6, 1),
            "useful_tflops": round(useful_flops / dt / 1e12, 1),
        }), flush=True)

    # reference points (dense)
    run("dense_32_to_64", 32, 64, 1, 32)
    # Hang2020 stage-2 both branches as one grouped conv: 2x(32->64)
    run("group2_64_to_128", 64, 128, 2, 32)
    # year ensemble stage-1: 4x(349->32) grouped; K per group = 349
    run("group4_1396_to_128", 4 * 349, 128, 4, 349)
    # year ensemble stage-2: 4x(32->64)
    run("group4_128_to_256", 128, 256, 4, 32)
    # block-diagonal dense alternative for stage-2 fusion (2x FLOP waste)
    run("blockdiag_dense_64_to_128", 64, 128, 1, 32)


if __name__ == "__main__":
    main()
