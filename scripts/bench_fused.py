"""End-to-end measurement: fused MXU eval forwards vs the flax module path.

Programs (each scan-chained, host-read-forced — axon relay rules):
  A. baseline bench.py step: preprocess(f32 raw) + Hang2020.apply  (bf16)
  B. fused step: preprocess(int16 raw -> bf16) + fused.hang2020_eval
  C. baseline ensemble: LearnedEnsemble.apply (nn.vmap), Y=4
  D. fused ensemble: fused.learned_ensemble_eval

Prints one JSON line per program.
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

    from deeptreeattention_tpu.models import fused
    from deeptreeattention_tpu.models.hang2020 import Hang2020
    from deeptreeattention_tpu.models.year import LearnedEnsemble
    from deeptreeattention_tpu.ops.preprocess import preprocess_batch

    B = int(os.environ.get("PROBE_BATCH", 4096))
    ITERS = int(os.environ.get("PROBE_ITERS", 8))
    ONLY = os.environ.get("PROBE_ONLY", "ABCD")
    RAW, BANDS, CLASSES, YEARS = 369, 349, 20, 4
    rng = np.random.RandomState(0)

    model = Hang2020(bands=BANDS, classes=CLASSES, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 11, 11, BANDS), jnp.float32))
    raw_f32 = jnp.asarray(rng.randint(0, 10000, size=(B, 11, 11, RAW)), jnp.float32)
    raw_i16 = jnp.asarray(np.asarray(raw_f32, np.int16))

    if "A" in ONLY:
        @jax.jit
        def prog_a(variables, raw):
            def body(carry, _):
                x = preprocess_batch(raw + carry)
                out = model.apply(variables, x, train=False)
                return jnp.mean(out) * 1e-9, None

            carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
            return carry

        dt = timed(prog_a, variables, raw_f32)
        print(json.dumps({"prog": "A_baseline_hang", "patches_per_s": round(B * ITERS / dt)}), flush=True)

    if "B" in ONLY:
        @jax.jit
        def prog_b(variables, raw):
            def body(carry, _):
                x = preprocess_batch(raw + carry, out_dtype=jnp.bfloat16)
                out = fused.hang2020_eval(variables, x)
                return (jnp.mean(out) * 1e-9).astype(jnp.int16), None

            carry, _ = jax.lax.scan(body, jnp.int16(0), None, length=ITERS)
            return carry

        dt = timed(prog_b, variables, raw_i16)
        print(json.dumps({"prog": "B_fused_hang_i16", "patches_per_s": round(B * ITERS / dt)}), flush=True)

    ens = LearnedEnsemble(years=YEARS, classes=CLASSES, bands=BANDS, dtype=jnp.bfloat16)
    images = jnp.asarray(rng.rand(B // 4, YEARS, 11, 11, BANDS), jnp.float32)
    evars = ens.init(jax.random.PRNGKey(1), images)

    if "C" in ONLY:
        @jax.jit
        def prog_c(evars, images):
            def body(carry, _):
                out = ens.apply(evars, images + carry, train=False)
                return jnp.mean(out) * 1e-9, None

            carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
            return carry

        dt = timed(prog_c, evars, images)
        print(json.dumps({"prog": "C_baseline_ensemble",
                          "crowns_per_s": round(B // 4 * ITERS / dt),
                          "year_patches_per_s": round(B // 4 * YEARS * ITERS / dt)}), flush=True)

    if "D" in ONLY:
        @jax.jit
        def prog_d(evars, images):
            def body(carry, _):
                out = fused.learned_ensemble_eval(evars, images + carry)
                return jnp.mean(out) * 1e-9, None

            carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
            return carry

        dt = timed(prog_d, evars, images)
        print(json.dumps({"prog": "D_fused_ensemble",
                          "crowns_per_s": round(B // 4 * ITERS / dt),
                          "year_patches_per_s": round(B // 4 * YEARS * ITERS / dt)}), flush=True)


if __name__ == "__main__":
    main()
