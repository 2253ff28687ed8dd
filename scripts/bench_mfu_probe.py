"""Training/eval MFU decomposition (round-3 item 5, roadmap item 4).

Questions, each answered by a measured number:
  1. fwd-only vs fwd+bwd+adam on the training model (LearnedEnsemble,
     4 years, bf16, batch 2048): if bwd costs ~2x fwd, XLA's autodiff is
     already at the canonical ratio and a custom VJP has no headroom.
  2. eval forward at growing batch: is the 26%-MFU eval gap batch-bound?
  3. eval forward with donated input buffer: does donation matter for eval?

Scan-chained + host-read-forced like every bench here.

    python scripts/bench_mfu_probe.py
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
    import optax

    from deeptreeattention_tpu.models.year import LearnedEnsemble
    from deeptreeattention_tpu.train import steps as train_steps

    YEARS, BANDS, CLASSES, ITERS = 4, 349, 20, 8
    rng = np.random.RandomState(0)

    records = []

    def report(name, per_s, extra=None):
        rec = {"prog": name, "per_s": round(per_s)}
        rec.update(extra or {})
        records.append(rec)
        print(json.dumps(rec), flush=True)

    # --- 1. training model: fwd-only vs fwd+bwd+adam at batch 2048 --------
    B = 2048
    model = LearnedEnsemble(years=YEARS, classes=CLASSES, bands=BANDS,
                            dtype=jnp.bfloat16)
    x = jnp.asarray(rng.rand(B, YEARS, 11, 11, BANDS).astype(np.float32))
    y = jnp.asarray(rng.randint(0, CLASSES, B), jnp.int32)
    mask = jnp.ones(B, jnp.float32)
    weights = jnp.ones(CLASSES, jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1])

    @jax.jit
    def fwd_only(variables, x):
        def body(carry, _):
            logits, _ = model.apply(variables, x + carry.astype(jnp.float32),
                                    train=True, mutable=["batch_stats"])
            return (jnp.mean(logits) * 1e-9).astype(jnp.int32), None

        carry, _ = jax.lax.scan(body, jnp.int32(0), None, length=ITERS)
        return carry

    dt = timed(fwd_only, variables, x)
    fwd_per_s = B * ITERS / dt
    report("train_model_fwd_only_b2048", fwd_per_s)

    optimizer = optax.adam(1e-4)
    step_fn = train_steps.make_train_step(model.apply, optimizer)

    def bench_fn(params, stats, opt_state, x):
        def body(carry, _):
            params, stats, opt, acc = carry
            params, stats, opt, loss = step_fn(params, stats, opt, x, y, mask, weights)
            return (params, stats, opt, acc + loss), None

        out, _ = jax.lax.scan(
            body, (params, stats, opt_state, jnp.float32(0.0)), None, length=ITERS
        )
        return out

    bench_fn = jax.jit(bench_fn, donate_argnums=(0, 1, 2))
    params, stats = variables["params"], variables["batch_stats"]
    opt_state = optimizer.init(params)

    def run(params, stats, opt_state):
        params, stats, opt_state, acc = bench_fn(params, stats, opt_state, x)
        float(acc)
        return params, stats, opt_state

    params, stats, opt_state = run(params, stats, opt_state)
    params, stats, opt_state = run(params, stats, opt_state)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        params, stats, opt_state = run(params, stats, opt_state)
        ts.append(time.perf_counter() - t0)
    step_per_s = B * ITERS / min(ts)
    report("train_model_fwd_bwd_adam_b2048", step_per_s,
           {"bwd_over_fwd": round(fwd_per_s / step_per_s - 1, 2)})

    # --- 2/3. fused Hang2020 eval: batch scaling + donation ---------------
    from deeptreeattention_tpu.models.fused import hang2020_eval
    from deeptreeattention_tpu.models.hang2020 import Hang2020
    from deeptreeattention_tpu.ops.preprocess import minmax_scale_pixels

    hmodel = Hang2020(bands=349, classes=20, dtype=jnp.bfloat16)
    hvars = hmodel.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 11, 11, 349), jnp.float32))

    for B in (8192, 16384):
        raw = jnp.asarray(rng.randint(0, 10000, (B, 11, 11, 369)), jnp.int16)

        @jax.jit
        def eval_fn(hvars, raw):
            def body(carry, _):
                x = minmax_scale_pixels(raw[..., 10:-10] + carry)
                out = hang2020_eval(hvars, x)
                return (jnp.mean(out) * 1e-9).astype(jnp.int32), None

            carry, _ = jax.lax.scan(body, jnp.int32(0), None, length=ITERS)
            return carry

        dt = timed(eval_fn, hvars, raw)
        report("hang2020_fused_eval_b{}".format(B), B * ITERS / dt)

    # donation is NOT probed: eval has no aliasable state — the input is
    # int16 (halved already) and the output is [B, 20] f32; donating the
    # input buys nothing the allocator doesn't already do. The training
    # path's donation win is about reusing the optimizer-state HBM, which
    # eval doesn't have.

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "BENCH_MFU_PROBE.json")
    with open(out, "w") as f:
        json.dump(records, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
