"""Decompose end-to-end tile inference (65.3k crowns/s round 2): window
gather+preprocess vs the 5-level model stack — the dead-scoring probe found
the 224px gather dominated; does the 11px species gather drag too?

    python scripts/bench_tile_probe.py [n_crowns] [slab]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


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

    from deeptreeattention_tpu.models.year import LearnedEnsemble
    from deeptreeattention_tpu.ops.preprocess import BAND_CLIP, minmax_scale_pixels
    from deeptreeattention_tpu.ops.windows import (
        crown_resize_windows,
        crown_resize_windows_mm,
    )

    N_CROWNS = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    SLAB = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    BANDS_RAW, BANDS, YEARS, CLASSES, SIZE = 369, 349, 3, 20, 11
    LEVELS, ITERS = 5, 4

    rng = np.random.RandomState(0)
    tile = jnp.asarray(rng.randint(0, 10000, (SLAB, SLAB, BANDS_RAW)), jnp.int16)
    rect = jnp.asarray(np.stack(
        [rng.randint(0, SLAB - 12, N_CROWNS), rng.randint(0, SLAB - 12, N_CROWNS),
         rng.randint(2, 10, N_CROWNS), rng.randint(2, 10, N_CROWNS)], axis=1,
    ).astype(np.int32))

    def report(name, dt):
        print(json.dumps({"prog": name, "crowns_per_s": round(N_CROWNS * ITERS / dt)}),
              flush=True)

    # windows + preprocess only (gather formulation, production today)
    @jax.jit
    def win_only(tile, rect):
        def body(carry, _):
            win = crown_resize_windows(tile, rect + carry, size=SIZE)
            win = win[..., BAND_CLIP:-BAND_CLIP]
            x = minmax_scale_pixels(win)
            return (jnp.sum(x) * 1e-9).astype(jnp.int32), None

        carry, _ = jax.lax.scan(body, jnp.int32(0), None, length=ITERS)
        return carry

    report("windows_preprocess_gather", timed(win_only, tile, rect))

    # windows + preprocess only (selection-matmul formulation)
    @jax.jit
    def win_mm(tile, rect):
        def body(carry, _):
            win = crown_resize_windows_mm(tile, rect + carry, size=SIZE, slab=16)
            win = win[..., BAND_CLIP:-BAND_CLIP]
            x = minmax_scale_pixels(win)
            return (jnp.sum(x) * 1e-9).astype(jnp.int32), None

        carry, _ = jax.lax.scan(body, jnp.int32(0), None, length=ITERS)
        return carry

    report("windows_preprocess_mm", timed(win_mm, tile, rect))

    # model stack only (pre-gathered images)
    models, variables = [], []
    key = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, YEARS, SIZE, SIZE, BANDS), jnp.float32)
    for level in range(LEVELS):
        m = LearnedEnsemble(years=YEARS, classes=CLASSES, bands=BANDS,
                            dtype=jnp.bfloat16)
        key, sub = jax.random.split(key)
        models.append(m)
        variables.append(m.init(sub, sample))
    images = jnp.asarray(
        rng.rand(N_CROWNS, YEARS, SIZE, SIZE, BANDS).astype(np.float32))

    @jax.jit
    def model_only(variables_list, images):
        def body(carry, _):
            acc = jnp.float32(0.0)
            x = images + carry.astype(jnp.float32)
            for level in range(LEVELS):
                logits = models[level].apply(variables_list[level], x)
                acc = acc + jnp.sum(jax.nn.softmax(logits, axis=-1))
            return (acc * 1e-9).astype(jnp.int32), None

        carry, _ = jax.lax.scan(body, jnp.int32(0), None, length=ITERS)
        return carry

    report("five_levels_model_only", timed(model_only, variables, images))

    # fused cross-level stack (models/fused.multistage_eval): stage-1 runs
    # as one N=L*32-channel conv per year
    from deeptreeattention_tpu.models.fused import multistage_eval

    @jax.jit
    def model_fused(variables_list, images):
        def body(carry, _):
            x = images + carry.astype(jnp.float32)
            outs = multistage_eval(variables_list, x)
            acc = sum(jnp.sum(jax.nn.softmax(o, axis=-1)) for o in outs)
            return (acc * 1e-9).astype(jnp.int32), None

        carry, _ = jax.lax.scan(body, jnp.int32(0), None, length=ITERS)
        return carry

    report("five_levels_model_fused", timed(model_fused, variables, images))

    # end-to-end: windows + preprocess + fused 5-level stack
    @jax.jit
    def end_to_end_fused(variables_list, tile, rect):
        def body(carry, _):
            win = crown_resize_windows(tile, rect + carry, size=SIZE)
            win = win[..., BAND_CLIP:-BAND_CLIP]
            xw = minmax_scale_pixels(win)
            imgs = jnp.broadcast_to(
                xw[:, None], (xw.shape[0], YEARS) + xw.shape[1:]
            )
            outs = multistage_eval(variables_list, imgs)
            acc = sum(jnp.sum(jax.nn.softmax(o, axis=-1)) for o in outs)
            return (acc * 1e-9).astype(jnp.int32), None

        carry, _ = jax.lax.scan(body, jnp.int32(0), None, length=ITERS)
        return carry

    report("end_to_end_fused", timed(end_to_end_fused, variables, tile, rect))


if __name__ == "__main__":
    main()
