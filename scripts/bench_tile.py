"""End-to-end tile inference benchmark: crowns/sec through the on-device
window path (tile slab in HBM -> crown windows -> preprocess -> all 5
hierarchy levels), extrapolated to a 1 km^2 NEON tile.

    python scripts/bench_tile.py [n_crowns] [slab]

Timed through host reads (see docs/DESIGN.md §5).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from deeptreeattention_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from deeptreeattention_tpu.models.year import LearnedEnsemble
    from deeptreeattention_tpu.ops.preprocess import BAND_CLIP, minmax_scale_pixels
    from deeptreeattention_tpu.ops.windows import crown_resize_windows

    N_CROWNS = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    SLAB = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    BANDS_RAW, BANDS, YEARS, CLASSES, SIZE = 369, 349, 3, 20, 11
    LEVELS = 5

    rng = np.random.RandomState(0)
    # int16: the production tile path streams tiles in their file dtype
    tile = jnp.asarray(rng.randint(0, 10000, (SLAB, SLAB, BANDS_RAW)), jnp.int16)
    rect = np.stack(
        [
            rng.randint(0, SLAB - 12, N_CROWNS),
            rng.randint(0, SLAB - 12, N_CROWNS),
            rng.randint(2, 10, N_CROWNS),
            rng.randint(2, 10, N_CROWNS),
        ],
        axis=1,
    ).astype(np.int32)

    models = []
    variables = []
    key = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, YEARS, SIZE, SIZE, BANDS), jnp.float32)
    for level in range(LEVELS):
        m = LearnedEnsemble(years=YEARS, classes=CLASSES, bands=BANDS, dtype=jnp.bfloat16)
        key, sub = jax.random.split(key)
        models.append(m)
        variables.append(m.init(sub, sample))

    ITERS = 4

    @jax.jit
    def tile_infer(variables_list, tile, rect):
        # scan-chained like bench.py: a single 4096-crown dispatch is ~45 ms
        # of device work, comparable to one relay RTT — un-chained timing
        # under-reports by ~30% (measured 61k vs 92k chained)
        def body(carry, _):
            win = crown_resize_windows(tile, rect + carry, size=SIZE)
            win = win[..., BAND_CLIP:-BAND_CLIP]
            x = minmax_scale_pixels(win)
            images = jnp.broadcast_to(
                x[:, None], (x.shape[0], YEARS) + x.shape[1:]
            )  # same windows per year in the bench
            # the production eval: all 5 levels in one fused program
            # (models/fused.multistage_eval; +41% measured, docs/PERF.md r3)
            from deeptreeattention_tpu.models.fused import multistage_eval

            outs = multistage_eval(variables_list, images)
            acc = jnp.float32(0.0)
            for o in outs:
                acc = acc + jnp.sum(jax.nn.softmax(o, axis=-1))
            return (acc * 1e-9).astype(jnp.int32), None

        carry, _ = jax.lax.scan(body, jnp.int32(0), None, length=ITERS)
        return carry

    float(tile_infer(variables, tile, rect))  # compile
    float(tile_infer(variables, tile, rect))  # warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(tile_infer(variables, tile, rect))
        ts.append(time.perf_counter() - t0)
    crowns_per_sec = N_CROWNS * ITERS / min(ts)
    # a 1 km^2 OSBS tile yields ~50-100k candidate crowns
    minutes_per_km2 = 100000 / crowns_per_sec / 60
    rec = {
        "metric": "tile_inference_crowns_per_sec",
        "value": round(crowns_per_sec, 1),
        "unit": "crowns/sec (5 levels x 3 years, on-device windows)",
        "minutes_per_km2_at_100k_crowns": round(minutes_per_km2, 3),
    }
    print(json.dumps(rec))
    # driver-visible artifact (VERDICT round-2 item 5)
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "BENCH_TILE.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
