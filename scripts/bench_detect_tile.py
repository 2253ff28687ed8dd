"""Crown-detection throughput: whole-tile CrownDetector on one chip.

Completes the find_crowns stage perf story (reference src/predict.py:29-54:
DeepForest predict_tile + CHM filter + dead scoring): dead scoring is
measured by scripts/bench_dead.py; this measures the detector itself.

The CrownDetector runs the WHOLE tile as one jit program (ops/detect.py) at
meter-parameterized settings, so the benched program is exactly the
production one for a given (resolution, shape). Surface shapes:

* 2000x2000 @ 0.1 m — a 200x200 m RGB block (NEON RGB tiles are 10000^2;
  cost scales ~linearly in pixels, see the extrapolation note in the output)
* 1000x1000 @ 1.0 m — a full 1 km^2 HSI-scale tile

Scan-chained + host-read-forced (CLAUDE.md: block_until_ready is a no-op on
the axon relay).
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

    from deeptreeattention_tpu.data.detection import CrownDetector

    ITERS = int(os.environ.get("PROBE_ITERS", 4))
    det = CrownDetector()
    rng = np.random.RandomState(0)

    records = []
    for res, side in ((0.1, 2000), (1.0, 1000)):
        surface = jnp.asarray(rng.rand(side, side).astype(np.float32))
        detect = det._detect_fn(res, (side, side))

        @jax.jit
        def fn(surface):
            def body(carry, _):
                boxes, scores, valid = detect(surface + carry)
                return (jnp.sum(boxes) * 1e-9 + jnp.sum(scores) * 1e-9
                        ).astype(jnp.float32) * 1e-9, None

            carry, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
            return carry

        dt = timed(fn, surface) / ITERS
        px_per_s = side * side / dt
        # NEON RGB tiles are 10000^2 px at 0.1 m; detection cost is
        # dominated by per-pixel smoothing/local-max/top_k, ~linear in px
        sec_per_km2 = (1000.0 / res) ** 2 / px_per_s
        rec = {
            "prog": "crown_detector_{}m_{}px".format(res, side),
            "ms_per_program": round(dt * 1e3, 2),
            "px_per_s": round(px_per_s),
            "extrapolated_s_per_km2_tile": round(sec_per_km2, 2),
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "BENCH_DETECT_TILE.json")
    with open(out, "w") as f:
        json.dump(records, f, indent=1)


if __name__ == "__main__":
    main()
