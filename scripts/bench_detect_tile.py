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

    # RetinaNet-50-FPN (the production DeepForest architecture, reference
    # src/generate.py:17-42): synthetic-init weights — throughput only.
    # (a) device ceiling: scan-chained backbone+decode on a batch of 400-px
    # patches; (b) honest wall: predict_tile over a 2000^2 uint8 array incl.
    # uint8 chunk upload (normalization on device) + per-chunk pandas, the
    # path find_crowns runs.
    from deeptreeattention_tpu.models.retinanet import RetinaNetDetector

    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        det_rn = RetinaNetDetector(num_classes=1, dtype=dtype)
        BATCH = int(os.environ.get("RETINANET_BATCH", 8))
        PATCH = 416  # 400-px DeepForest window, padded to the /32 grid
        run, _ = det_rn._program((PATCH, PATCH))
        x = jnp.asarray(rng.rand(BATCH, PATCH, PATCH, 3).astype(np.float32))
        hw = jnp.full((BATCH, 2), 400.0, jnp.float32)
        params = det_rn.variables["params"]
        stats = det_rn.variables.get("batch_stats", {})

        @jax.jit
        def fn_rn(params, stats, x, hw):
            def body(carry, _):
                boxes, scores, labels, valid = run(params, stats, x + carry, hw)
                return (jnp.sum(boxes) * 1e-9 + jnp.sum(scores) * 1e-9
                        ).astype(jnp.float32) * 1e-9, None

            carry, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
            return carry

        dt = timed(fn_rn, params, stats, x, hw) / ITERS
        px = BATCH * 400 * 400
        px_per_s = px / dt
        rec = {
            "prog": "retinanet50_fpn_{}_{}x{}px_b{}".format(
                name, PATCH, PATCH, BATCH),
            "ms_per_batch": round(dt * 1e3, 2),
            "px_per_s": round(px_per_s),
            "extrapolated_s_per_km2_tile": round(1e8 / px_per_s, 2),
            "weights": "synthetic-init",
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)

    # honest wall-clock: the full predict_tile host loop on a 2000^2 tile
    det_rn = RetinaNetDetector(num_classes=1, dtype=jnp.bfloat16,
                               score_thresh=0.55)
    import tempfile

    from deeptreeattention_tpu.geo import raster
    from deeptreeattention_tpu.geo.affine import Affine

    tile_u8 = rng.randint(0, 255, (3, 2000, 2000)).astype(np.uint8)
    tmp = tempfile.mkdtemp()
    tile_path = os.path.join(tmp, "rn_tile.tif")
    raster.write_raster(tile_path, tile_u8,
                        transform=Affine(0.1, 0, 405000, 0, -0.1, 3286200),
                        crs=32617, tiled=True)
    det_rn.predict_tile(tile_path)  # compile + warm
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        out_df = det_rn.predict_tile(tile_path)
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    rec = {
        "prog": "retinanet50_fpn_predict_tile_wall_2000px",
        "s_per_tile": round(dt, 2),
        "px_per_s": round(2000 * 2000 / dt),
        "extrapolated_s_per_km2_tile": round(1e8 / (2000 * 2000 / dt), 1),
        "n_boxes": 0 if out_df is None else int(len(out_df)),
        "includes": "disk decode + u8 upload + device normalize/sweep + pandas",
        "weights": "synthetic-init",
    }
    records.append(rec)
    print(json.dumps(rec), flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "BENCH_DETECT_TILE.json")
    with open(out, "w") as f:
        json.dump(records, f, indent=1)


if __name__ == "__main__":
    main()
