"""Production-path dead scoring: AliveDead.predict_crowns_ondevice wall rate.

BENCH_DEAD.json times an in-jit scan composition — the device ceiling,
with no per-batch dispatch or host reads. This measures what predict.py
actually runs (reference src/predict.py:153-168): the host loop over
crown batches through the round-4 fused single program per batch
(window gather + ImageNet normalize + forward + calibrated score,
commit 58995fe), tile upload and per-batch host reads included. The
gap between this number and BENCH_DEAD.json's is the dispatch/host
overhead the fusion was built to remove (VERDICT round-3 Weak #4).

    python scripts/bench_dead_production.py            # chip
    DTA_PLATFORM=cpu python scripts/bench_dead_production.py --n 256 --smoke
"""
import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096, help="crowns per sweep")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--smoke", action="store_true",
                    help="write the JSON to /tmp instead of repo root")
    args = ap.parse_args()

    from deeptreeattention_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax

    from deeptreeattention_tpu.geo import raster, vector
    from deeptreeattention_tpu.geo.affine import Affine
    from deeptreeattention_tpu.models.dead import AliveDead
    from deeptreeattention_tpu.utils.config import read_config

    res, size = 0.1, 2000
    east, north = 405000, 3286000
    tile_path = os.path.join(REPO, "data", "cache",
                             "bench_dead_tile_{}.tif".format(size))
    if not os.path.exists(tile_path):
        rng = np.random.RandomState(0)
        rgb = rng.randint(0, 255, (3, size, size)).astype(np.uint8)
        t = Affine(res, 0, east, 0, -res, north + size * res)
        raster.write_raster(tile_path, rgb, transform=t, crs=32617, tiled=True)

    # crowns with the same pixel-size distribution as scripts/bench_dead.py
    # (30-80 px boxes); buffer=1.0 m adds 10 px each side at 0.1 m
    rng = np.random.RandomState(1)
    x0 = east + rng.uniform(10, size * res - 20, args.n)
    y0 = north + rng.uniform(10, size * res - 20, args.n)
    w = rng.uniform(3.0, 8.0, args.n)
    h = rng.uniform(3.0, 8.0, args.n)
    crowns = vector.GeoDataFrame(
        {"RGB_tile": [tile_path] * args.n,
         "geometry": [vector.box(a, b, a + c, b + d)
                      for a, b, c, d in zip(x0, y0, w, h)]},
        crs="EPSG:32617")

    cfg = read_config(os.path.join(REPO, "config.yml"))
    cfg["dead"]["batch_size"] = args.batch

    records = []
    for dtype, mode in (("bfloat16", "batch"), ("bfloat16", "eval_folded")):
        c = dict(cfg)
        c["dead"] = dict(cfg["dead"])
        c["dead"]["compute_dtype"] = dtype
        c["dead"]["bn_mode"] = mode
        model = AliveDead(c, depth=50)
        t0 = time.time()
        model.predict_crowns_ondevice(crowns)  # compile + warm
        warm_s = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            probs = model.predict_crowns_ondevice(crowns)
            ts.append(time.perf_counter() - t0)
        assert probs.shape == (args.n, 2)
        rec = {"prog": "predict_crowns_ondevice_{}_{}".format(dtype, mode),
               "crowns_per_s": round(args.n / min(ts)),
               "batch": args.batch, "n": args.n,
               "warm_s": round(warm_s, 1),
               "platform": jax.devices()[0].platform,
               "sync_reads": False}
        records.append(rec)
        print(json.dumps(rec), flush=True)

    out = ("/tmp/bench_dead_production.json" if args.smoke
           else os.path.join(REPO, "BENCH_DEAD_PRODUCTION.json"))
    # Preserve the pre-pipelining (sync_reads) baseline that models/dead.py
    # cites as the motivation for the read-pipelining — replace only records
    # from the current (pipelined) path.
    if os.path.exists(out):
        try:
            with open(out) as f:
                old = json.load(f)
            records = [r for r in old if r.get("sync_reads")] + records
        except Exception:
            pass
    with open(out, "w") as f:
        json.dump(records, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
