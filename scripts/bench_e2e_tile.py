"""ONE honest end-to-end tile wall-clock, host IO included.

Every prior tile number in this repo is a device-stage extrapolation
(BENCH_TILE.json times device-resident slabs). This script measures the
disk->shapefile path predict.py actually runs on a full-size tile:

  write a synthetic 1 km^2 RGB tile (10000^2 px @ 0.1 m, ~300 MB) +
  matching multi-year 369-band HSI (1000^2 @ 1 m) + CHM to disk, then

  stage 1: host decode of the RGB tile (in-house TIFF codec)
  stage 2: crown detection sweep
  stage 3: CHM zonal heights + filter
  stage 4: alive/dead scoring of every crown
  stage 5: crowns shapefile write
  stage 6: species prediction (all 5 levels, on-device tile path) +
           result shapefile write

and publishes seconds-per-tile with the per-stage breakdown
(BENCH_E2E_TILE.json). The reference cProfiles this exact path on its
cluster (reference SLURM/predict.sh:21).

    python scripts/bench_e2e_tile.py                  # full 10000^2 on TPU
    DTA_PLATFORM=cpu python scripts/bench_e2e_tile.py --size 2000 --smoke
"""
import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EASTING, NORTHING = 405000, 3286000
EPSG = 32617
YEARS = ["2020", "2021"]
RAW_BANDS = 369


def build_artifacts(root, size, res, seed=0):
    """Synthetic tile set on disk (idempotent; ~2 GB at full size)."""
    from deeptreeattention_tpu.data.synthetic import make_forest_tile
    from deeptreeattention_tpu.geo import raster
    from deeptreeattention_tpu.geo.affine import Affine

    rgb_name = "2021_OSBS_5_{}_{}_image.tif".format(EASTING, NORTHING)
    rgb_path = os.path.join(root, "rgb", rgb_name)
    marker = os.path.join(root, "built_{}_{}.json".format(size, res))
    if os.path.exists(marker):
        return rgb_path
    for sub in ("rgb", "hsi", "chm"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)

    t0 = time.time()
    rgb, boxes = make_forest_tile(size=size, res=res, seed=seed)
    t_rgb = Affine(res, 0, EASTING, 0, -res, NORTHING + size * res)
    raster.write_raster(rgb_path, np.moveaxis(rgb, -1, 0), transform=t_rgb,
                        crs=EPSG, tiled=True)

    hsi_px = int(size * res)  # 1 m HSI grid over the same footprint
    t_1m = Affine(1.0, 0, EASTING, 0, -1.0, NORTHING + size * res)
    rng = np.random.RandomState(seed + 1)
    for year in YEARS:
        cube = rng.randint(500, 9000, size=(RAW_BANDS, hsi_px, hsi_px)).astype(np.int16)
        name = "{y}_OSBS_5_{e}_{n}_image_hyperspectral_{y}.tif".format(
            y=year, e=EASTING, n=NORTHING)
        raster.write_raster(os.path.join(root, "hsi", name), cube,
                            transform=t_1m, crs=EPSG, tiled=True)
    chm = (np.abs(rng.randn(1, hsi_px, hsi_px)) * 2 + 8).astype(np.float32)
    raster.write_raster(
        os.path.join(root, "chm", "OSBS_{}_{}_CHM.tif".format(EASTING, NORTHING)),
        chm, transform=t_1m, crs=EPSG, tiled=True)
    with open(marker, "w") as f:
        json.dump({"n_crowns_truth": int(len(boxes)),
                   "build_s": round(time.time() - t0, 1)}, f)
    return rgb_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=10000)
    ap.add_argument("--res", type=float, default=0.1)
    ap.add_argument("--root", default=os.path.join(REPO, "data", "cache", "e2e_tile"))
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_E2E_TILE.json"))
    ap.add_argument("--smoke", action="store_true",
                    help="skip the JSON artifact at repo root (write to /tmp)")
    ap.add_argument("--detector", default="config",
                    choices=["config", "retinanet"],
                    help="config = load_detector (CrownDetector family); "
                         "retinanet = the production DeepForest architecture "
                         "(synthetic-init weights; throughput, not quality)")
    args = ap.parse_args()

    import jax

    from deeptreeattention_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    from deeptreeattention_tpu.data import detection
    from deeptreeattention_tpu.data.datamodule import TreeData
    from deeptreeattention_tpu.geo import raster, vector
    from deeptreeattention_tpu.models import dead as dead_mod
    from deeptreeattention_tpu.models.multi_stage import MultiStage
    from deeptreeattention_tpu.predict import tiles as predict_api
    from deeptreeattention_tpu.utils.config import read_config
    from tests.make_fixtures import ensure_fixtures

    rgb_path = build_artifacts(args.root, args.size, args.res)

    cfg = read_config(os.path.join(REPO, "config.yml"))
    cfg["rgb_sensor_pool"] = os.path.join(args.root, "rgb", "*.tif")
    cfg["HSI_sensor_pool"] = os.path.join(args.root, "hsi", "*.tif")
    cfg["CHM_pool"] = os.path.join(args.root, "chm", "*.tif")
    cfg["convert_h5"] = False
    cfg["bands"] = RAW_BANDS - 20
    cfg["prediction_crop_dir"] = os.path.join(args.root, "crops")
    cfg["workers"] = 0
    cfg["preload_images"] = False
    os.makedirs(cfg["prediction_crop_dir"], exist_ok=True)
    results_dir = os.path.join(args.root, "results")
    os.makedirs(results_dir, exist_ok=True)

    # species model: taxonomy from the suite's fixture artifact, model width
    # from the real band count (weights are irrelevant to throughput)
    fixtures = os.path.join(REPO, "tests", "data")
    ensure_fixtures(fixtures)
    artifact = os.path.join(fixtures, "artifact")
    dm_cfg = dict(cfg)
    dm_cfg["crop_dir"] = artifact
    dm_cfg["use_data_commit"] = artifact
    dm = TreeData(csv_file=os.path.join(artifact, "train.csv"), config=dm_cfg,
                  data_dir=artifact, debug=True)
    m = MultiStage(train_df=dm.train, test_df=dm.test, crowns=dm.crowns,
                   config=cfg)
    dead_model = dead_mod.AliveDead(cfg, depth=50)
    if args.detector == "retinanet":
        from deeptreeattention_tpu.models.retinanet import RetinaNetDetector

        # synthetic-init: the DeepForest release weights are not available
        # offline (VERDICT r4 missing #1); throughput and the e2e plumbing
        # are what this measures. score_thresh keeps NMS candidate counts
        # realistic under random logits (sigmoid(~0) ~ 0.5).
        detector = RetinaNetDetector(num_classes=1, score_thresh=0.55,
                                     nms_thresh=0.4)
    else:
        detector = detection.load_detector(cfg)

    stages = {}
    t_all = time.time()

    # stage 1: host decode (measured separately; find_crowns decodes again —
    # the codec result is not cached — so the total charges decode twice,
    # exactly like predict.py's real path: detector sweep + dead windows)
    t0 = time.time()
    with raster.open_raster(rgb_path) as src:
        img = src.read()
    stages["host_rgb_decode_s"] = round(time.time() - t0, 2)
    mb = img.nbytes / 1e6
    del img

    # stages 2-4: the predict.py step-1 path
    t0 = time.time()
    crowns = predict_api.find_crowns(rgb_path, cfg, detector=detector,
                                     dead_model=dead_model)
    stages["find_crowns_s"] = round(time.time() - t0, 2)
    n_crowns = len(crowns)

    t0 = time.time()
    shp = os.path.join(results_dir, "crowns.shp")
    crowns.to_file(shp)
    stages["crowns_shapefile_write_s"] = round(time.time() - t0, 2)

    # stage 6: species prediction over the on-device tile path + write
    t0 = time.time()
    trees = predict_api.predict_tile_ondevice(
        crowns, m, cfg, savedir=results_dir, filter_dead=True)
    stages["species_predict_and_write_s"] = round(time.time() - t0, 2)

    total = time.time() - t_all
    result = {
        "metric": "e2e_tile_seconds",
        "value": round(total, 2),
        "unit": "s/tile (disk->shapefile, host IO included)",
        "tile": {"px": args.size, "res_m": args.res, "rgb_mb": round(mb, 1),
                 "hsi_years": len(YEARS), "bands": RAW_BANDS},
        "n_crowns": int(n_crowns),
        "n_trees_predicted": 0 if trees is None else int(len(trees)),
        "stages": stages,
        "detector": type(detector).__name__,
        "platform": jax.devices()[0].platform,
        "minutes_per_km2": round(total / 60.0 / ((args.size * args.res / 1000.0) ** 2), 3),
    }
    out = "/tmp/bench_e2e_tile.json" if args.smoke else args.out
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))
    print("wrote", out)


if __name__ == "__main__":
    main()
