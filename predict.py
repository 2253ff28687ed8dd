"""Entry point: landscape tile prediction (equivalent of reference
predict.py:1-161).

    python predict.py [-d '{"site": "OSBS", ...}']

Step 1: find site RGB tiles, detect crowns (+CHM filter, +dead scores),
write per-tile crown shapefiles and prediction crops.
Step 2: for every species-model checkpoint, predict every tile and write the
result shapefiles. All stages skip work whose output file already exists
(idempotent resume).
"""
import glob
import os
import re
import traceback

from deeptreeattention_tpu import cluster
from deeptreeattention_tpu.models.multi_stage import MultiStage
from deeptreeattention_tpu.predict import tiles as predict_api
from deeptreeattention_tpu.utils.config import read_config
from deeptreeattention_tpu.utils.logging import comet_experiment, get_logger

log = get_logger("predict")

# OSBS station boundary in UTM 17N (reference predict.py:28-31)
OSBS_BOUNDS = (399815.5, 3282308.0, 409113.7, 3290124.0)


def find_rgb_files(site, config, year="2021", bounds=OSBS_BOUNDS):
    tiles = glob.glob(config["rgb_sensor_pool"], recursive=True)
    tiles = [x for x in tiles if site in x and "neon-aop-products" not in x]
    if year:
        # anchored in the BASENAME (a bare "_{year}" substring can hit tile
        # eastings); directory components may carry the year loosely
        # (".../2021/", ".../site_2021/")
        tiles = [
            x for x in tiles
            if "/{}/".format(year) in x
            or "_{}".format(year) in os.path.dirname(x)
            or os.path.basename(x).startswith("{}_".format(year))
            or os.path.splitext(os.path.basename(x))[0].endswith("_{}".format(year))
        ]
    if not bounds:
        return tiles
    out = []
    for rgb_path in tiles:
        m = re.search(r"(\d+)_(\d+)_image", os.path.basename(rgb_path))
        if not m:
            continue
        e, n = float(m.group(1)), float(m.group(2))
        if bounds[0] < e < bounds[2] and bounds[1] < n < bounds[3]:
            out.append(rgb_path)
    return out


def main():
    # multi-host tile sweeps fan out per host (the reference's dask fan-out
    # analogue): each process takes a stride of the tile list and runs it on
    # a mesh of its OWN devices (mesh_scope=local) — per-tile outputs are
    # idempotent files, so the partition needs no coordination. No-op for
    # single-process runs.
    from deeptreeattention_tpu.parallel import distributed

    distributed.initialize()
    import jax

    config = read_config("config.yml")
    config["preload_images"] = False
    if jax.process_count() > 1:
        config["mesh_scope"] = "local"
    experiment = comet_experiment(project_name="DeepTreeAttention-TPU", workspace=config.get("comet_workspace"))
    experiment.add_tag("prediction")
    experiment.log_parameters(config)

    client = cluster.start(cpus=config.get("workers", 4))
    site = config.get("site", "OSBS")
    results_dir = config.get("results_dir", "results")
    crowns_dir = os.path.join(results_dir, "crowns")
    os.makedirs(crowns_dir, exist_ok=True)
    os.makedirs(config["prediction_crop_dir"], exist_ok=True)

    dead_model_path = config.get("dead_model")
    species_model_paths = config.get("species_model_paths") or []
    if isinstance(species_model_paths, str):
        species_model_paths = [species_model_paths]

    tiles = find_rgb_files(site=site, config=config,
                           year=config.get("predict_year", "2021"),
                           bounds=None if site != "OSBS" else OSBS_BOUNDS)
    if jax.process_count() > 1:
        tiles = tiles[jax.process_index()::jax.process_count()]
        log.info("process %d/%d takes %d tiles", jax.process_index(),
                 jax.process_count(), len(tiles))
    log.info("%d RGB tiles for %s", len(tiles), site)

    # Step 1: crowns + prediction crops per tile (idempotent). The dead
    # model and detector load ONCE — per-tile load_from_checkpoint would
    # rebuild their jitted steps and recompile per tile (minutes each
    # through the relay).
    from deeptreeattention_tpu.data import detection
    from deeptreeattention_tpu.models import dead as dead_mod

    _models = {}

    def step1_models():
        # lazy: a fully-cached step 1 (all crown shapefiles exist) must not
        # pay the model loads / jit-step builds
        if "detector" not in _models:
            _models["detector"] = detection.load_detector(config)
            _models["dead"] = (
                dead_mod.AliveDead.load_from_checkpoint(dead_model_path, config=config)
                if dead_model_path else None
            )
        return _models["detector"], _models["dead"]

    crown_annotation_paths = []
    for x in tiles:
        basename = os.path.splitext(os.path.basename(x))[0]
        shpname = os.path.join(crowns_dir, "{}.shp".format(basename))
        if not os.path.exists(shpname):
            try:
                detector, dead_model = step1_models()
                crowns = predict_api.find_crowns(
                    rgb_path=x, config=config, detector=detector,
                    dead_model=dead_model,
                )
                if crowns is None:
                    continue
                crowns.to_file(shpname)
            except Exception:
                traceback.print_exc()
                log.warning("%s failed to build crowns", shpname)
                continue
        crops_shp = os.path.join(config["prediction_crop_dir"], "{}.shp".format(basename))
        if not os.path.exists(crops_shp):
            try:
                from deeptreeattention_tpu.geo import vector

                crowns = vector.read_file(shpname)
                crops_shp = predict_api.generate_prediction_crops(
                    crowns, config, client=client, as_numpy=True
                )
            except Exception:
                traceback.print_exc()
                log.warning("%s failed to generate prediction crops", shpname)
                continue
            if crops_shp is None:
                continue
        crown_annotation_paths.append(crops_shp)

    # Step 2: every species model x every tile (idempotent)
    for model_path in species_model_paths:
        log.info("model %s", model_path)
        m = MultiStage.load_from_checkpoint(model_path, config=config)
        prediction_dir = os.path.join(
            results_dir, os.path.splitext(os.path.basename(model_path))[0]
        )
        os.makedirs(prediction_dir, exist_ok=True)
        for crops_shp in crown_annotation_paths:
            out_shp = os.path.join(prediction_dir, os.path.basename(crops_shp))
            if os.path.exists(out_shp):
                continue
            try:
                if config.get("ondevice_predict"):
                    # crop-file-free fast path: stream tiles to HBM, gather
                    # crown windows on device
                    predict_api.predict_tile_ondevice(
                        crowns=crops_shp, filter_dead=bool(dead_model_path),
                        m=m, savedir=prediction_dir, config=config,
                    )
                else:
                    predict_api.predict_tile(
                        crown_annotations=crops_shp, filter_dead=bool(dead_model_path),
                        m=m, savedir=prediction_dir, config=config,
                    )
            except Exception:
                traceback.print_exc()
                continue
    client.close()
    log.info("prediction sweep complete")


if __name__ == "__main__":
    main()
