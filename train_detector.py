"""Entry point: train the learned crown detector (CenterNet) on crown-box
labels and save a checkpoint usable via config["crown_detector"].

    python train_detector.py -d '{"detector_train": {
        "tiles": ["path/tile.tif", ...],
        "labels": ["path/crowns.shp", ...],   # box geometries, tile CRS
        "savedir": "snapshots/detector",
        "patch": 96, "steps": 500, "width": 16}}'

The label shapefiles are DeepForest-format crown boxes (the reference's
src/generate.py:17-60 output), so a reference user can train our detector
from the exact artifacts their pipeline already produces. Additive entry:
the reference ships DeepForest's pretrained RetinaNet instead (not
downloadable here); this closes the loop with a trainable, checkpointable
in-framework detector.
"""
import json

from deeptreeattention_tpu.models.detector import LearnedDetector, scenes_from_tiles
from deeptreeattention_tpu.utils.config import read_config
from deeptreeattention_tpu.utils.logging import comet_experiment, get_logger

log = get_logger("train_detector")


def main():
    config = read_config("config.yml")
    dcfg = config.get("detector_train") or {}
    tiles = dcfg.get("tiles")
    labels = dcfg.get("labels")
    if not tiles or not labels or len(tiles) != len(labels):
        raise SystemExit(
            "detector_train.tiles and detector_train.labels must be matched lists"
        )
    patch = int(dcfg.get("patch", 96))
    experiment = comet_experiment(project_name="DeepTreeAttention-TPU",
                                  workspace=config.get("comet_workspace"))
    experiment.add_tag("crown_detector")

    scenes, blists = scenes_from_tiles(
        tiles, labels, patch=patch,
        crops_per_tile=int(dcfg.get("crops_per_tile", 40)),
        seed=int(dcfg.get("seed", 0)),
    )
    log.info("%d training crops from %d tiles", len(scenes), len(tiles))

    det = LearnedDetector(
        config=config, width=int(dcfg.get("width", 16)), patch=patch,
        threshold=float(dcfg.get("threshold", 0.2)),
    )
    losses = det.fit(
        scenes, blists,
        steps=int(dcfg.get("steps", 500)),
        batch_size=int(dcfg.get("batch_size", 8)),
        seed=int(dcfg.get("seed", 0)),
    )
    for i, l in enumerate(losses):
        experiment.log_metric("detector_loss", float(l), step=i)

    savedir = dcfg.get("savedir", "snapshots/detector")
    det.save_checkpoint(savedir)
    summary = {
        "checkpoint": savedir,
        "first_loss": float(losses[0]),
        "final_loss": float(losses[-1]),
        "crops": len(scenes),
    }
    log.info("%s", json.dumps(summary))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
