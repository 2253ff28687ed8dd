"""Entry point: merge per-tile prediction shapefiles into one layer
(reference create_prediction_shp.py).

    python create_prediction_shp.py -d '{"experiment_key": "..."}'
"""
import glob
import os

import pandas as pd

from deeptreeattention_tpu.geo import vector
from deeptreeattention_tpu.utils.config import read_config
from deeptreeattention_tpu.utils.logging import get_logger

log = get_logger("create_prediction_shp")


def merge_tiles(experiment_key, results_dir="results", out_name=None):
    tiles = sorted(glob.glob(os.path.join(results_dir, experiment_key, "*.shp")))
    frames = []
    for t in tiles:
        try:
            frames.append(vector.read_file(t))
        except Exception as e:
            log.warning("skipping %s: %s", t, e)
    if not frames:
        raise ValueError("no prediction shapefiles under {}/{}".format(results_dir, experiment_key))
    merged = vector.GeoDataFrame(
        pd.concat(frames, ignore_index=True), crs=getattr(frames[0], "crs", None)
    )
    out = out_name or os.path.join(results_dir, "{}_predictions.shp".format(experiment_key))
    merged.to_file(out)
    log.info("wrote %s (%d crowns)", out, len(merged))
    return out


def main():
    config = read_config("config.yml")
    merge_tiles(config["experiment_key"], config.get("results_dir", "results"))


if __name__ == "__main__":
    main()
