"""Entry point: self-supervised crop mining (reference mine.py:1-51).

Samples random crown crops from landscape tiles (no labels) to build a
pre-training corpus for the spectral backbone.

    python mine.py -d '{"n_crops": 10000}'
"""
import glob
import os

import numpy as np
import pandas as pd

from deeptreeattention_tpu import cluster
from deeptreeattention_tpu.data.crops import crop
from deeptreeattention_tpu.geo import raster
from deeptreeattention_tpu.utils.config import read_config
from deeptreeattention_tpu.utils.logging import get_logger

log = get_logger("mine")


def mine_tile(tile_path, savedir, n_crops=50, size=4.0, seed=0):
    """Cut n random size x size m crops from one HSI tile."""
    rng = np.random.RandomState(seed)
    written = []
    with raster.open_raster(tile_path) as src:
        left, bottom, right, top = src.bounds
        basename = os.path.splitext(os.path.basename(tile_path))[0]
        for i in range(n_crops):
            x = rng.uniform(left, right - size)
            y = rng.uniform(bottom, top - size)
            try:
                fn = crop(
                    bounds=(x, y, x + size, y + size), src=src, savedir=savedir,
                    basename="{}_mine_{}".format(basename, i), as_numpy=True,
                )
                written.append(fn)
            except ValueError:
                continue
    return written


def main():
    config = read_config("config.yml")
    savedir = config.get("mining_dir", "results/mining")
    os.makedirs(savedir, exist_ok=True)
    tiles = [
        x for x in glob.glob(config["HSI_sensor_pool"].replace(".h5", ".tif"), recursive=True)
    ] or glob.glob(os.path.join(config.get("HSI_tif_dir", ""), "*.tif"))
    per_tile = max(int(config.get("n_crops", 1000)) // max(len(tiles), 1), 1)
    client = cluster.start(cpus=config.get("workers", 4))
    futures = [
        client.submit(mine_tile, t, savedir, n_crops=per_tile, seed=i)
        for i, t in enumerate(tiles)
    ]
    results = client.gather(futures, skip_errors=True)  # logged skip-on-error
    files = [fn for r in results for fn in r]
    pd.DataFrame({"image_path": [os.path.basename(f) for f in files]}).to_csv(
        os.path.join(savedir, "mined.csv"), index=False
    )
    client.close()
    log.info("mined %d crops to %s", len(files), savedir)


if __name__ == "__main__":
    main()
