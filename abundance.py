"""Entry point: landscape abundance aggregation (reference abundance.py).

Aggregate per-species crown counts across predicted tile shapefiles for each
model replicate, optionally clipped to a station boundary, fanned out over
the futures pool.

    python abundance.py -d '{"results_dir": "results", "experiment_keys": [...]}'
"""
import glob
import os

import pandas as pd

from deeptreeattention_tpu import cluster
from deeptreeattention_tpu.geo import vector
from deeptreeattention_tpu.utils.config import read_config
from deeptreeattention_tpu.utils.logging import get_logger

log = get_logger("abundance")


def tile_counts(tile, overlay_bounds=None, year=None):
    gdf = vector.read_file(tile)
    if year is not None and "tile_year" in gdf.columns:
        gdf = gdf[gdf.tile_year.astype(str) == str(year)]
    if overlay_bounds:
        boundary = vector.read_file(overlay_bounds)
        # clip is raw coordinate intersection — align CRS first (as
        # predict/multinomial.run does) or a lat/long boundary silently
        # zeroes every count
        if boundary.crs and gdf.crs and boundary.crs != gdf.crs:
            boundary = boundary.to_crs(epsg=gdf.crs)
        gdf = vector.clip(gdf, boundary)
    col = "ensembleTaxonID" if "ensembleTaxonID" in gdf.columns else "ensembleTa"
    return gdf[col].value_counts()


def run_experiment(experiment_key, shp_dir, overlay_bounds=None, year=None, client=None):
    tiles = glob.glob(os.path.join(shp_dir, experiment_key, "*.shp"))
    if client is not None:
        futures = [
            client.submit(tile_counts, t, overlay_bounds=overlay_bounds, year=year)
            for t in tiles
        ]
        # logged skip-on-error: silent drops would undercount abundance
        results = client.gather(futures, skip_errors=True)
    else:
        results = [tile_counts(t, overlay_bounds, year) for t in tiles]
    total = pd.Series(dtype=float)
    for counts in results:
        total = total.add(counts, fill_value=0)
    return total


def main():
    config = read_config("config.yml")
    results_dir = config.get("results_dir", "results")
    keys = config.get("experiment_keys")
    if not keys:
        # predict.py's crown shapefiles (results_dir/crowns) and the crop
        # sidecar dir (config prediction_crop_dir) are pipeline artifacts,
        # not model replicates
        artifacts = {
            "crowns",
            os.path.basename(
                os.path.normpath(config.get("prediction_crop_dir", "results/crops"))
            ),
        }
        keys = [
            os.path.basename(d)
            for d in glob.glob(os.path.join(results_dir, "*"))
            if os.path.isdir(d) and glob.glob(os.path.join(d, "*.shp"))
            and os.path.basename(d) not in artifacts
        ]
    client = cluster.start(cpus=config.get("workers", 4))
    rows = []
    for key in keys:
        counts = run_experiment(
            key, results_dir, overlay_bounds=config.get("overlay_bounds"),
            year=config.get("predict_year"), client=client,
        )
        for taxon, n in counts.items():
            rows.append({"model": key, "taxonID": taxon, "crowns": int(n)})
        log.info("%s: %d taxa, %d crowns", key, len(counts), int(counts.sum()))
    client.close()
    out = pd.DataFrame(rows)
    out_path = os.path.join(results_dir, "abundance.csv")
    out.to_csv(out_path, index=False)
    log.info("wrote %s", out_path)
    return out


if __name__ == "__main__":
    main()
