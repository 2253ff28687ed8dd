"""Self-supervised multi-year crop miner (reference
notebooks/crop_random_tile.py:1-248, rebuilt on the in-house geo stack).

Samples random 64 m windows from geoindexes that have >= 3 common years of
RGB + HSI + CHM coverage and writes per-year aligned crops

    {savedir}/{lat}N_{lon}W/{year}-01-01/{RGB,HSI,CHM}.tif  (+ metadata.json)

for self-supervised pretraining. Fan-out runs through cluster.pool (the
reference uses a dask SLURM cluster); a final cleanup pass removes locations
that ended up with fewer than 3 years of any sensor.

    python notebooks/crop_random_tile.py [-d '{"selfsupervised_dir": ...,
                                              "selfsupervised_crops": 100}']
"""
import glob
import json
import os
import random
import re
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deeptreeattention_tpu.data import neon_paths
from deeptreeattention_tpu.geo import crs as crs_mod
from deeptreeattention_tpu.geo import raster
from deeptreeattention_tpu.utils.logging import get_logger

log = get_logger("crop_random_tile")

WINDOW_M = 64.0  # reference: 640 px at 0.1 m


def crop(bounds, sensor_path, savedir=None, basename=None):
    """Crop sensor data to a UTM bounding box; write a GeoTIFF when savedir
    is given, else return the array (reference crop_random_tile.py:21-59)."""
    left, bottom, right, top = bounds
    with raster.open_raster(sensor_path) as src:
        img = src.read_bounds(left, bottom, right, top, boundless=True)
        res = src.res[0]
        crs = src.crs
        t = src.transform
    if savedir is None:
        return img
    from deeptreeattention_tpu.geo.affine import Affine

    out_t = Affine(t.a, t.b, left, t.d, t.e, top)
    filename = os.path.join(savedir, "{}.tif".format(basename))
    raster.write_raster(filename, img, transform=out_t, crs=crs)
    del res
    return filename


def _years_of(paths, pattern=r"(20\d\d)"):
    out = []
    for p in paths:
        m = re.search(pattern, os.path.basename(p))
        out.append(m.group(1) if m else None)
    return out


def random_crop(config, iteration, pools, savedir):
    """One attempt: pick a geoindex with >= 3 common years across sensors,
    crop an aligned random window from each year (reference :61-206)."""
    rng = random.Random(iteration)
    rgb_pool, hsi_pool, chm_pool = pools["rgb"], pools["hsi"], pools["chm"]
    if not rgb_pool:
        return None
    anchor = rng.choice(rgb_pool)
    m = re.search(r"(\d+_\d+)_image", os.path.basename(anchor))
    if not m:
        return None
    geo_index = m.group(1)
    rgb_tiles = sorted(x for x in rgb_pool if geo_index in x)
    chm_tiles = sorted(x for x in chm_pool if geo_index in x)
    hsi_tiles = sorted(x for x in hsi_pool if geo_index in x)
    if min(len(rgb_tiles), len(chm_tiles), len(hsi_tiles)) < 3:
        return None

    # .h5 HSI converts lazily to .tif (reference lookup_and_convert)
    if config.get("convert_h5") and any(x.endswith(".h5") for x in hsi_tiles):
        hsi_tiles = neon_paths.lookup_and_convert(
            rgb_pool=rgb_tiles, hyperspectral_pool=hsi_tiles,
            savedir=config["HSI_tif_dir"], geo_index=geo_index, all_years=True,
        )
        hsi_tiles = [x for x in hsi_tiles if "neon-aop-products" not in x]

    # year -> ONE tile per sensor (first sorted match): a plain zip over
    # sorted lists silently misaligns years when a year has duplicate tiles
    # (reflights) or a cross-site substring geoindex match
    by_year = []
    for tiles, years in ((rgb_tiles, _years_of(rgb_tiles)),
                         (hsi_tiles, _years_of(hsi_tiles)),
                         (chm_tiles, _years_of(chm_tiles))):
        m = {}
        for t, y in zip(tiles, years):
            if y is not None and y not in m:
                m[y] = t
        by_year.append(m)
    rgb_by_year, hsi_by_year, chm_by_year = by_year
    common = sorted(
        y for y in set(rgb_by_year) & set(hsi_by_year) & set(chm_by_year)
        if int(y) > 2017
    )[-3:]
    if len(common) < 3:
        return None
    sel_rgb = [rgb_by_year[y] for y in common]
    sel_hsi = [hsi_by_year[y] for y in common]
    sel_chm = [chm_by_year[y] for y in common]

    with raster.open_raster(sel_rgb[0]) as src:
        t = src.transform
        h, w = src.height, src.width
        src_crs = src.crs
        win_px = int(round(WINDOW_M / abs(t.a)))
        if h <= win_px or w <= win_px:
            return None
        r0 = rng.randint(0, h - win_px - 1)
        c0 = rng.randint(0, w - win_px - 1)
        left, top = t * (c0, r0)
        right, bottom = t * (c0 + win_px, r0 + win_px)
    bounds = (left, bottom, right, top)

    # location key from the WGS84 centroid (reference :146-158)
    epsg = int(str(src_crs).replace("EPSG:", "")) if src_crs else None
    if epsg and epsg != 4326:
        lon0, lat0 = crs_mod.transform_xy(left, bottom, epsg, 4326)
        lon1, lat1 = crs_mod.transform_xy(right, top, epsg, 4326)
        lonlat_bounds = (lon0, lat0, lon1, lat1)
    else:
        lonlat_bounds = bounds
    cy = abs((lonlat_bounds[1] + lonlat_bounds[3]) / 2)
    cx = abs((lonlat_bounds[0] + lonlat_bounds[2]) / 2)
    coord = "{}N_{}W".format(str(cy).replace(".", "_"), str(cx).replace(".", "_"))
    coord_dir = os.path.join(savedir, coord)

    for year, rgb_t, hsi_t, chm_t in zip(common, sel_rgb, sel_hsi, sel_chm):
        year_dir = os.path.join(coord_dir, "{}-01-01".format(year))
        os.makedirs(year_dir, exist_ok=True)
        crop(bounds, rgb_t, year_dir, "RGB")
        crop(bounds, hsi_t, year_dir, "HSI")
        crop(bounds, chm_t, year_dir, "CHM")
        with open(os.path.join(year_dir, "metadata.json"), "w") as f:
            json.dump(
                {"siteID": neon_paths.site_from_path(rgb_t),
                 "bounds": list(lonlat_bounds),
                 "epsg": str(src_crs)},
                f, indent=4, sort_keys=True,
            )
    return coord_dir


def cleanup(savedir):
    """Remove crops at locations with < 3 years of a sensor (reference
    :241-248)."""
    files = glob.glob(os.path.join(savedir, "**", "*.tif"), recursive=True)
    if not files:
        return
    counts = pd.DataFrame({
        "basename": [os.path.basename(x) for x in files],
        "path": files,
    })
    counts["location"] = counts.path.apply(
        lambda x: os.path.dirname(os.path.dirname(x))
    )
    per = counts.groupby(["location", "basename"]).size().reset_index(name="n")
    bad = per[per.n < 3]
    for _, row in bad.iterrows():
        for p in counts[(counts.location == row.location)
                        & (counts.basename == row.basename)].path:
            os.remove(p)


def main():
    from deeptreeattention_tpu import cluster
    from deeptreeattention_tpu.utils.config import read_config

    config = read_config("config.yml")
    savedir = config.get("selfsupervised_dir", "data/selfsupervised")
    os.makedirs(savedir, exist_ok=True)
    n = int(config.get("selfsupervised_crops", 1000))

    pools = {
        "rgb": [x for x in glob.glob(config["rgb_sensor_pool"], recursive=True)
                if "classified" not in x],
        "hsi": [x for x in glob.glob(config["HSI_sensor_pool"], recursive=True)
                if "neon-aop-products" not in x],
        "chm": glob.glob(config.get("CHM_pool", ""), recursive=True),
    }
    log.info("pools: %d rgb, %d hsi, %d chm",
             len(pools["rgb"]), len(pools["hsi"]), len(pools["chm"]))

    client = cluster.start(cpus=config.get("workers", 4))
    futures = [
        client.submit(random_crop, config=config, iteration=i,
                      pools=pools, savedir=savedir)
        for i in range(n)
    ]
    done = 0
    for f in futures:
        try:
            if f.result() is not None:
                done += 1
        except Exception as e:
            log.warning("crop failed: %s", e)
    client.close()
    cleanup(savedir)
    log.info("%d/%d random crops written under %s", done, n, savedir)


if __name__ == "__main__":
    main()
