"""Per-crown, per-year sensor crop generation.

Capability parity with reference src/generate.py:243-373 (write_crop,
generate_crops): for each crown and each acquisition year, cut the crown's
bounds out of the HSI tile and write a .tif (training) or preprocessed-ready
.npy (prediction fast path). Tiles are opened once per (geoindex, year) and
crowns are grouped by tile so a 700 MB tile is paged through once; the
per-crown writes fan out over the futures pool.
"""
import glob
import os
import traceback

import numpy as np

from deeptreeattention_tpu.data import neon_paths
from deeptreeattention_tpu.geo import raster
from deeptreeattention_tpu.utils.logging import get_logger

log = get_logger(__name__)


def crop(bounds, sensor_path=None, savedir=None, basename=None, src=None, as_numpy=False):
    """Cut `bounds` out of a raster; write .tif/.npy or return the array
    (equivalent of reference src/patches.py:5-30)."""
    left, bottom, right, top = bounds
    owned = src is None
    if owned:
        src = raster.open_raster(sensor_path)
    try:
        img = src.read_bounds(left, bottom, right, top)
        if img.size == 0:
            raise ValueError(
                "Bounds {} gave an empty crop from {}".format(bounds, sensor_path or src.path)
            )
        if savedir:
            if as_numpy:
                filename = os.path.join(savedir, "{}.npy".format(basename))
                np.save(filename, img)
            else:
                filename = os.path.join(savedir, "{}.tif".format(basename))
                # crops keep their georeferencing (reference src/patches.py
                # writes the window transform)
                t = src.window_transform(src.window(left, bottom, right, top))
                raster.write_raster(filename, img, crs=src.crs, transform=t)
            return filename
        return img
    finally:
        if owned:
            src.close()


def write_crop(row, savedir, img_path, replace=True, src=None, as_numpy=False):
    """One crown x one tile-year -> crop file; returns the basename."""
    if img_path.endswith(".h5"):
        # direct NEON product (no tif conversion): year from the tile path
        tile_year = neon_paths.year_from_tile(img_path)
    else:
        tile_year = os.path.splitext(os.path.basename(img_path))[0].split("_")[-1]
    basename = "{}_{}".format(row["individual"], tile_year)
    ext = ".npy" if as_numpy else ".tif"
    filename = os.path.join(savedir, basename + ext)
    if not replace and os.path.exists(filename):
        return os.path.basename(filename)
    filename = crop(
        bounds=row["geometry"].bounds, sensor_path=img_path, savedir=savedir,
        basename=basename, src=src, as_numpy=as_numpy,
    )
    return os.path.basename(filename)


ANNOTATION_COLUMNS = [
    "individual", "geo_index", "tile_year", "CHM_height", "plotID", "height",
    "geometry", "taxonID", "RGB_tile", "filename", "siteID", "image_path",
    "score", "box_id",
]


def generate_crops(gdf, sensor_glob, savedir, rgb_glob, client=None, convert_h5=False,
                   HSI_tif_dir=None, replace=True, as_numpy=False):
    """Crowns gdf -> annotations df with one row per (crown, year) crop."""
    gdf = gdf.reset_index(drop=True)
    os.makedirs(savedir, exist_ok=True)

    img_pool = [
        x for x in glob.glob(sensor_glob, recursive=True)
        if "point_cloud" not in x and "products" not in x
    ]
    rgb_pool = (
        [x for x in glob.glob(rgb_glob, recursive=True) if "point_cloud" not in x]
        if rgb_glob else []
    )

    # geoindex -> list of per-year tile paths (h5 converted lazily)
    gdf["geo_index"] = [neon_paths.bounds_to_geoindex(g.bounds) for g in gdf.geometry]
    tile_to_path = {}
    for geo_index in gdf.geo_index.unique():
        try:
            if convert_h5:
                if rgb_glob is None:
                    raise ValueError("convert_h5=True requires rgb_glob")
                paths = neon_paths.lookup_and_convert(
                    rgb_pool=rgb_pool, hyperspectral_pool=img_pool, savedir=HSI_tif_dir,
                    geo_index=geo_index, all_years=True,
                )
            else:
                paths = neon_paths.find_sensor_path(
                    lookup_pool=img_pool, geo_index=geo_index, all_years=True
                )
        except Exception:
            log.warning("%s failed to find sensor path:\n%s", geo_index, traceback.format_exc())
            continue
        tile_to_path[geo_index] = paths

    indexes, filenames = [], []
    if client is not None:
        # one task per (tile, crown-chunk): the tile is opened once per task
        # so its decoded segments are shared across the chunk's crops
        def crop_chunk(rows, img_path):
            out = []
            with raster.open_raster(img_path) as src:
                for index, row in rows:
                    try:
                        fn = write_crop(
                            row=row, savedir=savedir, img_path=img_path,
                            replace=replace, src=src, as_numpy=as_numpy,
                        )
                        out.append((index, fn))
                    except Exception as e:
                        log.warning("index %s failed with %s", index, e)
            return out

        futures = []
        chunk_size = 256
        for geo_index, paths in tile_to_path.items():
            tile_rows = list(gdf[gdf.geo_index == geo_index].iterrows())
            for img_path in paths:
                for start in range(0, len(tile_rows), chunk_size):
                    futures.append(
                        client.submit(
                            crop_chunk, tile_rows[start : start + chunk_size], img_path
                        )
                    )
        client.wait(futures)
        for f in futures:
            if f.exception() is not None:
                log.warning("crop task failed: %s", f.exception())
                continue
            for index, fn in f.result():
                indexes.append(index)
                filenames.append(fn)
    else:
        # open each tile once, stream its crowns through it
        for geo_index, paths in tile_to_path.items():
            tile_rows = gdf[gdf.geo_index == geo_index]
            for img_path in paths:
                with raster.open_raster(img_path) as src:
                    for index, row in tile_rows.iterrows():
                        try:
                            fn = write_crop(
                                row=row, savedir=savedir, img_path=img_path,
                                replace=replace, src=src, as_numpy=as_numpy,
                            )
                        except Exception as e:
                            log.warning("index %s failed with %s", index, e)
                            continue
                        indexes.append(index)
                        filenames.append(fn)

    annotations = gdf.loc[indexes].copy()
    annotations["image_path"] = filenames
    annotations["tile_year"] = [
        os.path.splitext(os.path.basename(x))[0].split("_")[-1] for x in filenames
    ]
    keep = [c for c in annotations.columns if c in ANNOTATION_COLUMNS]
    return annotations.loc[:, keep]
