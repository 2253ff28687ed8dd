"""Field stem points -> crown bounding boxes via the crown detector.

Capability parity with reference src/generate.py:17-241 (predict_trees,
choose_box, create_boxes, process_plot, run, points_to_crowns): detect crowns
on a 40 m window around each plot, spatially join boxes to stems, fall back
to fixed 1 m boxes for undetected stems, resolve multi-box stems by closest
centroid and multi-stem boxes by tallest stem, fanned out per plot over the
futures pool.
"""
import glob
import os

import numpy as np
import pandas as pd

from deeptreeattention_tpu.data import detection, neon_paths
from deeptreeattention_tpu.geo import raster, vector
from deeptreeattention_tpu.geo.geometry import Box
from deeptreeattention_tpu.utils.logging import get_logger

log = get_logger(__name__)


def predict_trees(detector, rgb_path, bounds, expand=40):
    """Detect crowns in a window around `bounds`; return a UTM-georeferenced
    box GeoDataFrame (detector works in pixels; we map back through the tile
    transform)."""
    left, bottom, right, top = bounds
    half_w = (expand - (right - left)) / 2.0
    half_h = (expand - (top - bottom)) / 2.0
    left, right = left - half_w, right + half_w
    bottom, top = bottom - half_h, top + half_h

    with raster.open_raster(rgb_path) as src:
        res_x, res_y = src.res
        # boundless: windows crossing the tile edge keep the requested
        # origin (pixel 0,0 == left/top) so the pixel->UTM mapping below
        # holds; a clamped read would shift every box by the clamp amount
        img = src.read_bounds(left, bottom, right, top, boundless=True)
    img = np.moveaxis(img, 0, -1)
    if hasattr(detector, "predict_array"):
        # meter-parameterized detectors need the tile resolution: the crown
        # prior is physical (m), NEON RGB is 0.1 m/px
        boxes = detector.predict_array(img, res=res_x)
    else:
        boxes = detector.predict_image(img)
    if boxes is None or boxes.empty:
        return None

    # pixel -> UTM (row 0 is the window's TOP edge)
    boxes = boxes.copy()
    utm_minx = boxes.xmin * res_x + left
    utm_maxx = boxes.xmax * res_x + left
    utm_maxy = top - boxes.ymin * res_y
    utm_miny = top - boxes.ymax * res_y
    geoms = [
        Box(a, b, c, d) for a, b, c, d in zip(utm_minx, utm_miny, utm_maxx, utm_maxy)
    ]
    gdf = vector.GeoDataFrame(
        boxes.drop(columns=["xmin", "xmax", "ymin", "ymax"]), geometry=geoms
    )
    gdf["box_id"] = np.arange(len(gdf))
    return gdf


def create_boxes(plot_data, size=1):
    """Fixed fallback boxes around stems the detector missed."""
    geoms = [g.buffer(size).envelope for g in plot_data.geometry]
    fixed = vector.GeoDataFrame(
        plot_data.drop(columns=[plot_data._geom_col]).reset_index(drop=True), geometry=geoms
    )
    fixed["score"] = None
    fixed["label"] = "Tree"
    fixed["box_id"] = ["fixed_box_{}".format(i) for i in range(len(fixed))]
    return fixed


def choose_box(group, plot_data):
    """Multiple boxes on one stem -> keep the box whose centroid is closest."""
    if len(group) == 1:
        return group
    individual = group.individual.iloc[0]
    stem = plot_data[plot_data.individual == individual].geometry.iloc[0]
    dists = [g.centroid.distance(stem) for g in group.geometry]
    return group.iloc[[int(np.argmin(dists))]]


def process_plot(plot_data, rgb_pool, detector):
    """One plot: detect -> join -> fallback -> dedup; returns (merged, raw)."""
    try:
        rgb_path = neon_paths.find_sensor_path(bounds=plot_data.total_bounds, lookup_pool=rgb_pool)
    except Exception:
        raise ValueError(
            "cannot find RGB sensor for {}".format(plot_data.plotID.unique())
        )
    boxes = predict_trees(detector, rgb_path, bounds=plot_data.total_bounds)
    if boxes is None:
        raise ValueError(
            "No trees predicted in plot: {}, skipping.".format(plot_data.plotID.unique()[0])
        )

    merged = vector.sjoin(boxes, plot_data)

    missing = plot_data[~plot_data.individual.isin(merged.individual)]
    if not missing.empty:
        merged = pd.concat([merged, create_boxes(missing)], ignore_index=True)
        merged = vector.GeoDataFrame(merged)

    # one box per stem (closest centroid)
    picked = [
        choose_box(group, plot_data)
        for _, group in merged.groupby("individual", sort=False)
    ]
    merged = vector.GeoDataFrame(pd.concat(picked, ignore_index=True))

    # one stem per box (tallest; ties -> highest CHM, then first)
    survivors = []
    for _, group in merged.groupby("box_id", sort=False):
        if len(group) > 1:
            tallest = group[group.height == group.height.max()]
            if len(tallest) > 1 and "CHM_height" in tallest.columns:
                best = tallest[tallest.CHM_height == tallest.CHM_height.max()]
                tallest = best if len(best) else tallest
            survivors.append(tallest.head(1))
        else:
            survivors.append(group)
    merged = vector.GeoDataFrame(pd.concat(survivors, ignore_index=True))

    boxes["RGB_tile"] = rgb_path
    merged["RGB_tile"] = rgb_path
    return merged, boxes


def run(plot, df, savedir=None, raw_box_savedir=None, rgb_pool=None, detector=None,
        config=None):
    """Per-plot worker (pool task)."""
    if detector is None:
        detector = detection.load_detector(config)
    plot_data = df[df.plotID == plot]
    try:
        predicted, raw = process_plot(plot_data, rgb_pool, detector)
    except ValueError as e:
        log.warning("%s", e)
        return None
    if predicted.empty:
        return None
    if savedir:
        predicted.to_file(os.path.join(savedir, "{}_boxes.shp".format(plot)))
    if raw_box_savedir:
        raw.to_file(os.path.join(raw_box_savedir, "{}_raw_boxes.shp".format(plot)))
    return predicted


def points_to_crowns(field_data, rgb_dir, savedir=None, raw_box_savedir=None,
                     client=None, detector=None, config=None):
    """Full fan-out: every plot -> crown boxes joined with species labels.

    config threads through to detection.load_detector so
    config["crown_detector"] / config["crown_diameter"] govern ETL crown
    generation, not just tile prediction."""
    df = vector.read_file(field_data) if isinstance(field_data, str) else field_data
    plot_names = df.plotID.unique()
    rgb_pool = glob.glob(rgb_dir, recursive=True)

    if client is not None:
        futures = [
            client.submit(
                run, plot=plot, df=df, rgb_pool=rgb_pool,
                savedir=savedir, raw_box_savedir=raw_box_savedir, config=config,
            )
            for plot in plot_names
        ]
        client.wait(futures)
        results = [f.result() for f in futures if f.exception() is None]
    else:
        detector = detector or detection.load_detector(config)
        results = []
        for plot in plot_names:
            try:
                results.append(
                    run(plot=plot, df=df, rgb_pool=rgb_pool, savedir=savedir,
                        raw_box_savedir=raw_box_savedir, detector=detector)
                )
            except Exception as e:
                log.warning("%s failed with %s", plot, e)
    results = [r for r in results if r is not None]
    if not results:
        return vector.GeoDataFrame(pd.DataFrame())
    out = vector.GeoDataFrame(pd.concat(results, ignore_index=True))
    # duplicate (plot, box) pairs can slip in from contributed data
    out = out.groupby(["plotID", "box_id"], sort=False, group_keys=False).head(1)
    return vector.GeoDataFrame(out.reset_index(drop=True))
