"""Contributed megaplot ingest.

Capability parity with reference src/megaplot.py:10-101: per-site contributed
shapefiles are reformatted to the points_to_crowns schema (individual /
plotID / siteID / taxonID), assigned to 40 m pseudo-plots by grid overlay
(large layers) or centroid-buffer clustering (small layers), and CHM-filtered
when heights are present.
"""
import glob
import os

import numpy as np
import pandas as pd

from deeptreeattention_tpu.data import chm
from deeptreeattention_tpu.geo import vector
from deeptreeattention_tpu.geo.geometry import Box

PLOT_SIZE = 40.0


def read_files(directory, site=None, config=None):
    shapefiles = sorted(glob.glob(os.path.join(directory, "*.shp")))
    if site:
        shapefiles = [x for x in shapefiles if site in x]
    frames = []
    for path in shapefiles:
        name = os.path.splitext(os.path.basename(path))[0]
        frames.append(format(site=name, gdf=vector.read_file(path), config=config))
    return pd.concat(frames) if frames else pd.DataFrame()


def format(site, gdf, config):
    """Normalize one contributed layer to the pipeline schema."""
    gdf = gdf.copy()
    gdf["individual"] = ["{}.contrib.{}".format(site, i) for i in gdf.index]
    gdf["filename"] = site
    gdf["siteID"] = site.split("_")[0]

    if len(gdf) > 1000:
        grid = create_grid(gdf)
        gdf = vector.sjoin(gdf, grid)
    else:
        gdf = buffer_plots(gdf)

    # boundary points may land in two pseudo-plots; keep one
    gdf = vector.GeoDataFrame(
        gdf.groupby("individual", sort=False, group_keys=False).head(1).reset_index(drop=True),
        crs=getattr(gdf, "crs", None),
    )

    if "height" in gdf.columns and config is not None:
        gdf = chm.filter_CHM(
            gdf, CHM_pool=config["CHM_pool"],
            min_CHM_height=config["min_CHM_height"],
            max_CHM_diff=config["max_CHM_diff"],
            CHM_height_limit=config["CHM_height_limit"],
        )
    return gdf


def buffer_plots(gdf, radius=PLOT_SIZE):
    """Cluster nearby stems into pseudo-plots by centroid buffers."""
    gdf = gdf.copy()
    gdf["plotID"] = -1
    cents = [g.centroid for g in gdf.geometry]
    plot_id = 0
    for i, center in enumerate(cents):
        if gdf["plotID"].iloc[i] != -1:
            continue
        members = [
            j for j, c in enumerate(cents)
            if gdf["plotID"].iloc[j] == -1
            and abs(c.x - center.x) <= radius and abs(c.y - center.y) <= radius
        ]
        gdf.iloc[members, gdf.columns.get_loc("plotID")] = plot_id
        plot_id += 1
    name = gdf.filename.iloc[0] if "filename" in gdf.columns and len(gdf) else "contrib"
    gdf["plotID"] = ["{}_contrib_{}".format(name, int(p)) for p in gdf.plotID]
    return gdf


def create_grid(gdf, cell_size=PLOT_SIZE):
    """Rectangular pseudo-plot grid covering the layer."""
    xmin, ymin, xmax, ymax = gdf.total_bounds
    cells = []
    for x0 in np.arange(xmin, xmax + cell_size, cell_size):
        for y0 in np.arange(ymin, ymax + cell_size, cell_size):
            cells.append(Box(x0 - cell_size, y0, x0, y0 + cell_size))
    grid = vector.GeoDataFrame(pd.DataFrame(index=range(len(cells))), geometry=cells,
                               crs=getattr(gdf, "crs", None))
    grid["plotID"] = ["{}_contrib".format(i) for i in grid.index]
    return grid


def load(directory, config, site=None):
    return read_files(directory=directory, config=config, site=site)
