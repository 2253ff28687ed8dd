"""LiDAR canopy-height-model (CHM) filtering.

Capability parity with reference src/CHM.py:9-105: extract the non-zero 99th
percentile CHM height per crown/stem via zonal stats, then keep points whose
field height is consistent with the canopy model (asymmetric rules: canopy
above field height suggests subcanopy stems; canopy far below suggests
mismeasurement). The keep-rule is vectorized instead of a row loop.
"""
import glob

import numpy as np
import pandas as pd

from deeptreeattention_tpu.data import neon_paths
from deeptreeattention_tpu.geo import zonal
from deeptreeattention_tpu.utils.logging import get_logger

log = get_logger(__name__)


def non_zero_99_quantile(values):
    """99th percentile of cells >= 0.5 m (None when no canopy present)."""
    values = np.asarray(values, float)
    values = values[values >= 0.5]
    if values.size == 0:
        return None
    return float(np.percentile(values, 99))


def postprocess_CHM(df, lookup_pool):
    """Attach CHM_height (q99 zonal stat) per geometry; fill missing field
    heights from the canopy model."""
    try:
        chm_path = neon_paths.find_sensor_path(lookup_pool=lookup_pool, bounds=df.total_bounds)
    except Exception as e:
        raise ValueError(
            "Cannot find CHM for bounds {} (plots {}): {}".format(
                df.total_bounds, df.plotID.unique() if "plotID" in df.columns else "?", e
            )
        )
    stats = zonal.zonal_stats(list(df.geometry), chm_path, add_stats={"q99": non_zero_99_quantile})
    df = df.copy()
    df["CHM_height"] = [s["q99"] for s in stats]
    if "height" in df.columns:
        df["height"] = df.height.fillna(df.CHM_height)
    return df


def CHM_height(shp, CHM_pool):
    """Per-plot zonal extraction (plots may sit on different CHM tiles)."""
    lookup_pool = glob.glob(CHM_pool, recursive=True)
    pieces = []
    for name, group in shp.groupby("plotID"):
        try:
            pieces.append(postprocess_CHM(group, lookup_pool=lookup_pool))
        except Exception as e:
            log.warning("plotID %s CHM extraction failed: %s", name, e)
    if not pieces:
        return shp.iloc[0:0]
    out = pd.concat(pieces, ignore_index=True)
    out.__class__ = type(shp)
    object.__setattr__(out, "crs", getattr(shp, "crs", None))
    object.__setattr__(out, "_geom_col", "geometry")
    return out


def height_rules(df, min_CHM_height=1, max_CHM_diff=4, CHM_height_limit=8):
    """Vectorized keep-mask over (CHM_height, height) pairs.

    Keep when: CHM present AND (field height missing OR CHM >= min height AND
    |difference| inside the asymmetric envelope)."""
    chm = df.CHM_height.astype(float)
    h = df.height.astype(float)
    has_chm = chm.notnull()
    no_field = h.isnull()
    above = (chm > h) & ((chm - h) < max_CHM_diff)
    below = (chm <= h) & ((h - chm) < CHM_height_limit)
    keep = has_chm & (no_field | ((chm >= min_CHM_height) & (above | below)))
    return df[keep.fillna(False)]


def filter_CHM(shp, CHM_pool, min_CHM_height=1, max_CHM_diff=4, CHM_height_limit=8):
    """Extract CHM heights and apply the keep rules; None min height = skip."""
    if min_CHM_height is None:
        return shp
    shp = CHM_height(shp, CHM_pool)
    return height_rules(
        shp, min_CHM_height=min_CHM_height, max_CHM_diff=max_CHM_diff,
        CHM_height_limit=CHM_height_limit,
    )
