"""NEON vegetation-structure (VST) field-data cleaning.

Capability parity with reference src/data.py:22-106 (filter_data): the same
ecological filter rules, written vectorized. Output is a GeoDataFrame of stem
points with one row per individual.
"""
import re

import pandas as pd

from deeptreeattention_tpu.geo import vector
from deeptreeattention_tpu.geo.geometry import Point

# subspecies / synonym collapses used by the project
TAXON_REMAPS = {
    "PSMEM": "PSME", "BEPAP": "BEPA", "ACNEN": "ACNE2", "ACRUR": "ACRU",
    "PICOL": "PICO", "ABLAL": "ABLA", "ACSA3": "ACSAS", "CECAC": "CECA4",
    "PRSES": "PRSE2", "PIPOS": "PIPO", "BEPAC2": "BEPA", "JUVIV": "JUVI",
    "PRPEP": "PRPE2", "COCOC": "COCO6", "NYBI": "NYSY",
}
GENUS_LEVEL_CODES = ["BETUL", "FRAXI", "HALES", "PICEA", "PINUS", "QUERC", "ULMUS", "2PLANT"]
KNOWN_BAD_INDIVIDUALS = [
    "NEON.PLA.D03.OSBS.03422", "NEON.PLA.D03.OSBS.03382", "NEON.PLA.D17.TEAK.01883",
]
EXCLUDED_PLOTS = ["SOAP_054", "OSBS_026", "OSBS_029", "OSBS_039", "OSBS_027", "OSBS_036"]
EXCLUDED_SITES = ["PUUM", "ORNL"]  # no AOP coverage
SHADED = {"Full shade", "Mostly shaded"}
SUNNY = {"Open grown", "Full sun"}


def filter_data(path, config):
    """Raw VST csv -> cleaned stem-point GeoDataFrame."""
    field = pd.read_csv(path)
    field["individual"] = field["individualID"]

    field = field[field.itcEasting.notnull()]
    field = field[field.growthForm.notnull() & ~field.growthForm.isin(["liana", "small shrub"])]
    field = field[field.plantStatus.notnull() & field.plantStatus.str.contains("Live")]

    # drop individuals observed only in shade (never sunlit)
    pos = field.groupby("individual").canopyPosition.agg(
        lambda vals: (any(v in SHADED for v in vals), any(v in SUNNY for v in vals))
    )
    shaded_only = pos[pos.apply(lambda t: t[0] and not t[1])].index
    field = field[~field.individual.isin(shaded_only)]

    field = field[(field.height > 3) | field.height.isnull()]
    field = field[field.stemDiameter > config["min_stem_diameter"]]

    field["taxonID"] = field.taxonID.replace(TAXON_REMAPS)
    field = field[~field.taxonID.isin(GENUS_LEVEL_CODES)]
    field = field[~field.eventID.astype(str).str.contains("2014")]

    # one row per individual: tallest measured height, else newest record
    with_heights = field[field.height.notnull()]
    with_heights = with_heights.loc[with_heights.groupby("individual").height.idxmax()]
    missing = field[field.height.isnull()]
    missing = missing[~missing.individual.isin(with_heights.individual)]
    missing = (
        missing.sort_values("eventID", ascending=False)
        .groupby("individual", sort=False, group_keys=False)
        .head(1)
    )
    field = pd.concat([with_heights, missing])

    # multi-bole stems carry a trailing capital letter
    field = field[~field.individual.str.contains(r"[A-Z]$", regex=True)]
    field = field[~field.individual.isin(KNOWN_BAD_INDIVIDUALS)]
    field = field[~field.plotID.isin(EXCLUDED_PLOTS)]
    field = field[~field.siteID.isin(EXCLUDED_SITES)]

    shp = vector.GeoDataFrame(
        field.reset_index(drop=True),
        geometry=[Point(x, y) for x, y in zip(field.itcEasting, field.itcNorthing)],
        crs=32617,
    )

    # BLAN plots measured in UTM 18N -> bring into 17N like the rest
    blan = (shp.siteID == "BLAN") & (shp.utmZone == "18N") if "utmZone" in shp.columns else None
    if blan is not None and blan.any():
        moved = shp[blan].set_crs(epsg=32618).to_crs(epsg=32617)
        shp.loc[blan, "geometry"] = list(moved.geometry)
        shp.loc[blan, "utmZone"] = "17N"
        shp.loc[blan, "itcEasting"] = [g.x for g in moved.geometry]
        shp.loc[blan, "itcNorthing"] = [g.y for g in moved.geometry]

    return shp
