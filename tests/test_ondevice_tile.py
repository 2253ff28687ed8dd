"""predict_tile_ondevice: full crop-free tile prediction writes the same
schema shapefile as the file-based path."""
import glob
import os

import pandas as pd
import pytest

from deeptreeattention_tpu.geo import geometry, vector
from deeptreeattention_tpu.predict import tiles as predict_api


def test_predict_tile_ondevice(m, config, fixtures_dir, tmp_path):
    crowns = vector.GeoDataFrame(
        pd.DataFrame(
            {
                "individual": ["t1", "t2"],
                "dead_label": [0, 1],
                "dead_score": [0.6, 0.99],
            }
        ),
        geometry=[
            geometry.box(726020, 4699020, 726024, 4699024),
            geometry.box(726060, 4699120, 726066, 4699126),
        ],
        crs=32617,
    )
    crowns["RGB_tile"] = sorted(glob.glob(os.path.join(fixtures_dir, "rgb", "*.tif")))[0]

    savedir = str(tmp_path / "out")
    trees = predict_api.predict_tile_ondevice(
        crowns, m=m, config=config, savedir=savedir, filter_dead=True
    )
    assert len(trees) == 2
    assert {"ensembleTaxonID", "ens_score", "crown_area"} <= set(trees.columns)
    # the high-confidence dead crown is masked
    dead_row = trees[trees.individual == "t2"].iloc[0]
    assert dead_row.ensembleTaxonID == "DEAD"
    live_row = trees[trees.individual == "t1"].iloc[0]
    assert live_row.ensembleTaxonID in m.species_label_dict
    written = glob.glob(os.path.join(savedir, "*.shp"))
    assert len(written) == 1
