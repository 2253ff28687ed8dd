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


def test_predict_tile_ondevice_sharded_matches_single(m, config, fixtures_dir):
    """predict_species_ondevice with the crown chunk sharded over the
    8-device mesh returns the same ensemble as single-device."""
    import jax
    import numpy as np

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from deeptreeattention_tpu.data import neon_paths
    from deeptreeattention_tpu.parallel import make_mesh

    crowns = vector.GeoDataFrame(
        pd.DataFrame({"individual": ["t1", "t2", "t3"]}),
        geometry=[
            geometry.box(726020, 4699020, 726024, 4699024),
            geometry.box(726060, 4699120, 726066, 4699126),
            geometry.box(726040, 4699060, 726045, 4699066),
        ],
        crs=32617,
    )
    rgb = sorted(glob.glob(os.path.join(fixtures_dir, "rgb", "*.tif")))[0]
    crowns["RGB_tile"] = rgb
    img_pool = glob.glob(config["HSI_sensor_pool"], recursive=True)
    geo_index = neon_paths.bounds_to_geoindex(crowns.total_bounds)
    paths = neon_paths.find_sensor_path(img_pool, geo_index=geo_index, all_years=True)
    tile_paths = {neon_paths.year_from_tile(p): p for p in paths}

    single = predict_api.predict_species_ondevice(crowns, tile_paths, m, config, chunk=2)
    sharded = predict_api.predict_species_ondevice(
        crowns, tile_paths, m, config, chunk=2, mesh=make_mesh(8)
    )
    assert list(single.individual) == list(sharded.individual)
    assert list(single.ensembleTaxonID) == list(sharded.ensembleTaxonID)
    np.testing.assert_allclose(
        single.ens_score.astype(float), sharded.ens_score.astype(float), atol=1e-5
    )
