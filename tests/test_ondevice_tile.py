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


def test_predict_species_ondevice_slab_matches_whole_tile(m, config, fixtures_dir):
    """Slab-streamed HBM-bounded path == whole-tile-resident path, with
    crowns spread across the tile and chunking forcing several slabs."""
    import numpy as np

    from deeptreeattention_tpu.data import neon_paths

    rng = np.random.RandomState(7)
    geoms, rows = [], []
    for i in range(9):
        x0 = 726005.0 + (i % 3) * 60 + rng.randint(0, 10)
        y0 = 4699010.0 + (i // 3) * 60 + rng.randint(0, 10)
        geoms.append(geometry.box(x0, y0, x0 + 4 + (i % 2), y0 + 5))
        rows.append({"individual": "s%02d" % i})
    crowns = vector.GeoDataFrame(pd.DataFrame(rows), geometry=geoms, crs=32617)
    crowns["RGB_tile"] = sorted(glob.glob(os.path.join(fixtures_dir, "rgb", "*.tif")))[0]

    img_pool = glob.glob(config["HSI_sensor_pool"], recursive=True)
    geo_index = neon_paths.bounds_to_geoindex(crowns.total_bounds)
    paths = neon_paths.find_sensor_path(img_pool, geo_index=geo_index, all_years=True)
    tile_paths = {neon_paths.year_from_tile(p): p for p in paths}

    whole = predict_api.predict_species_ondevice(crowns, tile_paths, m, config, chunk=4)
    slab = predict_api.predict_species_ondevice(
        crowns, tile_paths, m, config, chunk=4, slab_rows=80
    )
    whole = whole.sort_values("individual").reset_index(drop=True)
    slab = slab.sort_values("individual").reset_index(drop=True)
    assert list(whole.individual) == list(slab.individual)
    assert list(whole.ensembleTaxonID) == list(slab.ensembleTaxonID)
    np.testing.assert_allclose(
        whole.ens_score.astype(float), slab.ens_score.astype(float), atol=1e-6
    )
    for level in range(m.levels):
        np.testing.assert_allclose(
            whole["top1_score_level_%d" % level], slab["top1_score_level_%d" % level],
            atol=1e-6,
        )


def test_predict_species_ondevice_slab_taller_crown_auto_bumps(m, config, fixtures_dir):
    """A crown taller than slab_rows no longer fails the tile: the slab is
    bumped to the next slab_rows multiple and the result equals whole-tile."""
    import numpy as np

    from deeptreeattention_tpu.data import neon_paths

    crowns = vector.GeoDataFrame(
        pd.DataFrame({"individual": ["big"]}),
        geometry=[geometry.box(726010, 4699010, 726018, 4699060)],  # 50 px tall
        crs=32617,
    )
    crowns["RGB_tile"] = sorted(glob.glob(os.path.join(fixtures_dir, "rgb", "*.tif")))[0]
    img_pool = glob.glob(config["HSI_sensor_pool"], recursive=True)
    geo_index = neon_paths.bounds_to_geoindex(crowns.total_bounds)
    paths = neon_paths.find_sensor_path(img_pool, geo_index=geo_index, all_years=True)
    tile_paths = {neon_paths.year_from_tile(p): p for p in paths}
    whole = predict_api.predict_species_ondevice(crowns, tile_paths, m, config)
    bumped = predict_api.predict_species_ondevice(
        crowns, tile_paths, m, config, slab_rows=20
    )
    assert list(whole.ensembleTaxonID) == list(bumped.ensembleTaxonID)
    np.testing.assert_allclose(
        whole.ens_score.astype(float), bumped.ens_score.astype(float), atol=1e-6
    )


def test_predict_species_ondevice_from_h5(m, config, fixtures_dir, tmp_path):
    """The crop-free on-device path runs straight off a NEON .h5 tile
    (H5Raster dispatch) and matches the GeoTIFF-sourced result."""
    import h5py
    import numpy as np

    from deeptreeattention_tpu.data import neon_paths
    from deeptreeattention_tpu.geo import raster

    img_pool = glob.glob(config["HSI_sensor_pool"], recursive=True)
    crowns = vector.GeoDataFrame(
        pd.DataFrame({"individual": ["h1", "h2"]}),
        geometry=[geometry.box(726010, 4699010, 726015, 4699015),
                  geometry.box(726060, 4699070, 726066, 4699076)],
        crs=32617,
    )
    crowns["RGB_tile"] = sorted(glob.glob(os.path.join(fixtures_dir, "rgb", "*.tif")))[0]
    geo_index = neon_paths.bounds_to_geoindex(crowns.total_bounds)
    paths = neon_paths.find_sensor_path(img_pool, geo_index=geo_index, all_years=True)
    tile_paths = {neon_paths.year_from_tile(p): p for p in paths}

    # re-wrap one year's tif cube as a NEON-shaped .h5 (28 bands is below
    # every water-absorption window, so the no_water drop keeps all bands
    # and H5Raster serves the identical cube)
    year = sorted(tile_paths)[0]
    with raster.open_raster(tile_paths[year]) as src:
        cube = np.moveaxis(src.read(), 0, -1)  # [H, W, C]
        t = src.transform
    h5_path = str(tmp_path / "NEON_D01_HARV_DP3_726000_4699000_reflectance.h5")
    with h5py.File(h5_path, "w") as f:
        g = f.create_group("HARV").create_group("Reflectance")
        d = g.create_dataset("Reflectance_Data", data=cube,
                             chunks=(32, 32, cube.shape[2]), compression="gzip")
        d.attrs["Data_Ignore_Value"] = -9999.0
        d.attrs["Scale_Factor"] = 10000.0
        meta = g.create_group("Metadata")
        cs = meta.create_group("Coordinate_System")
        cs.create_dataset("EPSG Code", data=np.bytes_("32617"))
        cs.create_dataset("Map_Info", data=np.bytes_(
            "UTM, 1, 1, {}, {}, {}, {}, 17".format(t.c, t.f, t.a, -t.e)))
        meta.create_group("Spectral_Data").create_dataset(
            "Wavelength", data=np.linspace(380, 2500, cube.shape[2]))

    from_tif = predict_api.predict_species_ondevice(crowns, tile_paths, m, config)
    h5_tiles = dict(tile_paths)
    h5_tiles[year] = h5_path
    from_h5 = predict_api.predict_species_ondevice(crowns, h5_tiles, m, config)
    from_tif = from_tif.sort_values("individual").reset_index(drop=True)
    from_h5 = from_h5.sort_values("individual").reset_index(drop=True)
    assert list(from_tif.ensembleTaxonID) == list(from_h5.ensembleTaxonID)
    np.testing.assert_allclose(
        from_tif.ens_score.astype(float), from_h5.ens_score.astype(float), atol=1e-6
    )


def test_slab_guard_edge_overhanging_crown(m, config, fixtures_dir):
    """A crown whose window extends past the tile bottom: slab mode equals
    the whole-tile path when the slab reaches the tile bottom (both clamp
    identically), and a chunk spanning more rows than one slab auto-splits
    rather than erroring or silently clamping."""
    import numpy as np

    from deeptreeattention_tpu.data import neon_paths

    crowns = vector.GeoDataFrame(
        pd.DataFrame({"individual": ["edge", "top"]}),
        geometry=[
            geometry.box(726010, 4698996, 726016, 4699004),  # overhangs bottom
            geometry.box(726020, 4699180, 726026, 4699186),  # near the top
        ],
        crs=32617,
    )
    crowns["RGB_tile"] = sorted(glob.glob(os.path.join(fixtures_dir, "rgb", "*.tif")))[0]
    img_pool = glob.glob(config["HSI_sensor_pool"], recursive=True)
    geo_index = neon_paths.bounds_to_geoindex(crowns.total_bounds)
    paths = neon_paths.find_sensor_path(img_pool, geo_index=geo_index, all_years=True)
    tile_paths = {neon_paths.year_from_tile(p): p for p in paths}

    whole = predict_api.predict_species_ondevice(crowns, tile_paths, m, config, chunk=2)
    # per-crown chunks: the edge chunk's slab is placed at the tile bottom
    slab = predict_api.predict_species_ondevice(
        crowns, tile_paths, m, config, chunk=1, slab_rows=40
    )
    whole = whole.sort_values("individual").reset_index(drop=True)
    slab = slab.sort_values("individual").reset_index(drop=True)
    assert list(whole.ensembleTaxonID) == list(slab.ensembleTaxonID)
    np.testing.assert_allclose(
        whole.ens_score.astype(float), slab.ens_score.astype(float), atol=1e-6
    )

    # one chunk spanning both crowns cannot fit a 40-row slab -> the chunk
    # auto-splits (NOT a silently-clamped window, NOT an error that
    # predict.py's per-tile try/except would turn into a skipped tile)
    split = predict_api.predict_species_ondevice(
        crowns, tile_paths, m, config, chunk=2, slab_rows=40
    )
    split = split.sort_values("individual").reset_index(drop=True)
    assert list(whole.ensembleTaxonID) == list(split.ensembleTaxonID)
    np.testing.assert_allclose(
        whole.ens_score.astype(float), split.ens_score.astype(float), atol=1e-6
    )


def test_slab_adversarial_layout_every_chunk_overspans(m, config, fixtures_dir):
    """Adversarial layout: crowns alternate between the tile's top and
    bottom so EVERY chunk-of-2's row span exceeds slab_rows — the auto-split
    path must still equal whole-tile, with no crown skipped."""
    import numpy as np

    from deeptreeattention_tpu.data import neon_paths

    geoms, rows = [], []
    for i in range(8):
        if i % 2 == 0:
            y0 = 4699010.0 + i  # bottom of the tile
        else:
            y0 = 4699170.0 + i  # top of the tile
        x0 = 726008.0 + i * 10
        geoms.append(geometry.box(x0, y0, x0 + 4, y0 + 5))
        rows.append({"individual": "adv%02d" % i})
    crowns = vector.GeoDataFrame(pd.DataFrame(rows), geometry=geoms, crs=32617)
    crowns["RGB_tile"] = sorted(glob.glob(os.path.join(fixtures_dir, "rgb", "*.tif")))[0]
    img_pool = glob.glob(config["HSI_sensor_pool"], recursive=True)
    geo_index = neon_paths.bounds_to_geoindex(crowns.total_bounds)
    paths = neon_paths.find_sensor_path(img_pool, geo_index=geo_index, all_years=True)
    tile_paths = {neon_paths.year_from_tile(p): p for p in paths}

    whole = predict_api.predict_species_ondevice(crowns, tile_paths, m, config, chunk=4)
    # row-sorting puts 4 bottom crowns then 4 top crowns; chunk=3 forces a
    # mixed middle chunk that cannot fit a 40-row slab
    slab = predict_api.predict_species_ondevice(
        crowns, tile_paths, m, config, chunk=3, slab_rows=40
    )
    whole = whole.sort_values("individual").reset_index(drop=True)
    slab = slab.sort_values("individual").reset_index(drop=True)
    assert list(slab.individual) == list(whole.individual)  # nothing skipped
    assert list(whole.ensembleTaxonID) == list(slab.ensembleTaxonID)
    np.testing.assert_allclose(
        whole.ens_score.astype(float), slab.ens_score.astype(float), atol=1e-6
    )


def test_all_tpu_features_combined(m, config, fixtures_dir, tmp_path):
    """Capstone: h5-direct tile + 8-device mesh + slab streaming + fused
    eval, all at once, equals the plain single-device whole-tile GeoTIFF
    path."""
    import h5py
    import jax
    import numpy as np

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from deeptreeattention_tpu.data import neon_paths
    from deeptreeattention_tpu.geo import raster
    from deeptreeattention_tpu.parallel import make_mesh

    img_pool = glob.glob(config["HSI_sensor_pool"], recursive=True)
    rng = np.random.RandomState(3)
    geoms, rows = [], []
    for i in range(6):
        x0 = 726008.0 + (i % 3) * 55 + rng.rand() * 8
        y0 = 4699012.0 + (i // 3) * 70 + rng.rand() * 8
        geoms.append(geometry.box(x0, y0, x0 + 4.6, y0 + 5.3))
        rows.append({"individual": "c%02d" % i})
    crowns = vector.GeoDataFrame(pd.DataFrame(rows), geometry=geoms, crs=32617)
    crowns["RGB_tile"] = sorted(glob.glob(os.path.join(fixtures_dir, "rgb", "*.tif")))[0]
    geo_index = neon_paths.bounds_to_geoindex(crowns.total_bounds)
    paths = neon_paths.find_sensor_path(img_pool, geo_index=geo_index, all_years=True)
    tile_paths = {neon_paths.year_from_tile(p): p for p in paths}

    # one year re-wrapped as NEON-shaped .h5
    year = sorted(tile_paths)[0]
    with raster.open_raster(tile_paths[year]) as src:
        cube = np.moveaxis(src.read(), 0, -1)
        t = src.transform
    h5_path = str(tmp_path / "NEON_D01_HARV_DP3_726000_4699000_reflectance.h5")
    with h5py.File(h5_path, "w") as f:
        g = f.create_group("HARV").create_group("Reflectance")
        d = g.create_dataset("Reflectance_Data", data=cube,
                             chunks=(32, 32, cube.shape[2]), compression="gzip")
        d.attrs["Data_Ignore_Value"] = -9999.0
        meta = f["HARV/Reflectance"].create_group("Metadata")
        cs = meta.create_group("Coordinate_System")
        cs.create_dataset("EPSG Code", data=np.bytes_("32617"))
        cs.create_dataset("Map_Info", data=np.bytes_(
            "UTM, 1, 1, {}, {}, {}, {}, 17".format(t.c, t.f, t.a, -t.e)))

    plain = predict_api.predict_species_ondevice(crowns, tile_paths, m, config, chunk=4)

    h5_tiles = dict(tile_paths)
    h5_tiles[year] = h5_path
    combined = predict_api.predict_species_ondevice(
        crowns, h5_tiles, m, config, chunk=4, mesh=make_mesh(8), slab_rows=100
    )
    plain = plain.sort_values("individual").reset_index(drop=True)
    combined = combined.sort_values("individual").reset_index(drop=True)
    assert list(plain.ensembleTaxonID) == list(combined.ensembleTaxonID)
    np.testing.assert_allclose(
        plain.ens_score.astype(float), combined.ens_score.astype(float), atol=1e-5
    )
