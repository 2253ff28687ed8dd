"""Deterministic synthetic test fixtures.

Builds the miniature data world the suite runs against (the analogue of the
reference's committed data artifact + HARV tile crops, reference
tests/conftest.py:26-116, tests/data/110ac…/): RGB/HSI/CHM GeoTIFFs written
with our own codec, a crowns shapefile, a raw NEON-style VST csv for the full
ETL test, a pre-built "data artifact" (per-crown crops + train/test csv) for
the use_data_commit path, and alive/dead image folders.

Everything is seeded; ensure_fixtures() is idempotent via a version marker.
"""
import json
import os

import zlib

import numpy as np
import pandas as pd

from deeptreeattention_tpu.geo import affine, raster, vector, geometry

VERSION = 5
EPSG = 32617
EASTING, NORTHING = 726000, 4699000  # geoindex cell
TILE = 200  # tile pixels at 1 m
YEARS = [2018, 2019, 2020]
SPECIES = ["PIPA2", "PITA", "PIEL", "ACRU", "QULA2", "QUGE2"]
RAW_BANDS = 28  # load_image drops 10+10 -> 8 model bands
N_PER_SPECIES = 8


def ensure_fixtures(out_dir):
    marker = os.path.join(out_dir, ".fixtures_version")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == str(VERSION):
                return out_dir
    build(out_dir)
    with open(marker, "w") as f:
        f.write(str(VERSION))
    return out_dir


def _tile_transform():
    return affine.from_origin(EASTING, NORTHING + TILE, 1.0, 1.0)


def build(out_dir):
    rng = np.random.RandomState(42)
    for sub in ["rgb", "hsi", "chm", "artifact", "dead/train/Alive", "dead/train/Dead",
                "dead/test/Alive", "dead/test/Dead", "interim"]:
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)

    t = _tile_transform()

    # --- sensor tiles (HSI arrays kept in memory; crown spectral signatures
    # are painted in below so models have real signal to learn) --------------
    rgb_paths = {}
    hsi_paths = {}
    hsi_arrays = {}
    for year in YEARS:
        rgb = rng.randint(0, 255, size=(3, TILE, TILE)).astype(np.uint8)
        rgb_name = "{y}_HARV_5_{e}_{n}_image_{y}.tif".format(y=year, e=EASTING, n=NORTHING)
        rgb_paths[year] = os.path.join(out_dir, "rgb", rgb_name)
        raster.write_raster(rgb_paths[year], rgb, transform=t, crs=EPSG)

        hsi_arrays[year] = rng.randint(1000, 5000, size=(RAW_BANDS, TILE, TILE)).astype(np.int16)
        hsi_name = "{y}_HARV_5_{e}_{n}_image_hyperspectral_{y}.tif".format(
            y=year, e=EASTING, n=NORTHING
        )
        hsi_paths[year] = os.path.join(out_dir, "hsi", hsi_name)

    chm = np.abs(rng.randn(1, TILE, TILE)).astype(np.float32) * 2 + 8.0  # ~8-12 m canopy
    chm_name = "HARV_{e}_{n}_CHM.tif".format(e=EASTING, n=NORTHING)
    raster.write_raster(os.path.join(out_dir, "chm", chm_name), chm, transform=t, crs=EPSG)

    # --- field data: stems + crowns -----------------------------------------
    records = []
    idx = 0
    for plot in range(6):
        for sp in SPECIES:
            for k in range(N_PER_SPECIES // 2 if plot % 2 else N_PER_SPECIES // 2 + 1):
                x = EASTING + 10 + rng.uniform(0, TILE - 20)
                y = NORTHING + 10 + rng.uniform(0, TILE - 20)
                records.append(
                    {
                        "individual": "NEON.HARV.{:05d}".format(idx),
                        "taxonID": sp,
                        "siteID": "HARV",
                        "plotID": "HARV_{:03d}".format(plot),
                        "x": x,
                        "y": y,
                        "height": float(rng.uniform(6, 20)),
                    }
                )
                idx += 1
    stems = pd.DataFrame(records)

    # crowns: 4 m boxes centered on stems
    crowns = vector.GeoDataFrame(
        stems[["individual", "taxonID", "siteID", "plotID", "height"]].copy(),
        geometry=[geometry.box(r.x - 2, r.y - 2, r.x + 2, r.y + 2) for r in stems.itertuples()],
        crs=EPSG,
    )
    crowns["box_id"] = np.arange(len(crowns))
    crowns["score"] = rng.uniform(0.5, 1.0, len(crowns)).round(3)
    crowns.to_file(os.path.join(out_dir, "artifact", "crowns.shp"))

    # paint species spectral signatures into the crown footprints so the
    # classifiers have learnable structure (each species: a distinct spectral
    # curve added across its crown pixels, consistent across years)
    band_axis = np.arange(RAW_BANDS) / RAW_BANDS
    signatures = {
        sp: (3000 * np.sin(2 * np.pi * band_axis * (si + 2) + si)).astype(np.int16)
        for si, sp in enumerate(SPECIES)
    }
    for r, geom in zip(stems.itertuples(), crowns.geometry):
        left, bottom, right, top = geom.bounds
        c0 = int(left - EASTING)
        r0 = int((NORTHING + TILE) - top)
        sig = signatures[r.taxonID][:, None, None]
        for year in YEARS:
            block = hsi_arrays[year][:, max(r0, 0) : r0 + 4, max(c0, 0) : c0 + 4]
            block += sig[:, : block.shape[1], : block.shape[2]]
    for year in YEARS:
        raster.write_raster(
            hsi_paths[year], hsi_arrays[year], transform=t, crs=EPSG,
            tiled=True, tile_size=64,
        )

    points = vector.GeoDataFrame(
        stems[["individual", "taxonID", "siteID", "plotID", "height"]].copy(),
        geometry=[geometry.Point(r.x, r.y) for r in stems.itertuples()],
        crs=EPSG,
    )
    points.to_file(os.path.join(out_dir, "artifact", "canopy_points.shp"))

    # sample crowns shapefile at the top level (mirrors tests/data/sample.shp)
    crowns.head(12).to_file(os.path.join(out_dir, "sample_crowns.shp"))
    points.head(12).to_file(os.path.join(out_dir, "sample_points.shp"))

    # --- raw NEON VST csv for the full ETL test ------------------------------
    vst_rows = []
    for r in stems.itertuples():
        vst_rows.append(
            {
                "individualID": r.individual,
                "taxonID": r.taxonID,
                "siteID": r.siteID,
                "plotID": r.plotID,
                "itcEasting": r.x,
                "itcNorthing": r.y,
                "utmZone": "17N",
                "height": r.height,
                "stemDiameter": float(np.random.RandomState(
                    zlib.crc32(str(r.individual).encode()) % 2**31
                ).uniform(12, 40)),
                "growthForm": "single bole tree",
                "plantStatus": "Live",
                "canopyPosition": "Full sun",
                "eventID": "vst_HARV_2019",
            }
        )
    pd.DataFrame(vst_rows).to_csv(os.path.join(out_dir, "sample_neon.csv"), index=False)

    # --- data artifact: per-crown crops + annotations + split ----------------
    artifact = os.path.join(out_dir, "artifact")
    ann_rows = []
    srcs = {y: raster.open_raster(hsi_paths[y]) for y in YEARS}
    for r, geom in zip(crowns.itertuples(), crowns.geometry):
        for year in YEARS:
            # ~15% missing year crops (exercises the zero-fill path)
            if rng.rand() < 0.15 and year != YEARS[0]:
                continue
            left, bottom, right, top = geom.bounds
            img = srcs[year].read_bounds(left, bottom, right, top)
            name = "{}_{}.tif".format(r.individual, year)
            raster.write_raster(os.path.join(artifact, name), img, crs=EPSG)
            ann_rows.append(
                {
                    "individual": r.individual,
                    "taxonID": r.taxonID,
                    "siteID": r.siteID,
                    "plotID": r.plotID,
                    "image_path": name,
                    "tile_year": year,
                    "height": r.height,
                    "CHM_height": float(np.clip(r.height + rng.randn(), 2, None)),
                    "box_id": r.box_id,
                    "score": r.score,
                }
            )
    for s in srcs.values():
        s.close()
    ann = pd.DataFrame(ann_rows)

    species_labels = {t: i for i, t in enumerate(sorted(ann.taxonID.unique()))}
    sites = {t: i for i, t in enumerate(sorted(ann.siteID.unique()))}
    ann["label"] = ann.taxonID.map(species_labels)
    ann["site"] = ann.siteID.map(sites)

    test_plots = ["HARV_000"]
    test = ann[ann.plotID.isin(test_plots)]
    train = ann[~ann.plotID.isin(test_plots)]
    train.to_csv(os.path.join(artifact, "train.csv"), index=False)
    test.to_csv(os.path.join(artifact, "test.csv"), index=False)
    ann.to_csv(os.path.join(artifact, "annotations.csv"), index=False)

    # --- alive/dead RGB folders ----------------------------------------------
    from PIL import Image

    for split in ["train", "test"]:
        for cls, base in [("Alive", 60), ("Dead", 180)]:
            for i in range(6):
                arr = np.clip(
                    base + rng.randint(-40, 40, size=(32, 32, 3)), 0, 255
                ).astype(np.uint8)
                Image.fromarray(arr).save(
                    os.path.join(out_dir, "dead", split, cls, "{}.png".format(i))
                )

    with open(os.path.join(out_dir, "fixture_info.json"), "w") as f:
        json.dump(
            {
                "species": SPECIES,
                "years": YEARS,
                "n_individuals": int(len(crowns)),
                "epsg": EPSG,
                "version": VERSION,
            },
            f,
            indent=1,
        )
    return out_dir


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(os.path.dirname(__file__), "data")
    build(out)
    print("fixtures written to", out)


def fixture_config(fixtures_dir):
    """The suite's config (shared with conftest.py's `config` fixture and the
    multi-process workers in tests/distributed_worker.py)."""
    import os

    from deeptreeattention_tpu.utils.config import default_config

    cfg = default_config()
    artifact = os.path.join(fixtures_dir, "artifact")
    cfg["min_CHM_height"] = None
    cfg["iterations"] = 1
    cfg["rgb_sensor_pool"] = os.path.join(fixtures_dir, "rgb", "*.tif")
    cfg["HSI_sensor_pool"] = os.path.join(fixtures_dir, "hsi", "*.tif")
    cfg["CHM_pool"] = os.path.join(fixtures_dir, "chm", "*.tif")
    cfg["min_train_samples"] = 1
    cfg["min_test_samples"] = 1
    cfg["crop_dir"] = artifact
    cfg["data_dir"] = fixtures_dir
    cfg["bands"] = 8
    cfg["classes"] = 3
    cfg["top_k"] = 1
    cfg["convert_h5"] = False
    cfg["plot_n_individuals"] = 0
    cfg["megaplot_dir"] = None
    cfg["use_data_commit"] = "artifact"
    cfg["dead"]["epochs"] = 1
    cfg["pretrain_state_dict"] = None
    cfg["preload_images"] = False
    cfg["batch_size"] = 2
    cfg["workers"] = 0
    cfg["dead"]["num_workers"] = 0
    cfg["dead"]["batch_size"] = 2
    cfg["epochs"] = 1
    cfg["compute_dtype"] = "float32"
    cfg["samples_from_other_sites"] = 1000
    return cfg
