"""Tests for the remaining ETL modules: megaplot ingest, per-pixel patches,
NEON path utilities, h5->tif conversion (patterns: reference
tests/test_megaplot.py, test_patches.py, and the Hyperspectral usage)."""
import glob
import os

import h5py
import numpy as np
import pandas as pd
import pytest

from deeptreeattention_tpu.data import hyperspectral, megaplot, neon_paths, patches
from deeptreeattention_tpu.geo import affine, geometry, raster, vector


# -- neon_paths -----------------------------------------------------------

def test_bounds_to_geoindex():
    assert neon_paths.bounds_to_geoindex((726400, 4699900, 726600, 4699950)) == "726000_4699000"


def test_find_sensor_path(fixtures_dir):
    pool = glob.glob(os.path.join(fixtures_dir, "rgb", "*.tif"))
    newest = neon_paths.find_sensor_path(pool, geo_index="726000_4699000")
    assert "2020" in newest  # newest-first
    all_years = neon_paths.find_sensor_path(pool, geo_index="726000_4699000", all_years=True)
    assert len(all_years) == 3
    with pytest.raises(ValueError):
        neon_paths.find_sensor_path(pool, geo_index="1_2")


def test_year_and_site_parsers(fixtures_dir):
    pool = sorted(glob.glob(os.path.join(fixtures_dir, "rgb", "*.tif")))
    assert neon_paths.year_from_tile(pool[0]) == "2018"
    assert neon_paths.site_from_path("NEON_D01_HARV_DP3_726000_4699000.tif") == "HARV"
    assert neon_paths.domain_from_path("NEON_D01_HARV_DP3.tif") == "D01"


# -- patches ---------------------------------------------------------------

def test_row_col_and_pixel_windows(fixtures_dir):
    tile = sorted(glob.glob(os.path.join(fixtures_dir, "hsi", "*.tif")))[0]
    with raster.open_raster(tile) as src:
        bounds = (726010.0, 4699180.0, 726013.0, 4699183.0)  # 3x3 px
        rc = patches.row_col_from_bounds(bounds, src)
    assert len(rc) == 9
    crops = patches.bounds_to_pixel(bounds, tile)
    assert len(crops) == 9
    (row, col), img = crops[0]
    assert img.shape == (28, 11, 11)


def test_crop_function(fixtures_dir, tmp_path):
    tile = sorted(glob.glob(os.path.join(fixtures_dir, "hsi", "*.tif")))[0]
    arr = patches.crop((726010.0, 4699150.0, 726020.0, 4699160.0), sensor_path=tile)
    assert arr.shape == (28, 10, 10)
    fn = patches.crop((726010.0, 4699150.0, 726020.0, 4699160.0), sensor_path=tile,
                      savedir=str(tmp_path), basename="c")
    assert fn.endswith("c.tif") and os.path.exists(fn)


# -- hyperspectral (h5 -> tif) -----------------------------------------------

def test_h5_conversion(tmp_path):
    # synthesize a minimal NEON reflectance h5
    h, w, b = 40, 50, 426
    rng = np.random.RandomState(0)
    refl = rng.randint(0, 10000, size=(h, w, b)).astype(np.int16)
    path = str(tmp_path / "NEON_D03_OSBS_DP3_405000_3286000_reflectance.h5")
    with h5py.File(path, "w") as f:
        g = f.create_group("OSBS").create_group("Reflectance")
        d = g.create_dataset("Reflectance_Data", data=refl)
        d.attrs["Data_Ignore_Value"] = -9999.0
        d.attrs["Scale_Factor"] = 10000.0
        meta = g.create_group("Metadata")
        cs = meta.create_group("Coordinate_System")
        cs.create_dataset("EPSG Code", data=np.bytes_("32617"))
        cs.create_dataset(
            "Map_Info",
            data=np.bytes_("UTM, 1.000, 1.000, 405000.00, 3286000.00, 1.0000000, 1.0000000, 17, North, WGS-84, units=Meters"),
        )
        meta.create_group("Spectral_Data").create_dataset(
            "Wavelength", data=np.linspace(380, 2500, b)
        )

    name = hyperspectral.generate_raster(
        path, save_dir=str(tmp_path), rgb_filename="2019_OSBS_405000_3286000_image.tif",
        suffix="2019",
    )
    out = os.path.join(str(tmp_path), name)
    assert name.endswith("_hyperspectral_2019.tif")
    with raster.open_raster(out) as src:
        assert src.count == 369  # water bands dropped
        assert src.crs == 32617
        assert src.transform.c == 405000.0
        # band content: first kept band is original band 0
        np.testing.assert_array_equal(src.read(indexes=[1])[0], refl[:, :, 0])


def test_no_water_band_count():
    idx = hyperspectral.no_water_band_indexes()
    assert len(idx) == 369


def test_lookup_and_convert_lazy_cache(tmp_path, monkeypatch):
    """lookup_and_convert converts each year's h5 once, then reuses the tif."""
    calls = []

    def fake_convert(h5_path, rgb_path, savedir, year=None):
        calls.append(h5_path)
        out = os.path.join(
            savedir,
            os.path.splitext(os.path.basename(rgb_path))[0]
            + "_hyperspectral_{}.tif".format(year),
        )
        with open(out, "w") as f:
            f.write("tif")
        return out

    monkeypatch.setattr(neon_paths, "convert_h5", fake_convert)
    rgb_pool = [str(tmp_path / "2019_OSBS_405000_3286000_image.tif")]
    h5_pool = [
        str(tmp_path / "2018" / "NEON_405000_3286000_reflectance.h5"),
        str(tmp_path / "2019" / "NEON_405000_3286000_reflectance.h5"),
    ]
    out = neon_paths.lookup_and_convert(
        rgb_pool=rgb_pool, hyperspectral_pool=h5_pool, savedir=str(tmp_path),
        geo_index="405000_3286000", all_years=True,
    )
    assert len(out) == 2 and len(calls) == 2
    # second call: cached, no new conversions
    out2 = neon_paths.lookup_and_convert(
        rgb_pool=rgb_pool, hyperspectral_pool=h5_pool, savedir=str(tmp_path),
        geo_index="405000_3286000", all_years=True,
    )
    assert out2 == out and len(calls) == 2


# -- megaplot ----------------------------------------------------------------

@pytest.fixture()
def contrib_shp(tmp_path):
    rng = np.random.RandomState(0)
    pts = []
    rows = []
    # two clusters ~200m apart
    for cx in (405000, 405200):
        for i in range(6):
            pts.append(geometry.Point(cx + rng.uniform(0, 10), 3286000 + rng.uniform(0, 10)))
            rows.append({"taxonID": "QULA2", "height": float(rng.uniform(5, 20))})
    gdf = vector.GeoDataFrame(pd.DataFrame(rows), geometry=pts, crs=32617)
    path = str(tmp_path / "OSBS_contrib.shp")
    gdf.to_file(path)
    return str(tmp_path)


def test_megaplot_load(contrib_shp, config):
    cfg = dict(config)
    cfg["min_CHM_height"] = None  # skip CHM for contributed data
    out = megaplot.load(directory=contrib_shp, config=cfg, site="OSBS")
    assert len(out) == 12
    assert {"individual", "plotID", "siteID", "taxonID"} <= set(out.columns)
    assert out.siteID.unique().tolist() == ["OSBS"]
    # two spatial clusters -> at least two pseudo-plots
    assert out.plotID.nunique() >= 2
    assert out.individual.is_unique


def test_year_from_tile_ignores_coordinates():
    """UTM digit runs must not be read as years (real NEON basenames carry
    eastings/northings like 3282000 that contain '2000'/'1960')."""
    from deeptreeattention_tpu.data import neon_paths

    assert (
        neon_paths.year_from_tile(
            "/pool/2019/NEON_D03_OSBS_DP3_399000_3282000_reflectance.h5"
        )
        == "2019"
    )
    assert (
        neon_paths.year_from_tile(
            "/pool/2021/NEON_D01_HARV_DP3_720000_4196000_reflectance.h5"
        )
        == "2021"
    )
    assert (
        neon_paths.year_from_tile("2019_HARV_5_726000_4699000_image_2019.tif")
        == "2019"
    )


def test_crop_tif_keeps_georeferencing(fixtures_dir, tmp_path):
    """Written crown crops carry the window transform (reference
    src/patches.py behavior), not pixel coordinates."""
    import glob

    import numpy as np

    from deeptreeattention_tpu.data.crops import crop
    from deeptreeattention_tpu.geo import raster

    tile = sorted(glob.glob(os.path.join(fixtures_dir, "hsi", "*.tif")))[0]
    with raster.open_raster(tile) as src:
        left, bottom, right, top = src.bounds
    l, b = left + 5, bottom + 5
    path = crop((l, b, l + 6, b + 6), sensor_path=tile,
                savedir=str(tmp_path), basename="georef")
    with raster.open_raster(path) as out:
        t = out.transform
        assert abs(t.c - l) < 1e-6, (t.c, l)
        assert abs((t.f + t.e * out.height) - b) < 1e-6
        assert out.crs is not None
