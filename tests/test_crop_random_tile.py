"""Self-supervised random-crop miner (notebooks/crop_random_tile.py,
reference notebooks/crop_random_tile.py:1-248)."""
import glob
import json
import os
import shutil
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "notebooks"))

import crop_random_tile as crt  # noqa: E402

from deeptreeattention_tpu.geo import raster  # noqa: E402


@pytest.fixture()
def pools(fixtures_dir, tmp_path):
    rgb = sorted(glob.glob(os.path.join(fixtures_dir, "rgb", "*.tif")))
    hsi = sorted(glob.glob(os.path.join(fixtures_dir, "hsi", "*.tif")))
    # the fixture CHM is single-year; synthesize per-year copies so the
    # >= 3-common-years rule can pass
    chm_dir = tmp_path / "chm"
    chm_dir.mkdir()
    src = os.path.join(fixtures_dir, "chm", "HARV_726000_4699000_CHM.tif")
    chm = []
    for year in ("2018", "2019", "2020"):
        dst = str(chm_dir / "{}_HARV_5_726000_4699000_CHM.tif".format(year))
        shutil.copyfile(src, dst)
        chm.append(dst)
    return {"rgb": rgb, "hsi": hsi, "chm": chm}


def test_random_crop_writes_aligned_years(config, pools, tmp_path):
    cfg = dict(config)
    cfg["convert_h5"] = False
    savedir = str(tmp_path / "ss")
    out = None
    for i in range(10):  # some seeds land windows fine on the small fixture
        out = crt.random_crop(cfg, iteration=i, pools=pools, savedir=savedir)
        if out:
            break
    assert out, "no crop produced from the fixture pools"
    year_dirs = sorted(glob.glob(os.path.join(out, "*-01-01")))
    assert len(year_dirs) == 3
    shapes = []
    for yd in year_dirs:
        for base in ("RGB", "HSI", "CHM"):
            p = os.path.join(yd, "{}.tif".format(base))
            assert os.path.exists(p), p
        with open(os.path.join(yd, "metadata.json")) as f:
            meta = json.load(f)
        assert {"siteID", "bounds", "epsg"} <= set(meta)
        with raster.open_raster(os.path.join(yd, "RGB.tif")) as src:
            shapes.append((src.height, src.width))
            assert src.crs is not None
    # aligned: same window size every year
    assert len(set(shapes)) == 1


def test_cleanup_removes_partial_locations(config, pools, tmp_path):
    cfg = dict(config)
    cfg["convert_h5"] = False
    savedir = str(tmp_path / "ss")
    out = None
    for i in range(10):
        out = crt.random_crop(cfg, iteration=i, pools=pools, savedir=savedir)
        if out:
            break
    assert out
    # break one sensor at one year -> cleanup drops that sensor everywhere
    victims = sorted(glob.glob(os.path.join(out, "*-01-01", "CHM.tif")))
    os.remove(victims[0])
    crt.cleanup(savedir)
    assert not glob.glob(os.path.join(out, "*-01-01", "CHM.tif"))
    # other sensors with full 3-year coverage survive
    assert len(glob.glob(os.path.join(out, "*-01-01", "RGB.tif"))) == 3


def test_crop_array_roundtrip(pools):
    rgb = pools["rgb"][0]
    with raster.open_raster(rgb) as src:
        t = src.transform
        left, top = t * (10, 10)
        right, bottom = t * (42, 42)
    arr = crt.crop((left, bottom, right, top), rgb)
    assert arr.shape[-2:] == (32, 32)
    assert np.isfinite(arr).all()
