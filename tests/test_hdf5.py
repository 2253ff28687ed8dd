"""In-house HDF5 codec (geo/hdf5.py) vs h5py ground truth.

The reference reads NEON .h5 reflectance through h5py/libhdf5
(reference src/Hyperspectral.py:6-65); our codec parses the format
directly. Every file here is WRITTEN by h5py (the real native library)
and READ by the in-house parser — an open-loop compatibility check, not
a round-trip of our own writer.
"""
import os

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from deeptreeattention_tpu.geo import hdf5


@pytest.fixture(params=["earliest", "latest"])
def h5file(request, tmp_path):
    """One file per superblock/object-header generation h5py can emit."""
    rng = np.random.default_rng(7)
    p = str(tmp_path / "t_{}.h5".format(request.param))
    with h5py.File(p, "w", libver=request.param) as f:
        f.attrs["map_info"] = "UTM, 1, 1, 731000.0, 4713000.0, 1, 1"
        f.attrs["epsg"] = np.int64(32618)
        f.attrs["scale"] = 0.0001
        g = f.create_group("HARV/Reflectance")
        d = g.create_dataset(
            "Reflectance_Data",
            data=rng.integers(-100, 10000, (37, 41, 26), dtype=np.int16),
            chunks=(16, 16, 13), compression="gzip", shuffle=True)
        d.attrs["Data_Ignore_Value"] = -9999.0
        g.create_dataset("contig", data=rng.random((5, 7)).astype(np.float32))
        g.create_dataset("scalar", data=np.float64(3.5))
        g.create_dataset("strs", data=np.array([b"a", b"bb", b"ccc"], "S3"))
        g.create_dataset("vls", data=["alpha", "beta"],
                         dtype=h5py.string_dtype())
        f.create_dataset("fl32", data=rng.random(9).astype(np.float32),
                         chunks=(4,), fletcher32=True)
    return p


def test_tree_and_attrs(h5file):
    with h5py.File(h5file, "r") as ref, hdf5.File(h5file) as mine:
        assert sorted(mine.keys()) == sorted(ref.keys())
        assert mine.attrs["map_info"] == "UTM, 1, 1, 731000.0, 4713000.0, 1, 1"
        assert int(mine.attrs["epsg"]) == 32618
        assert abs(float(mine.attrs["scale"]) - 0.0001) < 1e-12
        d = mine["HARV/Reflectance/Reflectance_Data"]
        assert float(d.attrs["Data_Ignore_Value"]) == -9999.0
        assert d.shape == (37, 41, 26) and d.dtype == np.int16
        assert d.chunks == (16, 16, 13)
        assert "HARV" in mine and "missing" not in mine
        names = []
        mine.visit(names.append)
        assert "HARV/Reflectance/Reflectance_Data" in names


def test_chunked_deflate_shuffle(h5file):
    with h5py.File(h5file, "r") as ref, hdf5.File(h5file) as mine:
        r = ref["HARV/Reflectance/Reflectance_Data"]
        m = mine["HARV/Reflectance/Reflectance_Data"]
        np.testing.assert_array_equal(r[:], m[:])
        # lazy hyperslab: only intersecting chunks are decoded
        np.testing.assert_array_equal(r[3:20, 5:40, :], m[3:20, 5:40, :])
        np.testing.assert_array_equal(r[7], m[7])
        np.testing.assert_array_equal(r[2:5, 1, 3:9], m[2:5, 1, 3:9])
        # fancy indexing falls back to full read + numpy
        np.testing.assert_array_equal(r[:, :, [0, 5, 11]], m[:, :, [0, 5, 11]])


def test_contiguous_scalar_strings(h5file):
    with h5py.File(h5file, "r") as ref, hdf5.File(h5file) as mine:
        np.testing.assert_array_equal(ref["HARV/Reflectance/contig"][:],
                                      mine["HARV/Reflectance/contig"][:])
        assert float(mine["HARV/Reflectance/scalar"][()]) == 3.5
        np.testing.assert_array_equal(ref["HARV/Reflectance/strs"][:],
                                      mine["HARV/Reflectance/strs"][:])
        assert list(mine["HARV/Reflectance/vls"][:]) == ["alpha", "beta"]


def test_fletcher32(h5file):
    with h5py.File(h5file, "r") as ref, hdf5.File(h5file) as mine:
        np.testing.assert_array_equal(ref["fl32"][:], mine["fl32"][:])


def test_many_chunk_parallel_inflate(tmp_path):
    """Deflate-only many-chunk read takes the native fan-out path when the
    C++ library is present; result identical either way."""
    p = str(tmp_path / "big.h5")
    rng = np.random.default_rng(1)
    big = rng.integers(0, 30000, (64, 64, 40), dtype=np.int16)
    with h5py.File(p, "w") as f:
        f.create_dataset("d", data=big, chunks=(8, 8, 40), compression="gzip")
    with hdf5.File(p) as mine:
        np.testing.assert_array_equal(big, mine["d"][:])
        np.testing.assert_array_equal(big[5:60, 3:33], mine["d"][5:60, 3:33])


def test_neon_shaped_file_no_fallback(tmp_path):
    """The real consumer path (h5refl2array) must be served by the in-house
    parser — h5py stays a fallback, not the default."""
    from deeptreeattention_tpu.data import hyperspectral

    h, w, b = 12, 14, 426
    rng = np.random.RandomState(0)
    refl = rng.randint(0, 10000, size=(h, w, b)).astype(np.int16)
    p = str(tmp_path / "NEON_D03_OSBS_DP3_405000_3286000_reflectance.h5")
    with h5py.File(p, "w") as f:
        g = f.create_group("OSBS").create_group("Reflectance")
        d = g.create_dataset("Reflectance_Data", data=refl,
                             chunks=(8, 8, 128), compression="gzip")
        d.attrs["Data_Ignore_Value"] = -9999.0
        d.attrs["Scale_Factor"] = 10000.0
        meta = g.create_group("Metadata")
        cs = meta.create_group("Coordinate_System")
        cs.create_dataset("EPSG Code", data=np.bytes_("32617"))
        cs.create_dataset("Map_Info", data=np.bytes_(
            "UTM, 1.000, 1.000, 405000.00, 3286000.00, 1.0, 1.0, 17"))
        meta.create_group("Spectral_Data").create_dataset(
            "Wavelength", data=np.linspace(380, 2500, b))
        meta.create_group("Ancillary_Imagery").create_dataset(
            "Smooth_Surface_Elevation", data=np.full((h, w), 123.0))

    # read the whole product through the in-house File directly (no fallback)
    with hdf5.File(p) as f:
        meta_mine, arr = hyperspectral._h5refl2array(f)
    np.testing.assert_array_equal(arr, refl)
    assert meta_mine["epsg"] == 32617
    assert meta_mine["noDataVal"] == -9999.0
    assert meta_mine["ext_dict"]["xMin"] == 405000.0

    from deeptreeattention_tpu.data import neon_paths
    assert neon_paths.elevation_from_tile(p) == 123.0


def _write_neon_h5(path, refl):
    h, w, b = refl.shape
    with h5py.File(path, "w") as f:
        g = f.create_group("OSBS").create_group("Reflectance")
        d = g.create_dataset("Reflectance_Data", data=refl,
                             chunks=(16, 16, b), compression="gzip")
        d.attrs["Data_Ignore_Value"] = -9999.0
        d.attrs["Scale_Factor"] = 10000.0
        meta = g.create_group("Metadata")
        cs = meta.create_group("Coordinate_System")
        cs.create_dataset("EPSG Code", data=np.bytes_("32617"))
        cs.create_dataset("Map_Info", data=np.bytes_(
            "UTM, 1, 1, 405000.00, 3286000.00, 1.0, 1.0, 17"))
        meta.create_group("Spectral_Data").create_dataset(
            "Wavelength", data=np.linspace(380, 2500, b))


def test_h5raster_matches_converted_tif(tmp_path):
    """Direct .h5 window reads == reads from the converted GeoTIFF.

    The conversion step the reference requires (src/neon_paths.py:72-97)
    becomes optional: open_raster('*.h5') serves identical windows."""
    from deeptreeattention_tpu.data import hyperspectral
    from deeptreeattention_tpu.geo import raster

    rng = np.random.RandomState(3)
    refl = rng.randint(0, 10000, size=(40, 35, 426)).astype(np.int16)
    p = str(tmp_path / "NEON_D03_OSBS_DP3_405000_3286000_reflectance.h5")
    _write_neon_h5(p, refl)
    name = hyperspectral.generate_raster(
        p, save_dir=str(tmp_path), rgb_filename="2019_OSBS_x_image.tif")
    tif = str(tmp_path / name)

    with raster.open_raster(p) as h5src, raster.open_raster(tif) as tsrc:
        assert isinstance(h5src, hyperspectral.H5Raster)
        assert h5src.count == tsrc.count == 369
        assert h5src.crs == tsrc.crs == 32617
        assert h5src.transform == tsrc.transform
        assert h5src.bounds == tsrc.bounds
        np.testing.assert_array_equal(h5src.read(), tsrc.read())
        # interior window through bounds
        win = (405005.0, 3285975.0, 405016.0, 3285986.0)
        np.testing.assert_array_equal(
            h5src.read_bounds(*win), tsrc.read_bounds(*win))
        # boundless edge window (reference src/patches.py:70 semantics)
        from deeptreeattention_tpu.geo.affine import Window
        w = Window(-3, -4, 11, 11)
        np.testing.assert_array_equal(
            h5src.read(window=w, boundless=True),
            tsrc.read(window=w, boundless=True))
        # 1-based band indexes
        np.testing.assert_array_equal(
            h5src.read(indexes=[1, 12]), tsrc.read(indexes=[1, 12]))


def test_crop_direct_from_h5(tmp_path):
    """data.crops.crop cuts crown bounds straight from the .h5 product."""
    from deeptreeattention_tpu.data.crops import crop

    rng = np.random.RandomState(4)
    refl = rng.randint(0, 10000, size=(30, 30, 426)).astype(np.int16)
    p = str(tmp_path / "NEON_D03_OSBS_DP3_405000_3286000_reflectance.h5")
    _write_neon_h5(p, refl)
    arr = crop((405003.0, 3285990.0, 405010.0, 3285997.0), sensor_path=p)
    assert arr.shape == (369, 7, 7)
    keep = np.ones(426, bool)
    for lo, hi in [(419, 426), (283, 315), (192, 210)]:
        keep[lo:hi] = False
    np.testing.assert_array_equal(
        arr, np.moveaxis(refl[3:10, 3:10, keep], -1, 0))


def test_generate_crops_direct_from_h5_pool(tmp_path):
    """Full crop generation from a raw .h5 pool with convert_h5=False —
    the conversion stage (reference src/neon_paths.py:72-97 requires it
    whenever the pool is h5) is skipped entirely."""
    from deeptreeattention_tpu.data.crops import generate_crops
    from deeptreeattention_tpu.geo import vector
    from deeptreeattention_tpu.geo.geometry import box

    rng = np.random.RandomState(5)
    tiles = {}
    for year in ("2018", "2019"):
        d = tmp_path / year
        d.mkdir()
        refl = rng.randint(0, 10000, size=(30, 30, 426)).astype(np.int16)
        p = str(d / "NEON_D03_OSBS_DP3_405000_3285000_reflectance.h5")
        _write_neon_h5(p, refl)
        tiles[year] = refl

    crowns = vector.GeoDataFrame(
        {"individual": ["a", "b"],
         "taxonID": ["PIPA2", "QULA3"],
         "plotID": ["p1", "p1"],
         "siteID": ["OSBS", "OSBS"]},
        geometry=[box(405003, 3285990, 405008, 3285995),
                  box(405012, 3285980, 405018, 3285986)],
        crs=32617)

    savedir = str(tmp_path / "crops")
    ann = generate_crops(
        crowns, sensor_glob=str(tmp_path / "*" / "*.h5"), savedir=savedir,
        rgb_glob=None, convert_h5=False, as_numpy=True)
    assert sorted(ann.tile_year.unique()) == ["2018", "2019"]
    assert len(ann) == 4  # 2 crowns x 2 years
    keep = np.ones(426, bool)
    for lo, hi in [(419, 426), (283, 315), (192, 210)]:
        keep[lo:hi] = False
    got = np.load(os.path.join(savedir, "a_2019.npy"))
    want = np.moveaxis(tiles["2019"][5:10, 3:8, keep], -1, 0)
    np.testing.assert_array_equal(got, want)


def test_is_hdf5(tmp_path):
    p = str(tmp_path / "x.h5")
    with h5py.File(p, "w") as f:
        f.create_dataset("d", data=np.arange(3))
    assert hdf5.is_hdf5(p)
    q = str(tmp_path / "not.h5")
    with open(q, "wb") as f:
        f.write(b"plainbytes")
    assert not hdf5.is_hdf5(q)
    with pytest.raises((ValueError, NotImplementedError)):
        hdf5.File(q)


def test_readonly_guard(tmp_path):
    with pytest.raises(NotImplementedError):
        hdf5.File(str(tmp_path / "w.h5"), mode="w")


# ---------------------------------------------------------------------------
# robustness: corrupt/truncated files fail loudly, not wrongly
# ---------------------------------------------------------------------------

def test_not_hdf5_rejected(tmp_path):
    p = tmp_path / "junk.h5"
    p.write_bytes(b"definitely not an hdf5 file" * 10)
    with pytest.raises(ValueError, match="not an HDF5 file"):
        hdf5.File(str(p))


def test_empty_file_rejected(tmp_path):
    p = tmp_path / "empty.h5"
    p.write_bytes(b"")
    with pytest.raises(ValueError):
        hdf5.File(str(p))


def test_truncated_file_fails_loudly(tmp_path):
    import h5py

    p = tmp_path / "t.h5"
    with h5py.File(p, "w") as f:
        f.create_dataset("d", data=np.arange(100000, dtype=np.int32),
                         chunks=(1024,), compression="gzip")
    raw = p.read_bytes()
    p.write_bytes(raw[: len(raw) // 3])
    try:
        f = hdf5.File(str(p))
        with pytest.raises(Exception):
            np.asarray(f["d"][:])
    except Exception:
        pass  # failing at open time is equally acceptable


def test_corrupt_deflate_chunk_fails_loudly(tmp_path):
    import h5py

    p = tmp_path / "c.h5"
    with h5py.File(p, "w") as f:
        f.create_dataset("d", data=np.arange(4096, dtype=np.float32),
                         chunks=(512,), compression="gzip")
    raw = bytearray(p.read_bytes())
    # smash bytes near the end (inside chunk data, away from the metadata
    # at the front)
    for i in range(len(raw) - 200, len(raw) - 100):
        raw[i] ^= 0xFF
    p.write_bytes(bytes(raw))
    f = hdf5.File(str(p))
    with pytest.raises(Exception):
        np.asarray(f["d"][:])


# ---------------------------------------------------------------------------
# h5py-parity regressions (libver='latest' layouts, indexing semantics)
# ---------------------------------------------------------------------------

def test_latest_libver_lazy_window(tmp_path):
    """v4 (chunked4) layouts take the lazy hyperslab path, matching h5py."""
    p = tmp_path / "v4.h5"
    data = np.arange(96 * 96, dtype=np.int32).reshape(96, 96)
    with h5py.File(p, "w", libver="latest") as f:
        f.create_dataset("d", data=data, chunks=(16, 16), compression="gzip")
    f = hdf5.File(str(p))
    np.testing.assert_array_equal(np.asarray(f["d"][3:20, 40:55]), data[3:20, 40:55])
    np.testing.assert_array_equal(np.asarray(f["d"][:]), data)


def test_dense_link_storage_falls_back(tmp_path):
    """Groups with dense (fractal-heap) links raise NotImplementedError from
    the in-house parser instead of listing nothing — so read_with_fallback
    keeps working via h5py."""
    p = tmp_path / "dense.h5"
    with h5py.File(p, "w", libver="latest") as f:
        g = f.create_group("G")
        for i in range(40):
            g.create_dataset("d{:02d}".format(i), data=np.arange(4))
    f = hdf5.File(str(p))
    try:
        keys = f["G"].keys()
        # parsed fine -> must agree with h5py
        assert len(keys) == 40
    except NotImplementedError:
        pass  # loud failure is the contract; silent empty listing is the bug

    from deeptreeattention_tpu.geo.hdf5 import read_with_fallback

    def op(h):
        return sorted(h["G"].keys())

    assert len(read_with_fallback(str(p), op)) == 40


def test_integer_index_bounds(tmp_path):
    p = tmp_path / "ix.h5"
    data = np.arange(64 * 8, dtype=np.int16).reshape(64, 8)
    with h5py.File(p, "w") as f:
        f.create_dataset("d", data=data, chunks=(16, 8))
    f = hdf5.File(str(p))
    np.testing.assert_array_equal(np.asarray(f["d"][5]), data[5])
    np.testing.assert_array_equal(np.asarray(f["d"][-1]), data[-1])
    with pytest.raises(IndexError):
        f["d"][64]
    with pytest.raises(IndexError):
        f["d"][70]


def test_contains_nested_paths(h5file):
    f = hdf5.File(str(h5file))
    keys = f.keys()
    assert keys
    first = keys[0]
    assert first in f
    assert "{}/definitely_missing".format(first) not in f
    assert "no_such_thing" not in f


def test_userblock_file(tmp_path):
    p = tmp_path / "ub.h5"
    data = np.arange(32 * 32, dtype=np.float32).reshape(32, 32)
    with h5py.File(p, "w", userblock_size=512) as f:
        f.create_dataset("d", data=data, chunks=(8, 8), compression="gzip")
        f["d"].attrs["tag"] = np.int32(7)
    with open(p, "r+b") as fh:
        fh.write(b"USERBLOCK!" * 8)  # arbitrary prefix content
    f = hdf5.File(str(p))
    np.testing.assert_array_equal(np.asarray(f["d"][:]), data)
    np.testing.assert_array_equal(np.asarray(f["d"][2:9, 1:5]), data[2:9, 1:5])
    assert int(f["d"].attrs["tag"]) == 7
    assert hdf5.is_hdf5(str(p))  # h5py-style offset scan finds the superblock


def test_fill_value_sparse_chunks(tmp_path):
    """Unallocated chunks and never-written data decode as the file's
    declared fill value, matching h5py (not zeros)."""
    p = str(tmp_path / "fill.h5")
    with h5py.File(p, "w") as f:
        d = f.create_dataset("sparse", shape=(8, 8), dtype=np.float32,
                             chunks=(4, 4), fillvalue=-9999.0)
        d[0:4, 0:4] = 1.5  # only the first chunk is ever written
        f.create_dataset("never", shape=(3, 3), dtype=np.int16,
                         fillvalue=-7)
        f.create_dataset("zero_fill", shape=(2, 2), dtype=np.float64)
    with h5py.File(p, "r") as ref, hdf5.File(p) as mine:
        for name in ("sparse", "never", "zero_fill"):
            np.testing.assert_array_equal(mine[name][:], ref[name][:])
        # windowed read crossing allocated and unallocated chunks
        np.testing.assert_array_equal(mine["sparse"][2:6, 2:6],
                                      ref["sparse"][2:6, 2:6])


def test_fill_value_via_read_with_fallback(tmp_path):
    p = str(tmp_path / "fill2.h5")
    with h5py.File(p, "w") as f:
        f.create_dataset("d", shape=(4,), dtype=np.float32,
                         chunks=(2,), fillvalue=-1.0)
    out = hdf5.read_with_fallback(p, lambda f: np.asarray(f["d"][:]))
    np.testing.assert_array_equal(out, np.full(4, -1.0, np.float32))


class _FakeReader:
    """Minimal reader stub over a bytes buffer for message-parser units."""

    def __init__(self, b):
        self.b = b

    def u8(self, o):
        return self.b[o]

    def u32(self, o):
        return int.from_bytes(self.b[o:o + 4], "little")

    def raw(self, o, n):
        return bytes(self.b[o:o + n])


def _parse_fill_direct(buf, msgs):
    import types

    stub = types.SimpleNamespace(
        _dtype=types.SimpleNamespace(cls=0, size=4, np=np.float32))
    return hdf5.Dataset._parse_fill(stub, _FakeReader(buf), msgs)


def test_fill_message_v1_offsets():
    """v1 fill messages have NO 'defined' byte: Size sits at body+3 and the
    value at body+7 (HDF5 spec, Fill Value message v1). The regression this
    pins: float32 1.0 fill (first LE byte 0x00) misread with v2 offsets
    parses as size=0 and the fill is silently dropped."""
    fill = np.float32(1.0).tobytes()  # 00 00 80 3f — first byte is zero
    v1 = bytes([1, 2, 0]) + (4).to_bytes(4, "little") + fill
    val = _parse_fill_direct(v1, [(hdf5.MSG_FILL, 0)])
    assert val == np.float32(1.0)


def test_fill_message_v2_offsets():
    """v2 keeps the 'defined' byte at body+3; size at +4, value at +8."""
    fill = np.float32(-9999.0).tobytes()
    v2 = bytes([2, 2, 0, 1]) + (4).to_bytes(4, "little") + fill
    assert _parse_fill_direct(v2, [(hdf5.MSG_FILL, 0)]) == np.float32(-9999.0)
    # undefined fill: skipped, not misread
    v2u = bytes([2, 2, 0, 0]) + (4).to_bytes(4, "little") + fill
    assert _parse_fill_direct(v2u, [(hdf5.MSG_FILL, 0)]) is None


def test_h5raster_falls_back_to_h5py(tmp_path, monkeypatch):
    """An .h5 whose parse trips a NotImplementedError on the in-house codec
    still opens on the main open_raster path, via the same h5py fallback
    policy as hdf5.read_with_fallback (advisor round-3 finding: previously
    predict.py's per-tile try/except turned this into a silently skipped
    tile)."""
    from deeptreeattention_tpu.data import hyperspectral

    rng = np.random.RandomState(5)
    refl = rng.randint(0, 10000, size=(20, 18, 426)).astype(np.int16)
    p = str(tmp_path / "NEON_D03_OSBS_DP3_405000_3286000_reflectance.h5")
    _write_neon_h5(p, refl)

    expected = hyperspectral.H5Raster(p).read()

    class _Trip:
        def __init__(self, path):
            raise NotImplementedError("hdf5: unsupported attribute message")

    monkeypatch.setattr(hdf5, "File", _Trip)
    r = hyperspectral.H5Raster(p)
    assert r.count == 369
    np.testing.assert_array_equal(r.read(), expected)
