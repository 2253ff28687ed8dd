"""Native C++ GeoTIFF decoder vs the numpy codec: bit-identical reads,
model-ready patch parity with the Python preprocessing chain, and a
throughput sanity margin."""
import time

import numpy as np
import pytest

from deeptreeattention_tpu.geo import affine, native, raster
from deeptreeattention_tpu.ops.preprocess import preprocess_image_np


pytestmark = pytest.mark.skipif(not native.available(), reason="no native toolchain")


@pytest.fixture(scope="module")
def big_tile(tmp_path_factory):
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 10000, size=(28, 400, 500)).astype(np.int16)
    t = affine.from_origin(726000.0, 4699400.0, 1.0, 1.0)
    path = str(tmp_path_factory.mktemp("native") / "tile.tif")
    raster.write_raster(path, arr, transform=t, crs=32617, tiled=True,
                        tile_size=128, compress="deflate")
    return path, arr


def test_metadata_and_full_read(big_tile):
    path, arr = big_tile
    with native.NativeRaster(path) as src:
        assert (src.width, src.height, src.count) == (500, 400, 28)
        assert src.crs == 32617
        assert src.dtype == np.int16
        np.testing.assert_array_equal(src.read(), arr)


def test_windowed_and_boundless_reads_match_numpy(big_tile):
    path, arr = big_tile
    # oracle: the pure-numpy codec (backend="py" bypasses the native path)
    with native.NativeRaster(path) as nsrc, raster.Raster(path, backend="py") as psrc:
        for win in [affine.Window(100, 50, 30, 40), affine.Window(-5, -5, 20, 20),
                    affine.Window(480, 380, 40, 40)]:
            np.testing.assert_array_equal(
                nsrc.read(window=win, boundless=True),
                psrc.read(window=win, boundless=True),
            )
            np.testing.assert_array_equal(
                nsrc.read(window=win), psrc.read(window=win)
            )


def test_patches_match_python_chain(big_tile):
    path, arr = big_tile
    anchors = [(10, 10), (200, 300), (395, 495)]  # includes edge overhang
    with native.NativeRaster(path) as src:
        patches = src.read_patches(anchors, win=11, clip=10, size=11)
    assert patches.shape == (3, 11, 11, 8)
    for i, (r, c) in enumerate(anchors):
        win = np.zeros((28, 11, 11), np.int16)
        rr = min(11, 400 - r)
        cc = min(11, 500 - c)
        win[:, :rr, :cc] = arr[:, r : r + 11, c : c + 11]
        expected = preprocess_image_np(
            np.moveaxis(win, 0, -1).astype(np.float32), image_size=11
        )
        np.testing.assert_allclose(patches[i], expected, atol=1e-5)


def test_patch_throughput(big_tile):
    path, _ = big_tile
    rng = np.random.RandomState(1)
    anchors = np.stack(
        [rng.randint(0, 390, 2000), rng.randint(0, 490, 2000)], axis=1
    )
    with native.NativeRaster(path) as src:
        src.read_patches(anchors[:10])  # warm
        t0 = time.perf_counter()
        out = src.read_patches(anchors)
        dt = time.perf_counter() - t0
    assert out.shape[0] == 2000
    rate = 2000 / dt
    # loose sanity bound; typical rates are orders of magnitude higher
    assert rate > 2000, "native patch rate {:.0f}/s too slow".format(rate)


def test_native_deflate_segments_roundtrip():
    """Parallel C++ deflate: byte-identical container to zlib.compress and
    inverse of zlib.decompress; writer falls back cleanly when absent."""
    import zlib

    from deeptreeattention_tpu.geo import native

    if not native.available():
        pytest.skip("native library not built")
    rng = np.random.RandomState(0)
    segs = [rng.bytes(65536), rng.bytes(100), b"", rng.bytes(300000)]
    out = native.deflate_segments(segs, level=6, workers=2)
    if out is None:
        pytest.skip("native writer API unavailable (stale .so)")
    assert [zlib.decompress(c) for c in out] == segs
    assert out == [zlib.compress(s, 6) for s in segs]


def test_write_tiff_deflate_native_matches_python(tmp_path):
    """write_tiff(compress='deflate') through the native compressor reads
    back bit-identical to the DTA_PY_TIFF pure-python path."""
    import os

    from deeptreeattention_tpu.geo import raster
    from deeptreeattention_tpu.geo.affine import from_origin

    arr = (np.random.RandomState(1).rand(5, 300, 280) * 30000).astype(np.int16)
    t = from_origin(700000, 4700000, 1, 1)
    p_native = str(tmp_path / "n.tif")
    p_python = str(tmp_path / "p.tif")
    prior = os.environ.pop("DTA_PY_TIFF", None)  # a preset value would make
    # both writes take the python path (vacuous parity) and then be clobbered
    try:
        raster.write_raster(p_native, arr, transform=t, crs=32617, compress="deflate", tiled=True)
        os.environ["DTA_PY_TIFF"] = "1"
        raster.write_raster(p_python, arr, transform=t, crs=32617, compress="deflate", tiled=True)
    finally:
        os.environ.pop("DTA_PY_TIFF", None)
        if prior is not None:
            os.environ["DTA_PY_TIFF"] = prior
    with open(p_native, "rb") as a, open(p_python, "rb") as b:
        assert a.read() == b.read()
    with raster.open_raster(p_native) as src:
        np.testing.assert_array_equal(src.read(), arr)


def test_native_refuses_int64_numpy_fallback_reads(tmp_path):
    """64-bit integer TIFFs: the native decoder fails open (it cannot decode
    them) and the Raster wrapper falls back to the numpy codec, which can."""
    import numpy as np

    from deeptreeattention_tpu.geo import native, raster

    p = str(tmp_path / "i64.tif")
    data = np.arange(64, dtype=np.int64).reshape(1, 8, 8) * 10**15
    raster.write_raster(p, data)
    if native.available():
        import pytest

        with pytest.raises(ValueError):
            native.NativeRaster(p)
    with raster.open_raster(p) as src:
        np.testing.assert_array_equal(src.read(), data)


def test_native_res_parity_ungeoreferenced(tmp_path):
    """Both backends report positive unit resolution for files without
    georeferencing tags."""
    import numpy as np

    from deeptreeattention_tpu.geo import native, raster
    from deeptreeattention_tpu.geo.tiff import TiffReader

    p = str(tmp_path / "nogeo.tif")
    raster.write_raster(p, np.ones((1, 4, 4), np.uint8))
    assert TiffReader(p).res == (1.0, 1.0)
    if native.available():
        assert native.NativeRaster(p).res == (1.0, 1.0)


def test_native_corrupt_counts_no_crash(tmp_path):
    """A TIFF whose strip-counts tag is stripped must not SIGFPE/abort the
    process: the native open refuses and the numpy codec raises."""
    import struct

    import numpy as np

    from deeptreeattention_tpu.geo import raster

    p = str(tmp_path / "c.tif")
    raster.write_raster(p, np.ones((1, 8, 8), np.uint8))
    raw = bytearray(open(p, "rb").read())
    # rewrite the StripByteCounts tag id (279) to a bogus id, "removing" it
    ifd_off = struct.unpack("<I", raw[4:8])[0]
    (n,) = struct.unpack("<H", raw[ifd_off:ifd_off + 2])
    for i in range(n):
        e = ifd_off + 2 + i * 12
        tag = struct.unpack("<H", raw[e:e + 2])[0]
        if tag == 279:
            raw[e:e + 2] = struct.pack("<H", 65000)
    open(p, "wb").write(bytes(raw))
    import pytest

    with pytest.raises(Exception):
        with raster.open_raster(p) as src:
            src.read()
