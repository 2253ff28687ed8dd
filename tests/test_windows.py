"""On-device tile window extraction tests: parity with host cropping and the
fused tile-predictor program."""
import jax
import jax.numpy as jnp
import numpy as np

from deeptreeattention_tpu.geo.affine import from_origin
from deeptreeattention_tpu.models.hang2020 import SpectralNetwork
from deeptreeattention_tpu.ops import windows as W
from deeptreeattention_tpu.ops.preprocess import preprocess_image_np


def test_extract_windows_matches_host():
    rng = np.random.RandomState(0)
    tile = rng.rand(50, 60, 5).astype(np.float32)
    anchors = np.array([[0, 0], [10, 20], [39, 49]], np.int32)
    got = np.asarray(W.extract_windows(jnp.asarray(tile), anchors, size=11))
    for i, (r, c) in enumerate(anchors):
        np.testing.assert_array_equal(got[i], tile[r : r + 11, c : c + 11])


def test_extract_windows_clamps_edges():
    tile = jnp.asarray(np.arange(20 * 20 * 2, dtype=np.float32).reshape(20, 20, 2))
    got = W.extract_windows(tile, np.array([[15, 15]], np.int32), size=11)
    # clamped to start at 9,9
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(tile[9:20, 9:20]))


def test_preprocess_windows_matches_numpy_chain():
    rng = np.random.RandomState(1)
    win = rng.randint(0, 10000, size=(4, 11, 11, 28)).astype(np.float32)
    got = np.asarray(W.preprocess_windows(jnp.asarray(win), clip=10))
    expected = np.stack([preprocess_image_np(w) for w in win])
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_crown_pixel_anchors_and_budget():
    t = from_origin(100.0, 200.0, 1.0, 1.0)
    bounds = [(102.0, 195.0, 105.0, 198.0)]  # 3x3 pixels
    anchors, ids, mask = W.crown_pixel_anchors(bounds, t, budget=16)
    assert anchors.shape == (16, 2)
    assert mask.sum() == 9
    assert set(ids[mask.astype(bool)]) == {0}


def test_aggregate_crown_scores():
    probs = jnp.asarray([[1.0, 0.0], [0.0, 1.0], [0.5, 0.5], [9.0, 9.0]])
    ids = jnp.asarray([0, 0, 1, -1])
    mask = jnp.asarray([True, True, True, False])
    out = np.asarray(W.aggregate_crown_scores(probs, ids, 2, mask=mask))
    np.testing.assert_allclose(out[0], [0.5, 0.5])
    np.testing.assert_allclose(out[1], [0.5, 0.5])


def test_fused_tile_predictor():
    bands_raw, bands, classes = 28, 8, 3
    rng = np.random.RandomState(2)
    tile = jnp.asarray(rng.randint(0, 10000, (64, 64, bands_raw)), jnp.float32)
    model = SpectralNetwork(bands=bands, classes=classes)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 11, 11, bands)))

    t = from_origin(0.0, 64.0, 1.0, 1.0)
    bounds = [(5.0, 50.0, 9.0, 55.0), (30.0, 20.0, 34.0, 25.0)]
    anchors, ids, mask = W.crown_pixel_anchors(bounds, t, budget=64)

    apply_fn = lambda v, x: model.apply(v, x, train=False)
    predictor = W.make_tile_predictor(apply_fn)
    out = np.asarray(predictor(variables, tile, anchors, ids, mask, 2))
    assert out.shape == (2, classes)
    np.testing.assert_allclose(out.sum(axis=1), [1.0, 1.0], atol=1e-5)


def test_int16_tile_parity_with_float32():
    """Tiles stream to device in their file dtype (int16 for NEON); windows,
    min-max, and crown resize give bit-identical results to a float32 tile."""
    rng = np.random.RandomState(7)
    tile_i = rng.randint(-2000, 12000, (40, 40, 28)).astype(np.int16)
    tile_f = tile_i.astype(np.float32)

    anchors = np.array([[0, 0], [13, 21], [29, 29]], np.int32)
    wi = W.preprocess_windows(W.extract_windows(jnp.asarray(tile_i), anchors))
    wf = W.preprocess_windows(W.extract_windows(jnp.asarray(tile_f), anchors))
    assert wi.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(wi), np.asarray(wf))

    rect = np.array([[2, 3, 9, 7], [20, 25, 14, 14]], np.int32)
    ci = W.crown_resize_windows(jnp.asarray(tile_i), rect)
    cf = W.crown_resize_windows(jnp.asarray(tile_f), rect)
    assert ci.dtype == jnp.int16
    np.testing.assert_array_equal(np.asarray(ci).astype(np.float32), np.asarray(cf))


def test_crown_resize_windows_mm_exact_parity():
    """Selection-matmul window path == gather path, bit-exact, including
    negative/overhanging boundless rects (the dead-scoring hot fix,
    scripts/bench_dead_probe.py)."""
    import jax.numpy as jnp
    import numpy as np

    from deeptreeattention_tpu.ops.windows import (
        crown_resize_windows,
        crown_resize_windows_mm,
    )

    rng = np.random.RandomState(3)
    tile = jnp.asarray(rng.randint(0, 255, (150, 170, 3)), jnp.uint8)
    rect = np.array(
        [
            [10, 20, 50, 60],
            [-20, -10, 40, 33],    # overhangs top/left -> zero fill
            [120, 140, 60, 60],    # overhangs bottom/right -> zero fill
            [0, 0, 1, 1],
            [40, 50, 128, 128],    # crown == slab
            [149, 169, 4, 4],      # bottom-right corner
        ],
        np.int32,
    )
    for size in (224, 96):
        ref = np.asarray(
            crown_resize_windows(tile, rect, size=size, boundless=True)
        ).astype(np.float32)
        mm = np.asarray(crown_resize_windows_mm(tile, rect, size=size, slab=128))
        np.testing.assert_array_equal(ref, mm)
