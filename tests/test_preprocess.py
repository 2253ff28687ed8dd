"""Parity tests for the jit preprocessing chain vs sklearn/torch semantics.

The reference preprocesses with sklearn.preprocessing.minmax_scale and
torchvision NEAREST resize (reference src/utils.py:36-79); we assert our
fused jnp/numpy implementations match those libraries directly.
"""
import numpy as np
import pytest

from deeptreeattention_tpu.ops import preprocess


def _rand_chw(c=369, h=9, w=13, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 10000, size=(c, h, w)).astype(np.float32)


def test_minmax_matches_sklearn():
    from sklearn import preprocessing as skp

    img = _rand_chw(c=24)
    # reference semantics: reshape (C, H*W).T -> rows are pixels
    data = img.reshape(img.shape[0], -1).T
    expected = skp.minmax_scale(data, axis=1).T.reshape(img.shape)

    ours = preprocess.minmax_scale_pixels(np.moveaxis(img, 0, -1))
    np.testing.assert_allclose(np.moveaxis(np.asarray(ours), -1, 0), expected, atol=1e-6)


def test_minmax_constant_pixel_is_zero():
    img = np.full((4, 4, 5), 7.0, np.float32)
    out = np.asarray(preprocess.minmax_scale_pixels(img))
    assert np.all(out == 0)


def test_band_clip():
    img = np.zeros((5, 5, 369), np.float32)
    assert preprocess.clip_bands(img).shape == (5, 5, 349)
    rgb = np.zeros((5, 5, 3), np.float32)
    assert preprocess.clip_bands(rgb).shape == (5, 5, 3)


@pytest.mark.parametrize("h,w", [(9, 13), (11, 11), (30, 7), (2, 2)])
def test_nearest_resize_matches_torch(h, w):
    import torch
    import torch.nn.functional as F

    img = _rand_chw(c=6, h=h, w=w)
    expected = F.interpolate(torch.from_numpy(img)[None], size=(11, 11), mode="nearest")[0].numpy()
    ours = preprocess.nearest_resize(np.moveaxis(img, 0, -1), 11)
    np.testing.assert_allclose(np.moveaxis(np.asarray(ours), -1, 0), expected)


def test_train_augmentation_flips_both_axes():
    img = np.arange(2 * 3 * 1, dtype=np.float32).reshape(2, 3, 1)
    out = np.asarray(preprocess.train_augmentation(img))
    np.testing.assert_array_equal(out, img[::-1, ::-1, :])


def test_numpy_and_jax_paths_agree():
    img = np.moveaxis(_rand_chw(), 0, -1)
    a = np.asarray(preprocess.preprocess_image(img, image_size=11, augment=True))
    b = preprocess.preprocess_image_np(img, image_size=11, augment=True)
    np.testing.assert_allclose(a, b, atol=1e-6)
    assert a.shape == (11, 11, 349)


def test_full_chain_shape_and_range():
    img = np.moveaxis(_rand_chw(c=369, h=14, w=6), 0, -1)
    out = np.asarray(preprocess.preprocess_image(img, image_size=11))
    assert out.shape == (11, 11, 349)
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_augment_batch_extended():
    """Extended device augmentation: shapes preserved, stochastic flips,
    spectral jitter per band, cutout zeros a patch."""
    import jax

    from deeptreeattention_tpu.ops.preprocess import augment_batch, make_augmenter

    rng = np.random.RandomState(0)
    import jax.numpy as jnp

    x = jnp.asarray(rng.rand(6, 3, 11, 11, 8), jnp.float32)  # year-stacked
    key = jax.random.PRNGKey(0)
    out = augment_batch(x, key, flip_p=0.5, spectral_jitter=0.05,
                        brightness=0.1, cutout=3)
    assert out.shape == x.shape
    assert bool((np.asarray(out) != np.asarray(x)).any())
    # cutout only: exactly one 3x3 spatial hole per sample, all years
    hole = np.asarray(augment_batch(x, key, flip_p=0.0, cutout=3))
    zeros_per_sample = (hole == 0).all(axis=(1, 4)).sum(axis=(1, 2))
    assert (zeros_per_sample >= 9).all()
    # no-op config -> None augmenter
    assert make_augmenter(None) is None
    assert make_augmenter({"flip_p": 0.0}) is None
    fn = make_augmenter({"spectral_jitter": 0.05})
    assert fn is not None
    out2 = fn(x, key)
    assert out2.shape == x.shape


def test_multistage_trains_with_augmentations(dm, config):
    from deeptreeattention_tpu.models.multi_stage import MultiStage

    cfg = dict(config)
    cfg["augmentations"] = {"flip_p": 0.5, "spectral_jitter": 0.02, "cutout": 2}
    m = MultiStage(train_df=dm.train, test_df=dm.test, crowns=dm.crowns, config=cfg)
    history = m.fit(epochs=1, fast_dev_run=True)
    assert all(np.isfinite(history[0]["train_loss"]))


def test_minmax_int16_wide_range_no_overflow():
    """A pixel spanning more than 32767 counts (e.g. -32000 nodata next to
    +10000 reflectance) must not wrap in the integer domain."""
    import jax.numpy as jnp

    from deeptreeattention_tpu.ops.preprocess import minmax_scale_pixels

    px = np.zeros((1, 1, 4), np.int16)
    px[0, 0] = [-32000, 10000, 0, 5000]
    out = np.asarray(minmax_scale_pixels(jnp.asarray(px)))
    expected = (px[0, 0].astype(np.float64) + 32000) / 42000.0
    np.testing.assert_allclose(out[0, 0], expected, atol=1e-6)
    assert out.min() >= 0.0 and out.max() <= 1.0
