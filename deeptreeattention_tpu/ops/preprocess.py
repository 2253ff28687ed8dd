"""Image preprocessing as one fused XLA graph.

Re-designs reference src/utils.py:36-79 (preprocess_image / load_image) and
src/augmentation.py:4-16 for TPU: the band-drop -> per-pixel min-max ->
NEAREST resize -> flip chain is pure jnp, jit/vmap-friendly, and runs fused on
device for the hot batched path. A numpy twin with identical semantics serves
host-side ETL on odd-shaped crops.

Numerical contract (parity-tested against sklearn/torch in
tests/test_preprocess.py):
  * band clip: channels>3 -> drop first 10 and last 10 bands (369 -> 349).
  * min-max: per *pixel* over the band axis, zero-range pixels -> 0
    (sklearn.preprocessing.minmax_scale on the (H*W, C) matrix, axis=1).
  * resize: NEAREST with src = floor(dst * in/out) (torch interpolate).
  * train augmentation: horizontal + vertical flip with p=1 (deterministic,
    as in the reference).

Layout: this framework is channels-last ([..., H, W, C]) end to end — the
TPU-native layout — while reference files on disk are band-first; loaders do
the transpose once at the boundary.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

BAND_CLIP = 10  # bands dropped from each end of the spectrum when C > 3


# ---------------------------------------------------------------------------
# jnp path (jit-compiled, device)
# ---------------------------------------------------------------------------

def clip_bands(image):
    """Drop the first/last BAND_CLIP bands of a channels-last image if C > 3."""
    if image.shape[-1] > 3:
        return image[..., BAND_CLIP:-BAND_CLIP]
    return image


def minmax_scale_pixels(image, eps=0.0, out_dtype=jnp.float32):
    """Per-pixel min-max over the band axis; constant pixels map to 0.

    image: [..., H, W, C] array. Matches
    sklearn.preprocessing.minmax_scale(X, axis=1) applied to the (pixels, C)
    matrix (reference src/utils.py:44-50): scale of a zero-range row is 1, so
    the row becomes x - min = 0.

    The min/max reductions run in the INPUT dtype — for integer input (NEON
    reflectance is int16 on disk) they are exact and the image is only
    widened to float32 inside the fused normalize, halving the HBM read
    traffic of the dominant input pass on TPU. `out_dtype=bfloat16` lets the
    normalized batch feed a bf16 model without an intermediate f32 buffer.
    """
    lo = jnp.min(image, axis=-1, keepdims=True)
    hi = jnp.max(image, axis=-1, keepdims=True)
    # subtract AFTER widening: an int16 pixel spanning e.g. -32000..+10000
    # would wrap if hi-lo were computed in the input dtype
    rng = hi.astype(jnp.float32) - lo.astype(jnp.float32)
    rng = jnp.where(rng == 0, 1.0, rng + eps)
    out = (image.astype(jnp.float32) - lo.astype(jnp.float32)) / rng
    return out.astype(out_dtype)


def nearest_resize(image, size):
    """NEAREST resize of [..., H, W, C] to (size, size).

    Uses torch's nearest convention: src_index = floor(dst * in / out), which
    for integer arithmetic is (dst * in) // out.
    """
    h, w = image.shape[-3], image.shape[-2]
    rows = (jnp.arange(size) * h) // size
    cols = (jnp.arange(size) * w) // size
    return image[..., rows[:, None], cols[None, :], :]


def train_augmentation(image):
    """Deterministic horizontal+vertical flip (both p=1, reference behavior)."""
    return image[..., ::-1, ::-1, :]


def random_flip(image, key):
    """Stochastic p=0.5 H/V flips — the conventional variant, opt-in."""
    kh, kv = jax.random.split(key)
    image = jax.lax.cond(
        jax.random.bernoulli(kh), lambda x: x[..., :, ::-1, :], lambda x: x, image
    )
    image = jax.lax.cond(
        jax.random.bernoulli(kv), lambda x: x[..., ::-1, :, :], lambda x: x, image
    )
    return image


def preprocess_image(image, image_size=None, augment=False, out_dtype=jnp.float32):
    """Full chain on one channels-last image (jit-friendly at fixed shape).

    Integer input (e.g. int16 NEON reflectance) stays integer through the
    band clip and min/max reductions and is widened only inside the fused
    normalize — no separate float conversion pass.
    """
    image = jnp.asarray(image)
    if not jnp.issubdtype(image.dtype, jnp.integer):
        image = image.astype(jnp.float32)
    image = clip_bands(image)
    image = minmax_scale_pixels(image, out_dtype=out_dtype)
    if image_size is not None:
        image = nearest_resize(image, image_size)
    if augment:
        image = train_augmentation(image)
    return image


@jax.jit
def _preprocess_batch_noresize(batch):
    return minmax_scale_pixels(batch)


def preprocess_batch(batch, image_size=None, augment=False, out_dtype=jnp.float32):
    """Batched fused preprocessing: [N, H, W, C] -> [N, S, S, C'] on device."""
    return preprocess_image(batch, image_size=image_size, augment=augment,
                            out_dtype=out_dtype)


# ---------------------------------------------------------------------------
# numpy twin (host ETL on variable-shaped crops; identical semantics)
# ---------------------------------------------------------------------------

def preprocess_image_np(image, image_size=None, augment=False):
    image = np.asarray(image, np.float32)
    if image.shape[-1] > 3:
        image = image[..., BAND_CLIP:-BAND_CLIP]
    lo = image.min(axis=-1, keepdims=True)
    hi = image.max(axis=-1, keepdims=True)
    rng = hi - lo
    rng[rng == 0] = 1.0
    image = (image - lo) / rng
    if image_size is not None:
        h, w = image.shape[-3], image.shape[-2]
        rows = (np.arange(image_size) * h) // image_size
        cols = (np.arange(image_size) * w) // image_size
        image = image[..., rows[:, None], cols[None, :], :]
    if augment:
        image = image[..., ::-1, ::-1, :]
    return image


def load_image(img_path, image_size, augment=False):
    """Load a .npy or .tif crop, preprocess, NEAREST-resize to image_size.

    Equivalent of reference src/utils.py:59-79, returning channels-last
    float32 [S, S, C]. Files store band-first arrays; transposed here once.
    """
    ext = os.path.splitext(img_path)[-1]
    if ext == ".npy":
        try:
            image = np.load(img_path)
        except Exception:
            raise ValueError("Cannot load {}".format(img_path))
    elif ext == ".tif":
        from deeptreeattention_tpu.geo import raster

        image = raster.open_raster(img_path).read()
    else:
        raise ValueError("image path must be .npy or .tif, found {}".format(img_path))

    if image.ndim != 3:
        raise ValueError("expected [C, H, W] array in {}".format(img_path))
    if image.shape[1] == 0 or image.shape[2] == 0:
        raise ValueError("empty crop in {}".format(img_path))
    image = np.ascontiguousarray(np.moveaxis(image, 0, -1))  # -> [H, W, C]
    # np.errstate, not warnings.catch_warnings: the latter mutates
    # process-global state and load_image runs concurrently under
    # Loader(workers>0); FP noise (nan crops) is the only class to silence
    # (range==0 is guarded explicitly in preprocess_image_np)
    with np.errstate(all="ignore"):
        return preprocess_image_np(image, image_size=image_size, augment=augment)


# ---------------------------------------------------------------------------
# extended train-time augmentation (device-side, batched, opt-in)
# ---------------------------------------------------------------------------

def augment_batch(images, key, flip_p=0.5, spectral_jitter=0.0, brightness=0.0,
                  cutout=0):
    """Stochastic batched augmentation on device (jit-friendly, static cfg).

    images: [B, ..., S, S, C] (year-stacked batches augment consistently
    across years). Reference augmentation is flips only
    (src/augmentation.py:4-16); spectral jitter (per-band multiplicative
    noise), brightness scaling, and cutout are the natural HSI extensions,
    opt-in via config["augmentations"].
    """
    images = jnp.asarray(images)
    b = images.shape[0]
    kh, kv, ks, kb, kr, kc = jax.random.split(key, 6)
    expand = (slice(None),) + (None,) * (images.ndim - 1)

    if flip_p:
        do_h = jax.random.bernoulli(kh, flip_p, (b,))[expand]
        do_v = jax.random.bernoulli(kv, flip_p, (b,))[expand]
        images = jnp.where(do_h, images[..., :, ::-1, :], images)
        images = jnp.where(do_v, images[..., ::-1, :, :], images)
    if spectral_jitter:
        factor = 1.0 + spectral_jitter * jax.random.normal(
            ks, (b,) + (1,) * (images.ndim - 2) + (images.shape[-1],)
        )
        images = images * jnp.maximum(factor, 0.0)
    if brightness:
        scale = 1.0 + brightness * jax.random.uniform(kb, (b,), minval=-1.0, maxval=1.0)
        images = images * scale[expand]
    if cutout:
        s_h, s_w = images.shape[-3], images.shape[-2]
        r0 = jax.random.randint(kr, (b,), 0, max(s_h - cutout, 1))
        c0 = jax.random.randint(kc, (b,), 0, max(s_w - cutout, 1))
        rows = jnp.arange(s_h)
        cols = jnp.arange(s_w)
        rmask = (rows[None] >= r0[:, None]) & (rows[None] < r0[:, None] + cutout)
        cmask = (cols[None] >= c0[:, None]) & (cols[None] < c0[:, None] + cutout)
        hole = rmask[:, :, None] & cmask[:, None, :]  # [B, S, S]
        hole = hole[(slice(None),) + (None,) * (images.ndim - 4) + (Ellipsis, None)]
        images = jnp.where(hole, 0.0, images)
    return images


def make_augmenter(cfg):
    """config["augmentations"] dict -> jit fn(images, key) (None if empty).

    Only what the config names is enabled: flips stay OFF unless flip_p is
    set (the dataset already applies the reference's deterministic flips;
    augment_batch's own 0.5 default is for direct callers)."""
    cfg = dict(cfg or {})
    if not any(cfg.values()):
        return None
    cfg.setdefault("flip_p", 0.0)
    import functools

    return jax.jit(functools.partial(augment_batch, **cfg))
