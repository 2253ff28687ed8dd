"""Hang et al. 2020 attention-aided CNN family in flax (channels-last, TPU).

Capability parity with reference src/models/Hang2020.py (conv_module,
vanilla_CNN, Classifier, spatial/spectral attention, spatial/spectral
networks, Hang2020 fusion, backbone transfer) with TPU-first choices:

  * NHWC layout, bfloat16-friendly compute, params in float32.
  * The reference's "spectral attention" Conv1d runs over a length-1 axis
    (the [B, F, 1] global pool, reference src/models/Hang2020.py:7-12,149-162),
    which is mathematically a Dense layer using only the middle conv tap; we
    implement exactly that gating MLP, so scores match while XLA sees two
    fused matmuls instead of degenerate convolutions.
  * BatchNorm: momentum 0.9 (= torch 0.1), eps 1e-5, matching torch defaults.

All modules return logits; softmax lives in the training/predict harness.
"""
import flax.linen as nn
import jax.numpy as jnp

# per-stage attention conv kernel sizes in the reference (degenerate for the
# spectral branch, real 2D kernels for the spatial branch)
SPATIAL_KERNELS = {32: 7, 64: 5, 128: 3}
SPATIAL_POOLS = {32: 4, 64: 2, 128: 1}
STAGE_FILTERS = (32, 64, 128)


def global_spectral_pool(x):
    """Mean over the spatial dims of [B, H, W, F] -> [B, F]."""
    return jnp.mean(x, axis=(1, 2))


class ConvModule(nn.Module):
    """3x3 same-conv + BatchNorm + ReLU with optional max pooling."""

    filters: int
    maxpool_kernel: int | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pool=False, train=False):
        x = nn.Conv(self.filters, (3, 3), padding="SAME", dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name="bn",
        )(x)
        x = nn.relu(x)
        if pool and self.maxpool_kernel:
            k = self.maxpool_kernel
            x = nn.max_pool(x, (k, k), strides=(k, k))
        return x


class Classifier(nn.Module):
    """Separable classification head (eases backbone pre-training)."""

    classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features):
        return nn.Dense(self.classes, dtype=self.dtype, name="fc1")(features)


class SpectralAttention(nn.Module):
    """Channel gating from globally pooled features.

    sigmoid(W2·relu(W1·pool(x))) gates each channel; returns the gated map and
    the pooled gated features for the stage classifier.
    """

    filters: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pooled = global_spectral_pool(x).astype(self.dtype)
        a = nn.Dense(self.filters, dtype=self.dtype, name="attention_fc1")(pooled)
        a = nn.relu(a)
        a = nn.Dense(self.filters, dtype=self.dtype, name="attention_fc2")(a)
        a = nn.sigmoid(a)
        gated = x * a[:, None, None, :]
        pooled_attention = global_spectral_pool(gated)
        return gated, pooled_attention


class SpatialAttention(nn.Module):
    """Spatial gating: 1x1 channel pool -> two kxk convs -> sigmoid mask."""

    filters: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = SPATIAL_KERNELS[self.filters]
        p = SPATIAL_POOLS[self.filters]
        pooled = nn.Conv(1, (1, 1), dtype=self.dtype, name="channel_pool")(x)
        pooled = nn.relu(pooled)
        a = nn.Conv(1, (k, k), padding="SAME", dtype=self.dtype, name="attention_conv1")(pooled)
        a = nn.relu(a)
        a = nn.Conv(1, (k, k), padding="SAME", dtype=self.dtype, name="attention_conv2")(a)
        a = nn.sigmoid(a)
        gated = x * a  # broadcast over channels
        cls = nn.max_pool(gated, (p, p), strides=(p, p)) if p > 1 else gated
        cls = cls.reshape(cls.shape[0], -1)
        return gated, cls


class SpectralNetwork(nn.Module):
    """Three conv+spectral-attention stages, one classifier per stage."""

    bands: int
    classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = x.astype(self.dtype)
        scores = []
        for i, filters in enumerate(STAGE_FILTERS):
            x = ConvModule(
                filters, maxpool_kernel=None if i == 0 else 2, dtype=self.dtype,
                name="conv{}".format(i + 1),
            )(x, pool=i > 0, train=train)
            x, pooled = SpectralAttention(
                filters, dtype=self.dtype, name="attention_{}".format(i + 1)
            )(x)
            scores.append(
                Classifier(self.classes, dtype=self.dtype, name="classifier{}".format(i + 1))(
                    pooled
                ).astype(jnp.float32)
            )
        return scores


class SpatialNetwork(nn.Module):
    """Three conv+spatial-attention stages, one classifier per stage."""

    bands: int
    classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = x.astype(self.dtype)
        scores = []
        for i, filters in enumerate(STAGE_FILTERS):
            x = ConvModule(
                filters, maxpool_kernel=None if i == 0 else 2, dtype=self.dtype,
                name="conv{}".format(i + 1),
            )(x, pool=i > 0, train=train)
            x, pooled = SpatialAttention(
                filters, dtype=self.dtype, name="attention_{}".format(i + 1)
            )(x)
            scores.append(
                Classifier(self.classes, dtype=self.dtype, name="classifier{}".format(i + 1))(
                    pooled
                ).astype(jnp.float32)
            )
        return scores


class Hang2020(nn.Module):
    """Joint model: learnable sigmoid(alpha)-weighted spectral/spatial fusion."""

    bands: int
    classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        spectral = SpectralNetwork(self.bands, self.classes, self.dtype, name="spectral_network")(
            x, train=train
        )
        spatial = SpatialNetwork(self.bands, self.classes, self.dtype, name="spatial_network")(
            x, train=train
        )
        alpha = self.param("alpha", lambda key: jnp.asarray(0.5, jnp.float32))
        w = nn.sigmoid(alpha)
        return spectral[-1] * w + spatial[-1] * (1.0 - w)


class VanillaCNN(nn.Module):
    """Attention-free baseline: three conv blocks + linear head."""

    bands: int
    classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = x.astype(self.dtype)
        x = ConvModule(32, dtype=self.dtype, name="conv1")(x, train=train)
        x = ConvModule(64, maxpool_kernel=2, dtype=self.dtype, name="conv2")(x, pool=True, train=train)
        x = ConvModule(128, maxpool_kernel=2, dtype=self.dtype, name="conv3")(x, pool=True, train=train)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.classes, dtype=self.dtype, name="fc1")(x).astype(jnp.float32)


def load_from_backbone(backbone_variables, classes, bands, rng, image_size=11, dtype=jnp.float32):
    """Transfer non-classifier weights from a trained SpectralNetwork.

    Equivalent capability to reference src/models/Hang2020.py:266-278: build a
    fresh SpectralNetwork for `classes` and overwrite every collection entry
    except the per-stage classifiers with the backbone's weights.
    """
    model = SpectralNetwork(bands=bands, classes=classes, dtype=dtype)
    x = jnp.zeros((1, image_size, image_size, bands), jnp.float32)
    variables = model.init(rng, x, train=False)

    def merge(new, old):
        out = dict(new)
        for k, v in old.items():
            if "classifier" in str(k):
                continue
            if k in out and isinstance(v, dict) and isinstance(out[k], dict):
                out[k] = merge(out[k], v)
            elif k in out:
                out[k] = v
        return out

    merged = {}
    for col in variables:
        old_col = backbone_variables.get(col, {})
        merged[col] = merge(dict(variables[col]), dict(old_col))
    return model, merged
