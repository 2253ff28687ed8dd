"""Numerical parity: imported torch weights -> identical scores (<=1e-3).

BASELINE.md requires per-crown class scores to match the PyTorch reference
within 1e-3. We synthesize a state_dict with the reference's key naming,
compute the reference forward math with torch.nn.functional primitives, and
compare against our flax SpectralNetwork/Hang2020 running the imported
weights in eval mode.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from deeptreeattention_tpu.models.hang2020 import Hang2020, SpectralNetwork
from deeptreeattention_tpu.train import torch_import

BANDS, CLASSES, B = 12, 5, 3
SPEC_KS = {1: 3, 2: 5, 3: 7}
SPAT_KS = {1: 7, 2: 5, 3: 3}
DIMS = {0: BANDS, 1: 32, 2: 64, 3: 128}
SPAT_POOL = {1: 4, 2: 2, 3: 1}


def _rand(rng, *shape):
    return torch.tensor(rng.randn(*shape).astype(np.float32) * 0.1)


def make_spectral_state(rng, prefix=""):
    state = {}
    for i in (1, 2, 3):
        cin, cout = DIMS[i - 1], DIMS[i]
        state[prefix + "conv{}.conv_layer.weight".format(i)] = _rand(rng, cout, cin, 3, 3)
        state[prefix + "conv{}.conv_layer.bias".format(i)] = _rand(rng, cout)
        state[prefix + "conv{}.bn1.weight".format(i)] = 1 + 0.1 * _rand(rng, cout)
        state[prefix + "conv{}.bn1.bias".format(i)] = _rand(rng, cout)
        state[prefix + "conv{}.bn1.running_mean".format(i)] = _rand(rng, cout)
        state[prefix + "conv{}.bn1.running_var".format(i)] = (1 + 0.1 * _rand(rng, cout)).abs()
        k = SPEC_KS[i]
        state[prefix + "attention_{}.attention_conv1.weight".format(i)] = _rand(rng, cout, cout, k)
        state[prefix + "attention_{}.attention_conv1.bias".format(i)] = _rand(rng, cout)
        state[prefix + "attention_{}.attention_conv2.weight".format(i)] = _rand(rng, cout, cout, k)
        state[prefix + "attention_{}.attention_conv2.bias".format(i)] = _rand(rng, cout)
        state[prefix + "classifier{}.fc1.weight".format(i)] = _rand(rng, CLASSES, cout)
        state[prefix + "classifier{}.fc1.bias".format(i)] = _rand(rng, CLASSES)
    return state


def make_spatial_state(rng, prefix=""):
    state = {}
    for i in (1, 2, 3):
        cin, cout = DIMS[i - 1], DIMS[i]
        state[prefix + "conv{}.conv_layer.weight".format(i)] = _rand(rng, cout, cin, 3, 3)
        state[prefix + "conv{}.conv_layer.bias".format(i)] = _rand(rng, cout)
        state[prefix + "conv{}.bn1.weight".format(i)] = 1 + 0.1 * _rand(rng, cout)
        state[prefix + "conv{}.bn1.bias".format(i)] = _rand(rng, cout)
        state[prefix + "conv{}.bn1.running_mean".format(i)] = _rand(rng, cout)
        state[prefix + "conv{}.bn1.running_var".format(i)] = (1 + 0.1 * _rand(rng, cout)).abs()
        k = SPAT_KS[i]
        state[prefix + "attention_{}.channel_pool.weight".format(i)] = _rand(rng, 1, cout, 1, 1)
        state[prefix + "attention_{}.channel_pool.bias".format(i)] = _rand(rng, 1)
        state[prefix + "attention_{}.attention_conv1.weight".format(i)] = _rand(rng, 1, 1, k, k)
        state[prefix + "attention_{}.attention_conv1.bias".format(i)] = _rand(rng, 1)
        state[prefix + "attention_{}.attention_conv2.weight".format(i)] = _rand(rng, 1, 1, k, k)
        state[prefix + "attention_{}.attention_conv2.bias".format(i)] = _rand(rng, 1)
        in_features = {1: 128, 2: 256, 3: 512}[i]
        state[prefix + "classifier{}.fc1.weight".format(i)] = _rand(rng, CLASSES, in_features)
        state[prefix + "classifier{}.fc1.bias".format(i)] = _rand(rng, CLASSES)
    return state


def torch_conv_stage(x, state, prefix, i, pool):
    w = state[prefix + "conv{}.conv_layer.weight".format(i)]
    b = state[prefix + "conv{}.conv_layer.bias".format(i)]
    x = F.conv2d(x, w, b, padding="same")
    x = F.batch_norm(
        x,
        state[prefix + "conv{}.bn1.running_mean".format(i)],
        state[prefix + "conv{}.bn1.running_var".format(i)],
        state[prefix + "conv{}.bn1.weight".format(i)],
        state[prefix + "conv{}.bn1.bias".format(i)],
        training=False, eps=1e-5,
    )
    x = F.relu(x)
    if pool:
        x = F.max_pool2d(x, 2)
    return x


def torch_spectral_forward(x, state, prefix=""):
    scores = []
    for i in (1, 2, 3):
        x = torch_conv_stage(x, state, prefix, i, pool=i > 1)
        pooled = x.mean(dim=(2, 3)).unsqueeze(-1)
        a = F.conv1d(pooled, state[prefix + "attention_{}.attention_conv1.weight".format(i)],
                     state[prefix + "attention_{}.attention_conv1.bias".format(i)], padding="same")
        a = F.relu(a)
        a = F.conv1d(a, state[prefix + "attention_{}.attention_conv2.weight".format(i)],
                     state[prefix + "attention_{}.attention_conv2.bias".format(i)], padding="same")
        a = torch.sigmoid(a).unsqueeze(-1)
        x = x * a
        feats = x.mean(dim=(2, 3))
        scores.append(
            F.linear(feats, state[prefix + "classifier{}.fc1.weight".format(i)],
                     state[prefix + "classifier{}.fc1.bias".format(i)])
        )
    return scores


def torch_spatial_forward(x, state, prefix=""):
    scores = []
    for i in (1, 2, 3):
        x = torch_conv_stage(x, state, prefix, i, pool=i > 1)
        pooled = F.relu(
            F.conv2d(x, state[prefix + "attention_{}.channel_pool.weight".format(i)],
                     state[prefix + "attention_{}.channel_pool.bias".format(i)])
        )
        a = F.relu(
            F.conv2d(pooled, state[prefix + "attention_{}.attention_conv1.weight".format(i)],
                     state[prefix + "attention_{}.attention_conv1.bias".format(i)], padding="same")
        )
        a = torch.sigmoid(
            F.conv2d(a, state[prefix + "attention_{}.attention_conv2.weight".format(i)],
                     state[prefix + "attention_{}.attention_conv2.bias".format(i)], padding="same")
        )
        x = x * a
        p = SPAT_POOL[i]
        feats = F.max_pool2d(x, p) if p > 1 else x
        feats = feats.flatten(start_dim=1)
        scores.append(
            F.linear(feats, state[prefix + "classifier{}.fc1.weight".format(i)],
                     state[prefix + "classifier{}.fc1.bias".format(i)])
        )
    return scores


@pytest.fixture(scope="module")
def x_np():
    return np.random.RandomState(7).rand(B, BANDS, 11, 11).astype(np.float32)


def test_spectral_parity(x_np):
    rng = np.random.RandomState(0)
    state = make_spectral_state(rng)
    expected = [s.numpy() for s in torch_spectral_forward(torch.tensor(x_np), state)]

    variables = torch_import.import_spectral_only(
        {k: v.numpy() for k, v in state.items()}
    )
    model = SpectralNetwork(bands=BANDS, classes=CLASSES)
    ours = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(np.moveaxis(x_np, 1, -1)), train=False,
    )
    for e, o in zip(expected, ours):
        np.testing.assert_allclose(np.asarray(o), e, atol=1e-3, rtol=1e-3)


def test_hang2020_parity(x_np):
    rng = np.random.RandomState(1)
    state = {}
    state.update(make_spectral_state(rng, prefix="spectral_network."))
    state.update(make_spatial_state(rng, prefix="spatial_network."))
    state["alpha"] = torch.tensor(0.37)

    spectral = torch_spectral_forward(torch.tensor(x_np), state, prefix="spectral_network.")
    spatial = torch_spatial_forward(torch.tensor(x_np), state, prefix="spatial_network.")
    w = torch.sigmoid(state["alpha"])
    expected = (spectral[-1] * w + spatial[-1] * (1 - w)).numpy()

    variables = torch_import.import_hang2020({k: v.numpy() for k, v in state.items()})
    model = Hang2020(bands=BANDS, classes=CLASSES)
    ours = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(np.moveaxis(x_np, 1, -1)), train=False,
    )
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-3, rtol=1e-3)


def test_metadata_fusion_parity(x_np):
    """metadata_sensor_fusion import: reference src/models/metadata.py:26-44
    (site embedding + eval-mode BN + MLP, Hang2020 sensor branch, concat fc1)."""
    from deeptreeattention_tpu.models.metadata import MetadataSensorFusion

    SITES = 4
    rng = np.random.RandomState(2)
    state = {}
    state.update(make_spectral_state(rng, prefix="sensor_model.spectral_network."))
    state.update(make_spatial_state(rng, prefix="sensor_model.spatial_network."))
    state["sensor_model.alpha"] = torch.tensor(0.21)
    state["metadata_model.embedding.weight"] = _rand(rng, SITES, 16)
    state["metadata_model.batch_norm.weight"] = 1 + 0.1 * _rand(rng, 16)
    state["metadata_model.batch_norm.bias"] = _rand(rng, 16)
    state["metadata_model.batch_norm.running_mean"] = _rand(rng, 16)
    state["metadata_model.batch_norm.running_var"] = (1 + 0.1 * _rand(rng, 16)).abs()
    state["metadata_model.mlp.weight"] = _rand(rng, CLASSES, 16)
    state["metadata_model.mlp.bias"] = _rand(rng, CLASSES)
    state["fc1.weight"] = _rand(rng, CLASSES, 2 * CLASSES)
    state["fc1.bias"] = _rand(rng, CLASSES)

    sites = torch.tensor([0, 2, 3])
    emb = F.embedding(sites, state["metadata_model.embedding.weight"])
    meta = F.batch_norm(
        emb,
        state["metadata_model.batch_norm.running_mean"],
        state["metadata_model.batch_norm.running_var"],
        state["metadata_model.batch_norm.weight"],
        state["metadata_model.batch_norm.bias"],
        training=False, eps=1e-5,
    )
    meta = F.relu(F.linear(meta, state["metadata_model.mlp.weight"],
                           state["metadata_model.mlp.bias"]))
    spectral = torch_spectral_forward(
        torch.tensor(x_np), state, prefix="sensor_model.spectral_network.")
    spatial = torch_spatial_forward(
        torch.tensor(x_np), state, prefix="sensor_model.spatial_network.")
    w = torch.sigmoid(state["sensor_model.alpha"])
    sensor = spectral[-1] * w + spatial[-1] * (1 - w)
    joint = torch.cat([meta, sensor], dim=1)
    expected = F.relu(F.linear(joint, state["fc1.weight"], state["fc1.bias"])).numpy()

    variables = torch_import.import_metadata_fusion(
        {k: v.numpy() for k, v in state.items()}
    )
    model = MetadataSensorFusion(bands=BANDS, sites=SITES, classes=CLASSES)
    ours = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(np.moveaxis(x_np, 1, -1)),
        jnp.asarray(sites.numpy()),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-3, rtol=1e-3)
