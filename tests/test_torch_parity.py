"""Numerical parity: imported torch weights -> identical scores (<=1e-3).

BASELINE.md requires per-crown class scores to match the PyTorch reference
within 1e-3. Two oracles:

1. The reference's OWN torch modules (/root/reference/src/models/Hang2020.py,
   year.py), imported and executed directly in eval mode — the authoritative
   check (test_reference_* below; skipped when the checkout is absent).
2. A hand-written torch.nn.functional re-derivation of the same math with a
   synthesized state_dict — keeps parity pinned in reference-less CI.
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


# ---------------------------------------------------------------------------
# Reference-oracle parity: the oracle below is the reference's OWN torch
# code (/root/reference/src/models/Hang2020.py, /root/reference/src/models/year.py),
# imported and executed directly — not a re-implementation. The hand-written
# oracle above stays for reference-less CI.
# ---------------------------------------------------------------------------
import os

REF_MODELS = "/root/reference/src/models"


@pytest.fixture(scope="module")
def ref_hang():
    if not os.path.exists(os.path.join(REF_MODELS, "Hang2020.py")):
        pytest.skip("reference checkout not available")
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_hang2020", os.path.join(REF_MODELS, "Hang2020.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_year(ref_hang):
    """Load reference year.py with its `src.models` / torchmetrics imports
    satisfied (torchmetrics is absent here and unused by learned_ensemble)."""
    import importlib.util
    import sys as _sys
    import types

    if "torchmetrics" not in _sys.modules:
        _sys.modules["torchmetrics"] = types.ModuleType("torchmetrics")
    pkg_src = types.ModuleType("src")
    pkg_models = types.ModuleType("src.models")
    pkg_models.Hang2020 = ref_hang
    pkg_src.models = pkg_models
    _sys.modules.setdefault("src", pkg_src)
    _sys.modules["src.models"] = pkg_models
    spec = importlib.util.spec_from_file_location(
        "ref_year", os.path.join(REF_MODELS, "year.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("bands", [369, 3])
def test_reference_spectral_oracle(ref_hang, bands):
    """flax SpectralNetwork == the reference's spectral_network module itself
    (random torch init, eval mode), all three stage scores, <=1e-3."""
    torch.manual_seed(0)
    ref = ref_hang.spectral_network(bands=bands, classes=CLASSES).eval()
    x = torch.tensor(
        np.random.RandomState(3).rand(2, bands, 11, 11).astype(np.float32))
    with torch.no_grad():
        expected = [s.numpy() for s in ref(x)]

    state = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = torch_import.import_spectral_only(state)
    model = SpectralNetwork(bands=bands, classes=CLASSES)
    ours = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(np.moveaxis(x.numpy(), 1, -1)), train=False,
    )
    for e, o in zip(expected, ours):
        np.testing.assert_allclose(np.asarray(o), e, atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("bands", [369, 3])
def test_reference_hang2020_oracle(ref_hang, bands):
    """flax Hang2020 AND the fused eval path == the reference Hang2020
    module's joint score (sigmoid-alpha weighted spectral/spatial mix)."""
    from deeptreeattention_tpu.models import fused

    torch.manual_seed(1)
    ref = ref_hang.Hang2020(bands=bands, classes=CLASSES).eval()
    x = torch.tensor(
        np.random.RandomState(4).rand(2, bands, 11, 11).astype(np.float32))
    with torch.no_grad():
        expected = ref(x).numpy().astype(np.float32)

    state = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = torch_import.import_hang2020(state)
    model = Hang2020(bands=bands, classes=CLASSES)
    xin = jnp.asarray(np.moveaxis(x.numpy(), 1, -1))
    ours = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        xin, train=False,
    )
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-3, rtol=1e-3)

    fused_out = fused.hang2020_eval(variables, xin, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(fused_out), expected, atol=1e-3, rtol=1e-3)


def test_reference_learned_ensemble_oracle(ref_year):
    """flax LearnedEnsemble (vmapped year stack, batch mask) == the reference
    learned_ensemble module (python loop skipping all-zero years)."""
    from deeptreeattention_tpu.models.year import LearnedEnsemble

    YEARS = 3
    torch.manual_seed(2)
    ref = ref_year.learned_ensemble(
        years=YEARS, classes=CLASSES,
        config={"pretrain_state_dict": None, "bands": BANDS}).eval()

    rng = np.random.RandomState(5)
    imgs = rng.rand(YEARS, 2, BANDS, 11, 11).astype(np.float32)
    imgs[1] = 0.0  # a missing year: the reference loop skips it
    with torch.no_grad():
        expected = ref(torch.tensor(imgs)).numpy()

    state = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = torch_import.import_learned_ensemble(state, years=YEARS)
    model = LearnedEnsemble(years=YEARS, classes=CLASSES, bands=BANDS,
                            mask_mode="batch")
    # ours takes [B, Y, H, W, C]
    xin = jnp.asarray(np.moveaxis(imgs, 2, -1).transpose(1, 0, 2, 3, 4))
    ours = model.apply(variables, xin, train=False)
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-3, rtol=1e-3)
