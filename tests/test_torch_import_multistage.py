"""Importing reference learned_ensemble / MultiStage Lightning checkpoints.

The reference saves one learned_ensemble (per-year spectral_networks,
src/models/year.py:13-22) per taxonomy level inside an nn.ModuleList
(src/models/multi_stage.py:41,62-66), plus per-level `loss_weight_{L}`
buffers. These tests synthesize state dicts with exactly that key naming,
compute the reference forward with torch.nn.functional primitives (including
the `x.sum()==0` missing-year skip), and require our imported year-stacked
LearnedEnsemble to match <=1e-3.
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from deeptreeattention_tpu.models.year import LearnedEnsemble
from deeptreeattention_tpu.train import torch_import
from tests.test_torch_parity import (
    BANDS,
    CLASSES,
    make_spectral_state,
    torch_spectral_forward,
)

YEARS, B = 3, 4


def make_ensemble_state(rng, years, prefix=""):
    state = {}
    for y in range(years):
        state.update(
            make_spectral_state(rng, prefix="{}year_models.{}.".format(prefix, y))
        )
    return state


def torch_ensemble_forward(images, state, prefix=""):
    """Reference src/models/year.py:24-33: skip all-zero years, mean of the
    remaining final-stage scores."""
    year_scores = []
    for y, x in enumerate(images):
        if x.sum() == 0:
            continue
        scores = torch_spectral_forward(
            x, state, prefix="{}year_models.{}.".format(prefix, y)
        )
        year_scores.append(scores[-1])
    return torch.stack(year_scores, axis=1).mean(axis=1)


@pytest.fixture(scope="module")
def year_images():
    rng = np.random.RandomState(3)
    imgs = rng.rand(B, YEARS, 11, 11, BANDS).astype(np.float32)
    imgs[:, 1] = 0.0  # missing year -> zero-filled, must be skipped
    return imgs


def test_learned_ensemble_parity(year_images):
    rng = np.random.RandomState(11)
    state = make_ensemble_state(rng, YEARS)

    per_year = [
        torch.tensor(np.moveaxis(year_images[:, y], -1, 1)) for y in range(YEARS)
    ]
    expected = torch_ensemble_forward(per_year, state).numpy()

    variables = torch_import.import_learned_ensemble(
        {k: v.numpy() for k, v in state.items()}
    )
    model = LearnedEnsemble(years=YEARS, classes=CLASSES, bands=BANDS)
    ours = model.apply(
        {
            "params": variables["params"],
            "batch_stats": variables["batch_stats"],
        },
        jnp.asarray(year_images),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-3, rtol=1e-3)


def test_import_multi_stage_structure():
    rng = np.random.RandomState(5)
    state = {}
    for lvl in range(2):
        state.update(make_ensemble_state(rng, YEARS, prefix="models.{}.".format(lvl)))
        state["loss_weight_{}".format(lvl)] = torch.tensor(
            rng.rand(CLASSES).astype(np.float32)
        )
    variables, loss_weights, info = torch_import.import_multi_stage(
        {k: v.numpy() for k, v in state.items()}
    )
    assert info == {"levels": 2, "years": YEARS, "num_classes": [CLASSES, CLASSES]}
    for lvl in range(2):
        k = variables[lvl]["params"]["year_models"]["conv1"]["conv"]["kernel"]
        assert k.shape == (YEARS, 3, 3, BANDS, 32)
        np.testing.assert_allclose(
            loss_weights[lvl], state["loss_weight_{}".format(lvl)].numpy()
        )


def _generic_spectral_state(rng, prefix, bands, classes):
    def t(*shape):
        return torch.tensor(rng.randn(*shape).astype(np.float32) * 0.1)

    dims = {0: bands, 1: 32, 2: 64, 3: 128}
    ks = {1: 3, 2: 5, 3: 7}
    state = {}
    for i in (1, 2, 3):
        cin, cout = dims[i - 1], dims[i]
        state[prefix + "conv{}.conv_layer.weight".format(i)] = t(cout, cin, 3, 3)
        state[prefix + "conv{}.conv_layer.bias".format(i)] = t(cout)
        state[prefix + "conv{}.bn1.weight".format(i)] = 1 + 0.1 * t(cout)
        state[prefix + "conv{}.bn1.bias".format(i)] = t(cout)
        state[prefix + "conv{}.bn1.running_mean".format(i)] = t(cout)
        state[prefix + "conv{}.bn1.running_var".format(i)] = (1 + 0.1 * t(cout)).abs()
        k = ks[i]
        state[prefix + "attention_{}.attention_conv1.weight".format(i)] = t(cout, cout, k)
        state[prefix + "attention_{}.attention_conv1.bias".format(i)] = t(cout)
        state[prefix + "attention_{}.attention_conv2.weight".format(i)] = t(cout, cout, k)
        state[prefix + "attention_{}.attention_conv2.bias".format(i)] = t(cout)
        state[prefix + "classifier{}.fc1.weight".format(i)] = t(classes, cout)
        state[prefix + "classifier{}.fc1.bias".format(i)] = t(classes)
    return state


def test_load_multistage_weights_roundtrip(config, dm):
    """A reference MultiStage checkpoint (same levels/years/classes as a
    module built from the user's frames) loads into our MultiStage and drives
    prediction."""
    from deeptreeattention_tpu.models.multi_stage import MultiStage

    ms = MultiStage(train_df=dm.train, test_df=dm.test, crowns=dm.crowns, config=config)
    rng = np.random.RandomState(9)
    state = {}
    for lvl in range(ms.levels):
        for y in range(len(ms.years)):
            state.update(
                _generic_spectral_state(
                    rng,
                    "models.{}.year_models.{}.".format(lvl, y),
                    bands=config["bands"],
                    classes=ms.num_classes[lvl],
                )
            )
        state["loss_weight_{}".format(lvl)] = torch.tensor(
            rng.rand(ms.num_classes[lvl]).astype(np.float32)
        )
    state_np = {k: v.numpy() for k, v in state.items()}

    torch_import.load_multistage_weights(ms, state_np)

    for lvl in range(ms.levels):
        k = ms.variables[lvl]["params"]["year_models"]["conv1"]["conv"]["kernel"]
        assert k.shape == (len(ms.years), 3, 3, config["bands"], 32)
        expected = np.stack(
            [
                np.transpose(
                    state_np["models.{}.year_models.{}.conv1.conv_layer.weight".format(lvl, y)],
                    (2, 3, 1, 0),
                )
                for y in range(len(ms.years))
            ]
        )
        np.testing.assert_allclose(np.asarray(k), expected)
        np.testing.assert_allclose(
            np.asarray(ms.loss_weights[lvl]),
            state_np["loss_weight_{}".format(lvl)],
        )

    # the imported weights drive a real forward
    x = jnp.asarray(
        np.random.RandomState(0)
        .rand(2, len(ms.years), config["image_size"], config["image_size"], config["bands"])
        .astype(np.float32)
    )
    out = ms.models[0].apply(ms.variables[0], x, train=False)
    assert out.shape == (2, ms.num_classes[0])
    assert np.all(np.isfinite(np.asarray(out)))

    # shape mismatches are rejected, not silently truncated
    bad = {k: v for k, v in state_np.items() if not k.startswith("models.{}.year_models.1".format(ms.levels - 1))}
    with pytest.raises((ValueError, KeyError)):
        torch_import.load_multistage_weights(ms, bad)
