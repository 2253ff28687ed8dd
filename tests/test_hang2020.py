"""Shape tests for the Hang2020 model family (pattern: reference
tests/test_Hang2020.py — parametrized over band counts and stages)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeptreeattention_tpu.models import hang2020


@pytest.mark.parametrize("bands", [3, 349])
def test_vanilla_cnn(bands):
    model = hang2020.VanillaCNN(bands=bands, classes=10)
    x = jnp.zeros((2, 11, 11, bands))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 10)


@pytest.mark.parametrize("bands", [3, 349])
def test_spectral_network(bands):
    model = hang2020.SpectralNetwork(bands=bands, classes=10)
    x = jnp.ones((2, 11, 11, bands))
    variables = model.init(jax.random.PRNGKey(0), x)
    scores = model.apply(variables, x)
    assert len(scores) == 3
    for s in scores:
        assert s.shape == (2, 10)


def test_spatial_network():
    model = hang2020.SpatialNetwork(bands=349, classes=7)
    x = jnp.ones((2, 11, 11, 349))
    variables = model.init(jax.random.PRNGKey(0), x)
    scores = model.apply(variables, x)
    assert [tuple(s.shape) for s in scores] == [(2, 7)] * 3


def test_hang2020_fusion():
    model = hang2020.Hang2020(bands=349, classes=5)
    x = jnp.ones((3, 11, 11, 349))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (3, 5)
    assert "alpha" in variables["params"]


def test_batchnorm_updates_in_train_mode():
    model = hang2020.SpectralNetwork(bands=8, classes=3)
    x = jnp.asarray(np.random.RandomState(0).rand(4, 11, 11, 8), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    _, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = variables["batch_stats"]["conv1"]["bn"]["mean"]
    after = mutated["batch_stats"]["conv1"]["bn"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_backbone_transfer():
    rng = jax.random.PRNGKey(0)
    backbone = hang2020.SpectralNetwork(bands=8, classes=4)
    x = jnp.ones((1, 11, 11, 8))
    bvars = backbone.init(rng, x)
    model, merged = hang2020.load_from_backbone(bvars, classes=9, bands=8, rng=rng)
    out = model.apply(merged, x)
    assert out[-1].shape == (1, 9)
    # conv weights transferred, classifier re-initialized at new width
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["conv1"]["conv"]["kernel"]),
        np.asarray(bvars["params"]["conv1"]["conv"]["kernel"]),
    )
    assert merged["params"]["classifier1"]["fc1"]["kernel"].shape[-1] == 9
