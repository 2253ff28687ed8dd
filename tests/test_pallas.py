"""Pallas fused spectral-network kernel: exact parity with the flax forward
(interpret mode on the CPU mesh; compiled path exercised on TPU via bench)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeptreeattention_tpu.models.hang2020 import SpectralNetwork
from deeptreeattention_tpu.ops import pallas_kernels as pk


@pytest.fixture(scope="module")
def net():
    bands, classes = 16, 7
    model = SpectralNetwork(bands=bands, classes=classes)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(8, 11, 11, bands), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    # randomize batch stats so BN folding is actually exercised
    variables = jax.tree_util.tree_map(lambda v: v, variables)
    bs = jax.tree_util.tree_map(
        lambda v: jnp.asarray(rng.rand(*v.shape) + 0.5, v.dtype), variables["batch_stats"]
    )
    variables = {"params": variables["params"], "batch_stats": bs}
    return model, variables, x


def test_bn_fold():
    rng = np.random.RandomState(1)
    k = rng.rand(3, 3, 4, 8).astype(np.float32)
    b = rng.rand(8).astype(np.float32)
    scale = rng.rand(8).astype(np.float32) + 0.5
    beta = rng.rand(8).astype(np.float32)
    mean = rng.rand(8).astype(np.float32)
    var = rng.rand(8).astype(np.float32) + 0.5
    fk, fb = pk.fold_bn(k, b, scale, beta, mean, var)
    # folded conv(x) == BN(conv(x)) for a random input
    x = rng.rand(2, 5, 5, 4).astype(np.float32)
    conv = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b
    bn = (conv - mean) / np.sqrt(var + 1e-5) * scale + beta
    folded = jax.lax.conv_general_dilated(
        x, fk, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + fb
    np.testing.assert_allclose(np.asarray(folded), np.asarray(bn), atol=1e-5)


def test_fused_kernel_matches_flax(net):
    model, variables, x = net
    expected = model.apply(variables, x, train=False)[-1]
    got = pk.spectral_infer(
        variables, x, batch_tile=4, compute_dtype=jnp.float32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-4, rtol=2e-4)


def test_fused_kernel_multiple_tiles(net):
    model, variables, x = net
    big = jnp.concatenate([x, x * 0.5], axis=0)  # 16 = 4 tiles of 4
    expected = model.apply(variables, big, train=False)[-1]
    got = pk.spectral_infer(
        variables, big, batch_tile=4, compute_dtype=jnp.float32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-4, rtol=2e-4)
