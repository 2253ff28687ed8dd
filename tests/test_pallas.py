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
    x = jnp.asarray(rng.rand(8, 11, 11, bands) * 4 - 1, jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    # randomize batch stats MILDLY so BN folding is exercised without
    # driving every activation relu-dead (an earlier +0.5-mean fixture made
    # the reference output all-zero, which turned parity checks vacuous):
    # means stay near the conv-output scale (~0), variances near 1
    def randomize(path, v):
        name = str(path)
        if "mean" in name:
            return jnp.asarray(rng.rand(*v.shape) * 0.1 - 0.05, v.dtype)
        return jnp.asarray(rng.rand(*v.shape) * 0.6 + 0.7, v.dtype)

    bs = jax.tree_util.tree_map_with_path(randomize, variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": bs}
    ref = np.asarray(model.apply(variables, x, train=False)[-1])
    assert np.abs(ref).max() > 1e-3, "fixture produces dead output; parity vacuous"
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


def test_packed_kernel_matches_flax(net):
    """Round-2 MXU-saturating kernel (ops/pallas_packed.py): exact parity."""
    from deeptreeattention_tpu.ops import pallas_packed as pp

    model, variables, x = net
    expected = model.apply(variables, x, train=False)[-1]
    got = pp.spectral_infer_packed(
        variables, x, batch_tile=4, compute_dtype=jnp.float32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-4, rtol=2e-4)


def test_packed_kernel_bf16_tolerance(net):
    from deeptreeattention_tpu.ops import pallas_packed as pp

    model, variables, x = net
    expected = np.asarray(model.apply(variables, x, train=False)[-1])
    got = np.asarray(
        pp.spectral_infer_packed(
            variables, x, batch_tile=8, compute_dtype=jnp.bfloat16, interpret=True
        )
    )
    assert np.abs(got - expected).max() < 2e-2
    # bf16 path must not silently be f32 (casts actually happen)
    assert np.abs(got - expected).max() > 0


def test_packed_kernel_production_bands(net):
    """Parity at the production 349-band shape."""
    from deeptreeattention_tpu.ops import pallas_packed as pp

    bands, classes = 349, 20
    model = SpectralNetwork(bands=bands, classes=classes)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(4, 11, 11, bands) * 2 - 0.5, jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), x)
    expected = np.asarray(model.apply(variables, x, train=False)[-1])
    assert np.abs(expected).max() > 1e-3
    got = np.asarray(
        pp.spectral_infer_packed(
            variables, x, batch_tile=4, compute_dtype=jnp.float32, interpret=True
        )
    )
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=2e-4)
