"""ResNet torch-import: a torchvision-style resnet50 state_dict maps onto
every parameter of models.resnet.ResNet (structure + shapes + usable forward)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeptreeattention_tpu.models.resnet import ResNet, DEPTHS
from deeptreeattention_tpu.train import torch_import


def synth_torchvision_resnet50_state(num_classes=2, seed=0):
    rng = np.random.RandomState(seed)
    state = {}

    def conv(name, o, i, k):
        state[name + ".weight"] = rng.randn(o, i, k, k).astype(np.float32) * 0.05

    def bn(name, c):
        state[name + ".weight"] = 1 + 0.1 * rng.randn(c).astype(np.float32)
        state[name + ".bias"] = 0.1 * rng.randn(c).astype(np.float32)
        state[name + ".running_mean"] = 0.1 * rng.randn(c).astype(np.float32)
        state[name + ".running_var"] = 1 + 0.1 * np.abs(rng.randn(c)).astype(np.float32)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    widths = [64, 128, 256, 512]
    in_c = 64
    for stage_i, blocks in enumerate(torch_import.RESNET_STAGES[50], start=1):
        w = widths[stage_i - 1]
        for b in range(blocks):
            src = "layer{}.{}".format(stage_i, b)
            conv(src + ".conv1", w, in_c, 1)
            bn(src + ".bn1", w)
            conv(src + ".conv2", w, w, 3)
            bn(src + ".bn2", w)
            conv(src + ".conv3", w * 4, w, 1)
            bn(src + ".bn3", w * 4)
            if b == 0:
                conv(src + ".downsample.0", w * 4, in_c, 1)
                bn(src + ".downsample.1", w * 4)
            in_c = w * 4
    state["fc.weight"] = rng.randn(num_classes, 2048).astype(np.float32) * 0.05
    state["fc.bias"] = rng.randn(num_classes).astype(np.float32)
    return state


def test_import_resnet50_structure_and_forward():
    state = synth_torchvision_resnet50_state()
    imported = torch_import.import_resnet50(state, num_classes=2)

    model = ResNet(num_classes=2, depth=50)
    init_vars = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))

    # every initialized leaf has an imported counterpart with matching shape
    init_flat = jax.tree_util.tree_leaves_with_path(init_vars)
    imp = {"params": imported["params"], "batch_stats": imported["batch_stats"]}
    imp_flat = dict(
        (jax.tree_util.keystr(p), np.asarray(v))
        for p, v in jax.tree_util.tree_leaves_with_path(imp)
    )
    for path, leaf in init_flat:
        key = jax.tree_util.keystr(path)
        assert key in imp_flat, "missing imported leaf {}".format(key)
        assert imp_flat[key].shape == leaf.shape, key
    assert len(init_flat) == len(imp_flat)

    out = model.apply(
        {"params": imported["params"], "batch_stats": imported["batch_stats"]},
        jnp.asarray(np.random.RandomState(1).rand(2, 64, 64, 3), jnp.float32),
        train=False,
    )
    assert out.shape == (2, 2)
    assert np.all(np.isfinite(np.asarray(out)))


def test_import_resnet50_lightning_prefix():
    state = synth_torchvision_resnet50_state()
    prefixed = {"model." + k: v for k, v in state.items()}
    imported = torch_import.import_resnet50(prefixed, num_classes=2)
    assert "stem_conv" in imported["params"]
    assert "fc" in imported["params"]
