"""ResNet (v1.5) in flax — backbone for the alive/dead classifier.

The reference uses torchvision's pretrained resnet50 with a 2-class head
(reference src/models/dead.py:34-36). Offline, we provide the same
architecture trained from scratch (or from a converted checkpoint via
train/torch_import.py); bottleneck ResNet-50 by default, with a depth table
for smaller variants used in tests.
"""
from functools import partial

import flax.linen as nn
import jax.numpy as jnp

DEPTHS = {
    18: ([2, 2, 2, 2], False),
    34: ([3, 4, 6, 3], False),
    50: ([3, 4, 6, 3], True),
    101: ([3, 4, 23, 3], True),
}


class BasicBlock(nn.Module):
    filters: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        norm = partial(nn.BatchNorm, use_running_average=not train, momentum=0.9,
                       epsilon=1e-5, dtype=jnp.float32)
        residual = x
        y = nn.Conv(self.filters, (3, 3), (self.strides, self.strides), padding="SAME",
                    use_bias=False, dtype=self.dtype)(x)
        y = norm()(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype)(y)
        y = norm(scale_init=nn.initializers.zeros)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters, (1, 1), (self.strides, self.strides),
                               use_bias=False, dtype=self.dtype)(residual)
            residual = norm()(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    filters: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        norm = partial(nn.BatchNorm, use_running_average=not train, momentum=0.9,
                       epsilon=1e-5, dtype=jnp.float32)
        residual = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = norm()(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), (self.strides, self.strides), padding="SAME",
                    use_bias=False, dtype=self.dtype)(y)
        y = norm()(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters * 4, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = norm(scale_init=nn.initializers.zeros)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters * 4, (1, 1), (self.strides, self.strides),
                               use_bias=False, dtype=self.dtype)(residual)
            residual = norm()(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    num_classes: int
    depth: int = 50
    width: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False, features=False):
        """features=True returns the stage feature maps {"c2".."c5"} instead
        of class logits (the FPN backbone contract, models/retinanet.py);
        submodule names are unchanged so train.torch_import.import_resnet50's
        key mapping covers both uses."""
        stages, bottleneck = DEPTHS[self.depth]
        block = Bottleneck if bottleneck else BasicBlock
        x = x.astype(self.dtype)
        x = nn.Conv(self.width, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        feats = {}
        for stage, blocks in enumerate(stages):
            for b in range(blocks):
                strides = 2 if stage > 0 and b == 0 else 1
                x = block(self.width * 2**stage, strides, self.dtype,
                          name="stage{}_block{}".format(stage + 1, b))(x, train=train)
            feats["c{}".format(stage + 2)] = x
        if features:
            return feats
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(x)
