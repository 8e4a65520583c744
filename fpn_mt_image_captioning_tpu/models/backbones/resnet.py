"""ResNet-v1 backbone (Flax) — C3/C4/C5 taps for the FPN.

The reference's ``models/resnet.py`` is dead code (imports the missing
``keras_resnet`` package — SURVEY.md §2.2) but its intent is
``resnet.outputs[1:]`` = stage-2/3/4 outputs at strides 8/16/32
(``/root/reference/models/resnet.py:112``). This is a working Flax ResNet
(bottleneck v1, stride-2 on the first 1×1 like Keras applications) for depths
50/101/152.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["ResNetBackbone"]

_DEPTH_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


class _ConvBN(nn.Module):
    features: int
    kernel: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    relu: bool = True
    bn_momentum: float = 0.99
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding="SAME", use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=self.bn_momentum,
                         epsilon=1.001e-5, dtype=self.dtype, name="bn")(x)
        return jax.nn.relu(x) if self.relu else x


class _Bottleneck(nn.Module):
    filters: int
    stride: int = 1
    project: bool = False
    bn_momentum: float = 0.99
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        shortcut = x
        if self.project:
            shortcut = _ConvBN(self.filters * 4, (1, 1), (self.stride, self.stride),
                               relu=False, bn_momentum=self.bn_momentum,
                               dtype=self.dtype, name="shortcut")(x, train)
        h = _ConvBN(self.filters, (1, 1), (self.stride, self.stride),
                    bn_momentum=self.bn_momentum, dtype=self.dtype, name="conv1")(x, train)
        h = _ConvBN(self.filters, (3, 3), bn_momentum=self.bn_momentum,
                    dtype=self.dtype, name="conv2")(h, train)
        h = _ConvBN(self.filters * 4, (1, 1), relu=False, bn_momentum=self.bn_momentum,
                    dtype=self.dtype, name="conv3")(h, train)
        return jax.nn.relu(h + shortcut)


class ResNetBackbone(nn.Module):
    depth: int = 50
    bn_momentum: float = 0.99
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        blocks = _DEPTH_BLOCKS[self.depth]
        x = _ConvBN(64, (7, 7), (2, 2), bn_momentum=self.bn_momentum,
                    dtype=self.dtype, name="stem")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        taps = []
        for stage, n in enumerate(blocks):
            filters = 64 * (2**stage)
            stride = 1 if stage == 0 else 2
            x = _Bottleneck(filters, stride, project=True,
                            bn_momentum=self.bn_momentum, dtype=self.dtype,
                            name=f"stage{stage}_block0")(x, train)
            for b in range(1, n):
                x = _Bottleneck(filters, bn_momentum=self.bn_momentum,
                                dtype=self.dtype,
                                name=f"stage{stage}_block{b}")(x, train)
            taps.append(x)
        # stages 1, 2, 3 → C3 (stride 8), C4 (16), C5 (32)
        return taps[1], taps[2], taps[3]
