"""DenseNet backbone (Flax) — C3/C4/C5 taps for the FPN.

The reference's ``models/densenet.py`` is dead code (missing ``..utils.image`` —
SURVEY.md §2.2); its intended taps are the dense-block concat outputs
``conv{3,4,5}_block{n}_concat`` at strides 8/16/32
(``/root/reference/models/densenet.py:93-96``). Working Flax DenseNet
121/169/201 (BN-ReLU-Conv pre-activation blocks, growth rate 32, Keras layout).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["DenseNetBackbone"]

_DEPTH_BLOCKS = {121: (6, 12, 24, 16), 169: (6, 12, 32, 32), 201: (6, 12, 48, 32)}
_GROWTH = 32


def _bn_relu(x, train: bool, dtype, name: str, momentum: float = 0.99):
    x = nn.BatchNorm(use_running_average=not train, momentum=momentum,
                     epsilon=1.001e-5, dtype=dtype, name=name)(x)
    return jax.nn.relu(x)


class _DenseLayer(nn.Module):
    bn_momentum: float = 0.99
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        h = _bn_relu(x, train, self.dtype, "bn1", self.bn_momentum)
        h = nn.Conv(4 * _GROWTH, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(h)
        h = _bn_relu(h, train, self.dtype, "bn2", self.bn_momentum)
        h = nn.Conv(_GROWTH, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        return jnp.concatenate([x, h], axis=-1)


class _Transition(nn.Module):
    bn_momentum: float = 0.99
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = _bn_relu(x, train, self.dtype, "bn", self.bn_momentum)
        x = nn.Conv(x.shape[-1] // 2, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class DenseNetBackbone(nn.Module):
    depth: int = 121
    bn_momentum: float = 0.99
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        blocks = _DEPTH_BLOCKS[self.depth]
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        x = _bn_relu(x, train, self.dtype, "stem_bn", self.bn_momentum)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        taps = []
        for bi, n in enumerate(blocks):
            for li in range(n):
                x = _DenseLayer(bn_momentum=self.bn_momentum, dtype=self.dtype,
                                name=f"block{bi + 2}_layer{li}")(x, train)
            taps.append(x)  # conv{bi+2}_block{n}_concat equivalent
            if bi != len(blocks) - 1:
                x = _Transition(bn_momentum=self.bn_momentum, dtype=self.dtype,
                                name=f"transition{bi + 1}")(x, train)
        # dense blocks 2, 3, 4 (concat outputs) → strides 8, 16, 32
        return taps[1], taps[2], taps[3]
