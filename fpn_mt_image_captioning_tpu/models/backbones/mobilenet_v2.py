"""MobileNetV2 backbone (Flax), tapped at C3/C4/C5 for the FPN.

TPU-native reimplementation of the backbone the reference builds via
``tf.keras.applications.MobileNetV2`` and taps at
``['block_5_add', 'block_12_add', 'out_relu']`` (strides 8/16/32 —
``/root/reference/models/mobilenet.py:55-66``). The architecture follows the
MobileNetV2 paper (inverted residuals, relu6, width multiplier ``alpha``) and
reproduces Keras' channel rounding (``_make_divisible`` to multiples of 8) so the
tap channel counts match (alpha=1.0: 32 / 96 / 1280).

Convs run in the configured compute dtype (bfloat16 on TPU) with float32 params
and float32 BatchNorm statistics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["MobileNetV2Backbone", "make_divisible"]

# (expansion t, channels c, repeats n, first-stride s) — MobileNetV2 paper Table 2
_BLOCK_CONFIG = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),   # → C3 tap (stride 8)
    (6, 64, 4, 2),
    (6, 96, 3, 1),   # → C4 tap (stride 16)
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]
_C3_GROUP, _C4_GROUP = 2, 4


def make_divisible(v: float, divisor: int = 8, min_value: int | None = None) -> int:
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class _ConvBN(nn.Module):
    features: int
    kernel: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    groups: int = 1
    use_relu6: bool = True
    # Keras MobileNetV2 default. Tuned for long pretrained runs — short
    # from-scratch runs should lower it (Config.bn_momentum) or finalize
    # stats post-training (Pipeline.finalize_batch_stats).
    bn_momentum: float = 0.999
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding="SAME",
            use_bias=False,
            feature_group_count=self.groups,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=1e-3,
            dtype=self.dtype,
            name="bn",
        )(x)
        if self.use_relu6:
            x = jax.nn.relu6(x)
        return x


class _InvertedResidual(nn.Module):
    features: int
    stride: int
    expansion: int
    bn_momentum: float = 0.999
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        in_ch = x.shape[-1]
        h = x
        if self.expansion != 1:
            h = _ConvBN(in_ch * self.expansion, (1, 1), bn_momentum=self.bn_momentum,
                        dtype=self.dtype, name="expand")(h, train)
        h = _ConvBN(
            h.shape[-1],
            (3, 3),
            strides=(self.stride, self.stride),
            groups=h.shape[-1],
            bn_momentum=self.bn_momentum,
            dtype=self.dtype,
            name="depthwise",
        )(h, train)
        h = _ConvBN(self.features, (1, 1), use_relu6=False,
                    bn_momentum=self.bn_momentum, dtype=self.dtype, name="project")(h, train)
        if self.stride == 1 and in_ch == self.features:
            h = h + x
        return h


class MobileNetV2Backbone(nn.Module):
    """Returns ``(C3, C4, C5)`` feature maps at strides 8/16/32."""

    alpha: float = 1.0
    bn_momentum: float = 0.999
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        first = make_divisible(32 * self.alpha)
        x = _ConvBN(first, (3, 3), strides=(2, 2), bn_momentum=self.bn_momentum,
                    dtype=self.dtype, name="stem")(x, train)

        taps = {}
        for gi, (t, c, n, s) in enumerate(_BLOCK_CONFIG):
            out_ch = make_divisible(c * self.alpha)
            for bi in range(n):
                stride = s if bi == 0 else 1
                x = _InvertedResidual(
                    out_ch, stride, t, bn_momentum=self.bn_momentum,
                    dtype=self.dtype, name=f"block_{gi}_{bi}"
                )(x, train)
            if gi == _C3_GROUP:
                taps["C3"] = x
            elif gi == _C4_GROUP:
                taps["C4"] = x

        last = make_divisible(1280 * self.alpha) if self.alpha > 1.0 else 1280
        x = _ConvBN(last, (1, 1), bn_momentum=self.bn_momentum,
                    dtype=self.dtype, name="head")(x, train)
        taps["C5"] = x
        return taps["C3"], taps["C4"], taps["C5"]
