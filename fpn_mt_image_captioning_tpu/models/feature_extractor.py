"""Vision feature extractor: backbone → FPN → shared head trunk → co-attention →
projection, producing the five pyramid "views" for the multi-view encoder.

Reimplements the reference's ``FeatureExtractor`` (``/root/reference/models/
retinanet.py:266-307``) — which performs Keras graph surgery (builds a full
RetinaNet, truncates both head submodels at layer index ``N_CONV_SUBMODULE``, adds
new final convs, and re-applies the spliced submodel to each pyramid level) — as an
explicit functional module with no surgery:

  * head trunks = ``n_conv_submodule`` 3×3 conv+ReLU layers, 256 filters, weights
    *shared across pyramid levels* (Keras submodels are shared models applied per
    level — ``retinanet.py:300-301``), Gaussian(0.01) init as in the reference
    (``retinanet.py:59,:87``);
  * new final convs: regression → 1 channel ("score"), classification → 256
    channels, linear, he_normal (``retinanet.py:287-288``);
  * co-attention fusion then conv(256, leaky_relu) → 2× max-pool → conv(d_model,
    leaky_relu) (``retinanet.py:291-294``).

Output for a 512² input: five NHWC maps of spatial sizes 32², 16², 8², 4², 2² with
``d_model`` channels (SURVEY.md §2.3 shape table).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .backbones import backbone as resolve_backbone
from .coattention import coattention
from .fpn import FPN
from .layers import he_normal, max_pool_2x, random_normal_init, resolve_activation

__all__ = ["FeatureExtractor"]


class _HeadTrunk(nn.Module):
    """Shared 3×3 conv+ReLU trunk (the surviving prefix of a RetinaNet head)."""

    n_convs: int = 2
    features: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i in range(self.n_convs):
            x = jax.nn.relu(
                nn.Conv(
                    self.features,
                    (3, 3),
                    padding="SAME",
                    kernel_init=random_normal_init(0.01),
                    dtype=self.dtype,
                    name=f"conv_{i}",
                )(x)
            )
        return x


class FeatureExtractor(nn.Module):
    backbone_name: str = "mobilenet224_1.0"
    d_model: int = 512
    feature_size: int = 256
    n_conv_submodule: int = 2
    activation: str = "leaky_relu"
    leaky_relu_alpha: float = 0.2
    bn_momentum: float | None = None   # None = backbone's Keras-faithful default
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.backbone = resolve_backbone(
            self.backbone_name, dtype=self.dtype, bn_momentum=self.bn_momentum
        )
        self.fpn = FPN(feature_size=self.feature_size, dtype=self.dtype)
        self.regression_trunk = _HeadTrunk(
            self.n_conv_submodule, self.feature_size, self.dtype, name="regression_trunk"
        )
        self.classification_trunk = _HeadTrunk(
            self.n_conv_submodule, self.feature_size, self.dtype, name="classification_trunk"
        )
        conv = lambda feats, name: nn.Conv(
            feats, (3, 3), padding="SAME", kernel_init=he_normal(),
            dtype=self.dtype, name=name,
        )
        self.regression_final = conv(1, "regression_final")
        self.classification_final = conv(self.feature_size, "classification_final")
        self.fuse_conv1 = conv(self.feature_size, "fuse_conv1")
        self.fuse_conv2 = conv(self.d_model, "fuse_conv2")
        self.act = resolve_activation(self.activation, self.leaky_relu_alpha)

    def _per_level(self, feature: jax.Array) -> jax.Array:
        score = self.regression_final(self.regression_trunk(feature))
        hs = self.classification_final(self.classification_trunk(feature))
        out = coattention(score, hs)
        out = self.act(self.fuse_conv1(out))
        out = max_pool_2x(out)
        return self.act(self.fuse_conv2(out))

    def __call__(self, images: jax.Array, train: bool = False) -> list[jax.Array]:
        """``images``: (B, S, S, 3) in [-1, 1]. Returns [P3'..P7'] views,
        each (B, h, w, d_model) with h = w = S/16, S/32, S/64, S/128, S/256."""
        x = images.astype(self.dtype)
        C3, C4, C5 = self.backbone(x, train=train)
        return self.from_taps(C3, C4, C5)

    def from_taps(self, C3, C4, C5) -> list[jax.Array]:
        """FPN + heads from precomputed backbone taps (fused-backbone path)."""
        pyramids = self.fpn(C3.astype(self.dtype), C4.astype(self.dtype),
                            C5.astype(self.dtype))
        return [self._per_level(p) for p in pyramids]
