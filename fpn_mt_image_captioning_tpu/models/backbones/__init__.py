"""Backbone registry.

The reference keeps a string-keyed backbone registry (``models/__init__.py:49-76``)
whose ResNet/VGG/DenseNet entries are broken (missing modules — SURVEY.md §2.2).
This framework's registry resolves every advertised backbone to a *working* Flax
module returning ``(C3, C4, C5)`` taps at strides 8/16/32.

Names accepted (reference spellings kept):
  * ``mobilenet{128,160,192,224}_<alpha>``  (e.g. ``mobilenet224_1.0``)
  * ``resnet50``, ``resnet101``, ``resnet152``
  * ``vgg16``, ``vgg19``
  * ``densenet121``, ``densenet169``, ``densenet201``
"""

from __future__ import annotations

import jax.numpy as jnp

from .mobilenet_v2 import MobileNetV2Backbone

__all__ = ["backbone", "MobileNetV2Backbone"]


def backbone(name: str, dtype=jnp.float32, bn_momentum: float | None = None):
    """Resolve a backbone name to a Flax module instance (reference
    ``models/__init__.py:49`` equivalent).

    ``bn_momentum=None`` keeps each backbone's Keras-faithful default
    (MobileNetV2 0.999, ResNet/DenseNet 0.99); pass a value to override —
    short from-scratch runs need ~0.9 or their inference stats never leave
    the (0, 1) init (Config.bn_momentum)."""
    mom = {} if bn_momentum is None else {"bn_momentum": bn_momentum}
    if name.startswith("mobilenet"):
        alpha = float(name.split("_")[1]) if "_" in name else 1.0
        return MobileNetV2Backbone(alpha=alpha, dtype=dtype, **mom)
    if name.startswith("resnet"):
        from .resnet import ResNetBackbone

        depth = int(name.replace("resnet", ""))
        return ResNetBackbone(depth=depth, dtype=dtype, **mom)
    if name.startswith("vgg"):
        from .vgg import VGGBackbone

        depth = int(name.replace("vgg", ""))
        return VGGBackbone(depth=depth, dtype=dtype)  # no BN in VGG
    if name.startswith("densenet"):
        from .densenet import DenseNetBackbone

        depth = int(name.replace("densenet", ""))
        return DenseNetBackbone(depth=depth, dtype=dtype, **mom)
    raise ValueError(f"unknown backbone {name!r}")
