"""Backbone registry tests: every advertised backbone resolves and produces
C3/C4/C5 taps at strides 8/16/32 with the expected channel counts (the reference
registry's ResNet/VGG/DenseNet entries are broken — SURVEY.md §2.2)."""

import jax
import jax.numpy as jnp
import pytest

from fpn_mt_image_captioning_tpu.models.backbones import backbone

S = 64  # stride-32 → 2×2 at 64² input


@pytest.mark.parametrize(
    "name,channels",
    [
        ("mobilenet224_1.0", (32, 96, 1280)),
        ("mobilenet224_0.75", (24, 72, 1280)),
        ("resnet50", (512, 1024, 2048)),
        ("vgg16", (256, 512, 512)),
        ("densenet121", (512, 1024, 1024)),
    ],
)
def test_backbone_taps(name, channels, rng):
    model = backbone(name)
    x = jnp.zeros((1, S, S, 3))
    variables = model.init(rng, x, train=False)
    C3, C4, C5 = model.apply(variables, x, train=False)
    assert C3.shape == (1, S // 8, S // 8, channels[0]), C3.shape
    assert C4.shape == (1, S // 16, S // 16, channels[1]), C4.shape
    assert C5.shape == (1, S // 32, S // 32, channels[2]), C5.shape


def test_unknown_backbone_raises():
    with pytest.raises(ValueError):
        backbone("alexnet")
