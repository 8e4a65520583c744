"""Fused inverted-residual backbone vs the Flax MobileNetV2 (interpreter mode).

The fused path folds inference BatchNorm into the conv weights and runs each
block in one pallas_call on the bordered layout; at float32 it must agree with
``MobileNetV2Backbone.__call__(train=False)`` everywhere — including both
stride-2 SAME-padding quirks (asymmetric 0/1 pads) and residual blocks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fpn_mt_image_captioning_tpu.models.backbones.mobilenet_v2 import (
    MobileNetV2Backbone,
)
from fpn_mt_image_captioning_tpu.ops.fused_backbone import (
    fused_mobilenet_backbone,
    pack_backbone_weights,
    pad_to_bordered,
    unpad_bordered,
)


@pytest.fixture(scope="module")
def setup(rng):
    model = MobileNetV2Backbone(dtype=jnp.float32)
    images = jax.random.normal(rng, (2, 64, 64, 3)) * 0.5
    variables = model.init(rng, images, train=False)
    # non-trivial BN statistics so the folding actually matters
    stats = jax.tree.map(
        lambda x: x + jax.random.uniform(rng, x.shape, minval=0.05, maxval=0.4),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}
    return model, variables, images


def test_bordered_roundtrip(rng):
    x = jax.random.normal(rng, (2, 8, 8, 5))
    padded = pad_to_bordered(x)
    assert padded.shape == (2, 10, 16, 5)
    assert float(jnp.abs(padded[:, 0]).max()) == 0.0
    assert float(jnp.abs(padded[:, :, 0]).max()) == 0.0
    np.testing.assert_array_equal(np.asarray(unpad_bordered(padded, 8, 8)), np.asarray(x))


def test_fused_encode_matches_flax_encode(rng):
    """Full serving encode (fused backbone -> encode_from_taps) vs the plain
    flax Transformer.encode at float32."""
    from fpn_mt_image_captioning_tpu.models.positional import create_masks
    from fpn_mt_image_captioning_tpu.models.transformer import Transformer
    from fpn_mt_image_captioning_tpu.ops.fused_backbone import fused_encode

    model = Transformer(
        num_layers=2, d_model=32, num_heads=4, dff=64,
        input_vocab_size=(64 // 16) ** 2, target_vocab_size=40, max_seq_len=8,
    )
    images = jax.random.normal(rng, (2, 64, 64, 3)) * 0.5
    tar = jnp.ones((2, 4), jnp.int32)
    variables = model.init(
        {"params": rng, "dropout": rng}, images, tar, True, create_masks(tar)
    )
    ref = model.apply(variables, images, train=False, method=Transformer.encode)
    out = fused_encode(model, variables, images, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3, rtol=1e-3)


def test_fused_backbone_matches_flax(setup):
    model, variables, images = setup
    c3_ref, c4_ref, c5_ref = model.apply(variables, images, train=False)

    packed = pack_backbone_weights(
        variables["params"], variables["batch_stats"], dtype=jnp.float32
    )
    c3, c4, c5 = fused_mobilenet_backbone(packed, images, interpret=True)

    assert c3.shape == c3_ref.shape and c4.shape == c4_ref.shape and c5.shape == c5_ref.shape
    np.testing.assert_allclose(np.asarray(c3), np.asarray(c3_ref), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(c4), np.asarray(c4_ref), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(c5), np.asarray(c5_ref), atol=2e-3, rtol=1e-3)
