"""Golden shape/numerics tests for the model stack against SURVEY.md §2.3 and the
reference math (PE formula, masks, attention, co-attention)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fpn_mt_image_captioning_tpu.models.attention import (
    MultiHeadAttention,
    scaled_dot_product_attention,
)
from fpn_mt_image_captioning_tpu.models.coattention import coattention
from fpn_mt_image_captioning_tpu.models.layers import upsample_like
from fpn_mt_image_captioning_tpu.models.positional import (
    create_look_ahead_mask,
    create_masks,
    create_padding_mask,
    raw_positional_encoding,
)


def test_positional_encoding_formula():
    pe = raw_positional_encoding(50, 16)
    assert pe.shape == (50, 16)
    # closed-form checks: pe[pos, 2i] = sin(pos / 10000^(2i/d)), odd dims cos
    for pos in (0, 1, 7):
        for i in (0, 2, 6):
            angle = pos / np.power(10000, i / 16)
            np.testing.assert_allclose(pe[pos, i], np.sin(angle), rtol=1e-6)
            np.testing.assert_allclose(pe[pos, i + 1], np.cos(angle), rtol=1e-6)


def test_masks():
    la = create_look_ahead_mask(4)
    np.testing.assert_array_equal(np.triu(np.ones((4, 4)), 1), la)
    pad = create_padding_mask(jnp.array([[5, 3, 0, 0]]))
    assert pad.shape == (1, 1, 1, 4)
    np.testing.assert_array_equal(pad[0, 0, 0], [0, 0, 1, 1])
    combined = create_masks(jnp.array([[5, 3, 0, 0]]))
    assert combined.shape == (1, 1, 4, 4)
    # position 1 can see 0..1; positions 2+ are padding → fully masked columns
    np.testing.assert_array_equal(combined[0, 0, 1], [0, 0, 1, 1])
    np.testing.assert_array_equal(combined[0, 0, 3], [0, 0, 1, 1])


def test_scaled_dot_product_attention_math():
    q = jnp.array([[[1.0, 0.0]]])  # (1, 1, 2)
    k = jnp.array([[[1.0, 0.0], [0.0, 1.0]]])  # (1, 2, 2)
    v = jnp.array([[[10.0, 0.0], [0.0, 10.0]]])
    out, w = scaled_dot_product_attention(q, k, v, None)
    # logits = [1/sqrt(2), 0] → softmax
    e = np.exp(1 / np.sqrt(2))
    expected_w = np.array([e, 1.0]) / (e + 1.0)
    np.testing.assert_allclose(w[0, 0], expected_w, rtol=1e-6)
    np.testing.assert_allclose(out[0, 0], expected_w * 10.0, rtol=1e-6)


def test_mha_cached_equals_full(rng):
    mha = MultiHeadAttention(d_model=16, num_heads=4)
    x = jax.random.normal(rng, (2, 5, 16))
    variables = mha.init(rng, x, x, x, None)
    full, _ = mha.apply(variables, x, x, x, create_look_ahead_mask(5)[None, None])

    # incremental: feed one token at a time through the cache path
    k_cache = jnp.zeros((2, 5, 4, 4))
    v_cache = jnp.zeros((2, 5, 4, 4))
    outs = []
    for t in range(5):
        x_t = x[:, t : t + 1, :]
        k_t, v_t = mha.apply(variables, x_t, method=MultiHeadAttention.project_kv)
        k_cache = jax.lax.dynamic_update_slice(k_cache, k_t, (0, t, 0, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, v_t, (0, t, 0, 0))
        # attend_cached logits layout is (B, L, H) → mask broadcasts as (1, L, 1)
        mask = (jnp.arange(5) > t).astype(jnp.float32)[None, :, None]
        out = mha.apply(
            variables, x_t, k_cache, v_cache, mask,
            method=MultiHeadAttention.attend_cached,
        )
        outs.append(out)
    incremental = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(full, incremental, atol=1e-5)


def test_coattention_math():
    score = jnp.zeros((1, 2, 2, 1))  # uniform weights = 1/4
    hs = jnp.ones((1, 2, 2, 3)) * 8.0
    out = coattention(score, hs)
    np.testing.assert_allclose(out, np.full((1, 2, 2, 3), 2.0), rtol=1e-6)


def test_upsample_like_nearest():
    src = jnp.arange(4.0).reshape(1, 2, 2, 1)
    out = upsample_like(src, (4, 4))
    assert out.shape == (1, 4, 4, 1)
    np.testing.assert_array_equal(
        out[0, :, :, 0],
        [[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]],
    )


@pytest.mark.slow
def test_feature_extractor_shape_table(rng):
    """SURVEY.md §2.3: 256² input → views 16², 8², 4², 2², 1² × d_model."""
    from fpn_mt_image_captioning_tpu.models.feature_extractor import FeatureExtractor

    fe = FeatureExtractor(d_model=32)
    img = jnp.zeros((1, 256, 256, 3))
    variables = fe.init(rng, img)
    views = fe.apply(variables, img)
    sizes = [tuple(v.shape) for v in views]
    assert sizes == [
        (1, 16, 16, 32),
        (1, 8, 8, 32),
        (1, 4, 4, 32),
        (1, 2, 2, 32),
        (1, 1, 1, 32),
    ]


@pytest.mark.slow
def test_transformer_end_to_end_shapes(rng):
    from fpn_mt_image_captioning_tpu.models.transformer import Transformer

    model = Transformer(
        num_layers=2, d_model=32, num_heads=4, dff=64,
        input_vocab_size=(256 // 16) ** 2, target_vocab_size=50, max_seq_len=12,
    )
    img = jnp.zeros((2, 256, 256, 3))
    tar = jnp.ones((2, 11), dtype=jnp.int32)
    mask = create_masks(tar)
    variables = model.init({"params": rng, "dropout": rng}, img, tar, True, mask)
    (logits, attn), _ = model.apply(
        variables, img, tar, True, mask, rngs={"dropout": rng}, mutable=["batch_stats"]
    )
    assert logits.shape == (2, 11, 50)

    enc = model.apply(variables, img, train=False, method=Transformer.encode)
    assert enc.shape == (2, 4, 32)  # 256² input → baseline view is 2²=4 tokens

    # cached decode must equal the full decoder at every position
    logits_full, _ = model.apply(variables, enc, tar, False, mask)
    cache = model.apply(variables, enc, 11, method=Transformer.init_cache)
    for t in range(4):
        step_logits, cache = model.apply(
            variables, tar[:, t], jnp.int32(t), cache, method=Transformer.decode_step
        )
        np.testing.assert_allclose(step_logits, logits_full[:, t], atol=2e-4)


def test_remat_encoder_matches_non_remat_gradients(rng):
    """remat_encoder must be numerics-neutral: identical loss AND gradients in
    train mode (it used to crash — raw jax.checkpoint over a Flax bound method
    leaked init tracers and traced the Python `deterministic` bool)."""
    from fpn_mt_image_captioning_tpu.models.transformer import Transformer
    from fpn_mt_image_captioning_tpu.train.losses import masked_sparse_ce

    kw = dict(
        num_layers=2, d_model=32, num_heads=4, dff=64,
        input_vocab_size=(64 // 16) ** 2, target_vocab_size=30, max_seq_len=8,
    )
    base = Transformer(**kw)
    remat = Transformer(remat_encoder=True, **kw)

    img = jax.random.uniform(rng, (2, 64, 64, 3), minval=-1, maxval=1)
    tar = jnp.ones((2, 7), dtype=jnp.int32)
    mask = create_masks(tar)
    variables = base.init({"params": rng, "dropout": rng}, img, tar, True, mask)

    def loss_fn(model, params):
        (logits, _), _ = model.apply(
            {**variables, "params": params}, img, tar, True, mask,
            rngs={"dropout": jax.random.PRNGKey(5)}, mutable=["batch_stats"],
        )
        return masked_sparse_ce(tar, logits)

    l0, g0 = jax.value_and_grad(lambda p: loss_fn(base, p))(variables["params"])
    l1, g1 = jax.value_and_grad(lambda p: loss_fn(remat, p))(variables["params"])
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5), g0, g1
    )
