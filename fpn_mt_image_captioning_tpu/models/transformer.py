"""Multi-Transformer (UMV multi-view encoder) + decoder, TPU-native.

Functional redesign of the reference seq2seq stack
(``/root/reference/models/transformer.py:158-374``):

  * ``EncoderLayer`` — one cross-attention per non-baseline pyramid view (query =
    baseline stream, key/value = the view), residual-accumulated into the baseline,
    then LN → FFN(dff, leaky_relu) → FFN(d_model) → LN (post-LN, reference
    ``transformer.py:162-198``).
  * ``Encoder`` — FeatureExtractor views reordered so ``baseline_index`` comes last
    (``transformer.py:253,:279``), each view flattened to (B, h·w, d_model),
    normalized by a *shared* LayerNorm, given a sliced shared sinusoidal PE and
    per-view dropout (``transformer.py:282-296``); ``num_layers`` encoder layers
    update only the baseline slot. Output: (B, baseline_len, d_model) — 16 tokens
    for a 512² input.
  * ``Decoder`` — standard post-LN transformer decoder (masked self-attn,
    cross-attn over encoder output, FFN), embedding + *unscaled* PE (the d_model
    sqrt-scaling line is commented out in the reference — ``transformer.py:327``).
    Per-layer attention weights are returned under the reference's naming scheme
    ``decoder_layer{n}_block{1,2}`` (``transformer.py:337-338``).

TPU-native additions with no reference counterpart:

  * a functional KV cache (``init_cache`` / ``decode_step``) enabling O(1)-per-step
    ``lax.scan`` decoding — the reference re-forwards the whole growing prefix every
    beam step (``utils/pipeline.py:105-112``);
  * cross-attention K/V are projected once per sequence at cache init (the encoder
    output is only 16 tokens, so decode-time cross-attention is a tiny cached
    matmul);
  * configurable compute dtype (bfloat16 on TPU) with float32 LayerNorm/softmax;
  * optional ``jax.checkpoint`` rematerialization over encoder layers.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .attention import MultiHeadAttention, MultiViewAttention
from .feature_extractor import FeatureExtractor
from .layers import (
    he_normal,
    normalize_images,
    resolve_activation,
    stacked_he_normal,
)
from .positional import positional_encoding, raw_positional_encoding

__all__ = ["EncoderLayer", "DecoderLayer", "Encoder", "Decoder", "Transformer"]


def _embed_init(key, shape, dtype=jnp.float32):
    # Keras Embedding default: RandomUniform(-0.05, 0.05)
    return jax.random.uniform(key, shape, dtype, -0.05, 0.05)


class _FFN(nn.Module):
    """Two-layer pointwise FFN: Dense(dff, act) → Dense(d_model), he_normal."""

    d_model: int
    dff: int
    activation: str = "leaky_relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        act = resolve_activation(self.activation)
        h = act(nn.Dense(self.dff, kernel_init=he_normal(), dtype=self.dtype, name="ffn1")(x))
        return nn.Dense(self.d_model, kernel_init=he_normal(), dtype=self.dtype, name="ffn2")(h)


def _ln(name: str):
    # float32 LayerNorm (params float32; statistics promoted) — Keras epsilon parity
    return nn.LayerNorm(epsilon=1e-6, name=name)


class EncoderLayer(nn.Module):
    """UMV encoder layer: multi-view cross-attention into the baseline stream,
    then post-LN FFN (reference ``transformer.py:158-198`` semantics, computed
    with the transposed-projection MultiViewAttention over the raw unpadded
    view tokens — the per-layer K/V weights come in as arguments because the
    Encoder owns the (num_layers, V, d, 2d) stacked parameter)."""

    d_model: int
    num_heads: int
    dff: int
    num_views: int  # = num_pyramids - 1 (non-baseline views)
    rate: float = 0.1
    activation: str = "leaky_relu"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.mva = MultiViewAttention(
            self.num_views, self.d_model, self.num_heads, self.rate,
            dtype=self.dtype, name="mva",
        )
        self.ffn = _FFN(self.d_model, self.dff, self.activation, self.dtype, name="ffn")
        self.layernorm1 = _ln("layernorm1")
        self.layernorm2 = _ln("layernorm2")
        self.dropout2 = nn.Dropout(self.rate)

    def __call__(
        self,
        baseline: jax.Array,        # (B, Lq, d_model)
        sources: list[jax.Array],   # V arrays (B, Lv, d_model), raw view tokens
        kv_w: jax.Array,            # (V, d, 2d) — this layer's K/V projections
        kv_b: jax.Array,            # (V, 2d)
        deterministic: bool = True,
    ) -> jax.Array:
        out = baseline + self.mva(baseline, sources, kv_w, kv_b, deterministic)
        out1 = self.layernorm1(out).astype(baseline.dtype)
        ffn_out = self.dropout2(self.ffn(out1), deterministic=deterministic)
        return self.layernorm2(out1 + ffn_out).astype(baseline.dtype)


class Encoder(nn.Module):
    num_layers: int
    d_model: int
    num_heads: int
    dff: int
    input_vocab_size: int          # PE table length == longest flattened view
    num_pyramids: int = 5
    baseline_index: int = 3
    rate: float = 0.1
    backbone_name: str = "mobilenet224_1.0"
    n_conv_submodule: int = 2
    activation: str = "leaky_relu"
    remat: bool = False
    bn_momentum: float | None = None   # None = backbone's Keras-faithful default
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.feature_extractor = FeatureExtractor(
            backbone_name=self.backbone_name,
            d_model=self.d_model,
            n_conv_submodule=self.n_conv_submodule,
            activation=self.activation,
            bn_momentum=self.bn_momentum,
            dtype=self.dtype,
            name="feature_extractor",
        )
        num_views = self.num_pyramids - 1
        # rematerialization must be the LIFTED transform (nn.remat) so Flax
        # tracks param creation through it (raw jax.checkpoint leaks init-time
        # tracers); static_argnums counts self as 0, so `deterministic` — a
        # Python bool steering nn.Dropout — is argnum 5
        layer_cls = (
            nn.remat(EncoderLayer, static_argnums=(5,))
            if self.remat else EncoderLayer
        )
        self.enc_layers = [
            layer_cls(
                self.d_model, self.num_heads, self.dff, num_views,
                self.rate, self.activation, self.dtype, name=f"layer_{i}",
            )
            for i in range(self.num_layers)
        ]
        # All layers' K/V projections, computed in one shot: the UMV source views
        # are constant across layers (only the baseline updates — reference
        # transformer.py:298-299), so K/V need projecting exactly once.
        self.kv_proj = self.param(
            "kv_proj",
            stacked_he_normal(2),
            (self.num_layers, num_views, self.d_model, 2 * self.d_model),
        )
        self.kv_bias = self.param(
            "kv_bias", nn.initializers.zeros,
            (self.num_layers, num_views, 2 * self.d_model),
        )
        self.layernorm1 = _ln("layernorm1")  # shared across all views
        self.dropout1s = [nn.Dropout(self.rate) for _ in range(self.num_pyramids)]
        self.pos_encoding = positional_encoding(self.input_vocab_size, self.d_model)
        # baseline view moved to the back (reference transformer.py:253)
        self.x_order = [i for i in range(self.num_pyramids) if i != self.baseline_index] + [
            self.baseline_index
        ]

    def __call__(self, images: jax.Array, train: bool = False) -> jax.Array:
        # uint8 batches normalize on-device (4× smaller host→device transfer;
        # trace-time switch — float callers' HLO is unchanged)
        views = self.feature_extractor(normalize_images(images), train=train)
        return self.encode_views(views, train=train)

    def from_taps(self, c3, c4, c5, train: bool = False) -> jax.Array:
        """Encode from precomputed backbone taps (the fused-backbone serving
        path computes C3/C4/C5 outside flax — ops/fused_backbone.py)."""
        views = self.feature_extractor.from_taps(c3, c4, c5)
        return self.encode_views(views, train=train)

    def encode_views(self, views: list[jax.Array], train: bool = False) -> jax.Array:
        views = [views[i] for i in self.x_order]

        embedded: list[jax.Array] = []
        for i, v in enumerate(views):
            b, h, w, c = v.shape
            t = v.reshape(b, h * w, c)
            t = self.layernorm1(t).astype(v.dtype)
            t = t + jnp.asarray(self.pos_encoding[:, : h * w, :], v.dtype)
            t = self.dropout1s[i](t, deterministic=not train)
            embedded.append(t)

        baseline = embedded[-1]
        sources = embedded[:-1]

        # K/V are never materialized: each layer folds its projections into the
        # 16-token query side (see MultiViewAttention) and attends over the raw
        # unpadded view tokens — O(L·d·H·Lq) per view instead of O(L·d²), no
        # (layers, V, B, L, 2d) HBM round-trip.
        kv_w = jnp.asarray(self.kv_proj, baseline.dtype)
        kv_b = jnp.asarray(self.kv_bias, baseline.dtype)

        for li, layer in enumerate(self.enc_layers):
            baseline = layer(baseline, sources, kv_w[li], kv_b[li], not train)
        return baseline


class DecoderLayer(nn.Module):
    d_model: int
    num_heads: int
    dff: int
    rate: float = 0.1
    activation: str = "leaky_relu"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.mha1 = MultiHeadAttention(self.d_model, self.num_heads, dtype=self.dtype, name="mha1")
        self.mha2 = MultiHeadAttention(self.d_model, self.num_heads, dtype=self.dtype, name="mha2")
        self.ffn = _FFN(self.d_model, self.dff, self.activation, self.dtype, name="ffn")
        self.layernorm1 = _ln("layernorm1")
        self.layernorm2 = _ln("layernorm2")
        self.layernorm3 = _ln("layernorm3")
        self.dropout1 = nn.Dropout(self.rate)
        self.dropout2 = nn.Dropout(self.rate)
        self.dropout3 = nn.Dropout(self.rate)

    def __call__(
        self,
        x: jax.Array,
        enc_output: jax.Array,
        look_ahead_mask: Optional[jax.Array],
        padding_mask: Optional[jax.Array],
        deterministic: bool = True,
    ):
        attn1, w1 = self.mha1(q=x, k=x, v=x, mask=look_ahead_mask)
        attn1 = self.dropout1(attn1, deterministic=deterministic)
        out1 = self.layernorm1(attn1 + x).astype(x.dtype)

        attn2, w2 = self.mha2(q=out1, k=enc_output, v=enc_output, mask=padding_mask)
        attn2 = self.dropout2(attn2, deterministic=deterministic)
        out2 = self.layernorm2(attn2 + out1).astype(x.dtype)

        ffn_out = self.dropout3(self.ffn(out2), deterministic=deterministic)
        out3 = self.layernorm3(ffn_out + out2).astype(x.dtype)
        return out3, w1, w2

    # -- KV-cache decode --------------------------------------------------------
    def decode_step(
        self,
        x_t: jax.Array,            # (B, 1, d_model)
        pos: jax.Array,            # scalar int32 — current position
        k_self: jax.Array,         # (B, Lmax, H, D)
        v_self: jax.Array,
        k_cross: jax.Array,        # (B, Lenc, H, D) — precomputed
        v_cross: jax.Array,
        src: Optional[jax.Array] = None,  # (B, Lmax) beam-ancestry rows
    ):
        k_t, v_t = self.mha1.project_kv(x_t)   # (B, 1, H, D)
        k_self = jax.lax.dynamic_update_slice(k_self, k_t, (0, pos, 0, 0))
        v_self = jax.lax.dynamic_update_slice(v_self, v_t, (0, pos, 0, 0))

        # mask cache slots beyond the current position (1.0 = disallow);
        # logits layout is (B, Lmax, H) → mask broadcasts as (1, Lmax, 1)
        max_len = k_self.shape[1]
        idx = jnp.arange(max_len)
        self_mask = (idx > pos).astype(jnp.float32)[None, :, None]

        attn1 = self.mha1.attend_cached(x_t, k_self, v_self, mask=self_mask, src=src)
        out1 = self.layernorm1(attn1 + x_t).astype(x_t.dtype)

        attn2 = self.mha2.attend_cached(out1, k_cross, v_cross, mask=None)
        out2 = self.layernorm2(attn2 + out1).astype(x_t.dtype)

        out3 = self.layernorm3(self.ffn(out2) + out2).astype(x_t.dtype)
        return out3, k_self, v_self


class Decoder(nn.Module):
    num_layers: int
    d_model: int
    num_heads: int
    dff: int
    target_vocab_size: int
    rate: float = 0.1
    max_position: int = 0
    max_seq_len: int = 12
    activation: str = "leaky_relu"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.embedding = nn.Embed(
            self.target_vocab_size, self.d_model,
            embedding_init=_embed_init, dtype=self.dtype, name="embedding",
        )
        self.pos_encoding = raw_positional_encoding(
            self.max_seq_len + self.max_position, self.d_model
        )
        self.dec_layers = [
            DecoderLayer(
                self.d_model, self.num_heads, self.dff, self.rate,
                self.activation, self.dtype, name=f"layer_{i}",
            )
            for i in range(self.num_layers)
        ]
        self.dropout = nn.Dropout(self.rate)

    def __call__(
        self,
        x: jax.Array,                   # (B, L) token ids
        enc_output: jax.Array,          # (B, Lenc, d_model)
        look_ahead_mask: Optional[jax.Array],
        padding_mask: Optional[jax.Array],
        deterministic: bool = True,
    ):
        seq_len = x.shape[1]
        attention_weights: dict[str, jax.Array] = {}

        h = self.embedding(x)  # NOTE: unscaled — reference parity (transformer.py:327)
        h = h + jnp.asarray(self.pos_encoding[np.newaxis, :seq_len, :], h.dtype)
        h = self.dropout(h, deterministic=deterministic)

        for i, layer in enumerate(self.dec_layers):
            h, w1, w2 = layer(h, enc_output, look_ahead_mask, padding_mask, deterministic)
            attention_weights[f"decoder_layer{i + 1}_block1"] = w1
            attention_weights[f"decoder_layer{i + 1}_block2"] = w2
        return h, attention_weights

    # -- KV-cache decode --------------------------------------------------------
    def init_cache(self, enc_output: jax.Array, max_len: int) -> list[dict[str, jax.Array]]:
        """Build the decode cache: zero self-attention K/V of static length
        ``max_len`` plus cross-attention K/V projected once from ``enc_output``."""
        b = enc_output.shape[0]
        h, d = self.num_heads, self.d_model // self.num_heads
        cache = []
        for layer in self.dec_layers:
            k_cross, v_cross = layer.mha2.project_kv(enc_output)
            zeros = jnp.zeros((b, max_len, h, d), dtype=enc_output.dtype)
            cache.append(
                {"k_self": zeros, "v_self": zeros, "k_cross": k_cross, "v_cross": v_cross}
            )
        return cache

    def decode_step(
        self,
        tokens: jax.Array,   # (B,) current token ids
        pos: jax.Array,      # scalar int32 position
        cache: list[dict[str, jax.Array]],
        src: Optional[jax.Array] = None,  # (B, Lmax) beam-ancestry rows
    ):
        h = self.embedding(tokens)[:, None, :]
        pe = jax.lax.dynamic_slice_in_dim(
            jnp.asarray(self.pos_encoding, h.dtype), pos, 1, axis=0
        )
        h = h + pe[None, :, :]

        new_cache = []
        for layer, c in zip(self.dec_layers, cache):
            h, k_self, v_self = layer.decode_step(
                h, pos, c["k_self"], c["v_self"], c["k_cross"], c["v_cross"], src
            )
            new_cache.append(
                {"k_self": k_self, "v_self": v_self,
                 "k_cross": c["k_cross"], "v_cross": c["v_cross"]}
            )
        return h[:, 0, :], new_cache


class Transformer(nn.Module):
    """Top-level seq2seq model (reference ``Transformer`` — ``transformer.py:344-374``).

    Reference calling contract preserved in ``__call__``: when ``training`` the
    first argument is the raw image batch and the encoder runs inside; otherwise it
    is a precomputed encoder output (``transformer.py:359-363``). The decode path
    additionally exposes ``encode`` / ``init_cache`` / ``decode_step`` for the
    scan-based cached decoder.
    """

    num_layers: int
    d_model: int
    num_heads: int
    dff: int
    input_vocab_size: int
    target_vocab_size: int
    rate: float = 0.1
    max_position: int = 0
    max_seq_len: int = 12
    num_pyramids: int = 5
    baseline_index: int = 3
    backbone_name: str = "mobilenet224_1.0"
    n_conv_submodule: int = 2
    activation: str = "leaky_relu"
    remat_encoder: bool = False
    bn_momentum: float | None = None   # None = backbone's Keras-faithful default
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(
            self.num_layers, self.d_model, self.num_heads, self.dff,
            self.input_vocab_size, self.num_pyramids, self.baseline_index,
            self.rate, self.backbone_name, self.n_conv_submodule,
            self.activation, self.remat_encoder,
            bn_momentum=self.bn_momentum, dtype=self.dtype, name="encoder",
        )
        self.decoder = Decoder(
            self.num_layers, self.d_model, self.num_heads, self.dff,
            self.target_vocab_size, self.rate, self.max_position,
            self.max_seq_len, self.activation, self.dtype, name="decoder",
        )
        # Keras Dense default init (reference transformer.py:357 passes none):
        # glorot_uniform, NOT Flax's lecun_normal — at vocab 10000 the
        # variance differs ~10x, a ~3x initial-logit-scale change
        self.final_layer = nn.Dense(
            self.target_vocab_size, dtype=self.dtype, name="final_layer",
            kernel_init=nn.initializers.glorot_uniform(),
        )

    def __call__(
        self,
        inp: jax.Array,                      # image batch (training) or enc_output
        tar: jax.Array,                      # (B, L) token ids
        training: bool,
        look_ahead_mask: Optional[jax.Array],
    ):
        if training:
            enc_output = self.encoder(inp, train=True)
        else:
            enc_output = inp
        dec_output, attention_weights = self.decoder(
            tar, enc_output, look_ahead_mask, None, deterministic=not training
        )
        logits = self.final_layer(dec_output).astype(jnp.float32)
        return logits, attention_weights

    # -- decode-path methods ----------------------------------------------------
    def encode(self, images: jax.Array, train: bool = False) -> jax.Array:
        return self.encoder(images, train=train)

    def encode_from_taps(self, c3, c4, c5, train: bool = False) -> jax.Array:
        """Encode from fused-backbone taps (serving path — the MobileNetV2
        stack runs as Pallas kernels outside flax; see ops/fused_backbone.py)."""
        return self.encoder.from_taps(c3, c4, c5, train=train)

    def init_cache(self, enc_output: jax.Array, max_len: int):
        return self.decoder.init_cache(enc_output, max_len)

    def decode_step(self, tokens: jax.Array, pos: jax.Array, cache: Any,
                    src: Optional[jax.Array] = None):
        h, new_cache = self.decoder.decode_step(tokens, pos, cache, src)
        logits = self.final_layer(h).astype(jnp.float32)
        return logits, new_cache
