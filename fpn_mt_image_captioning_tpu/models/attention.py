"""Multi-head attention core.

Functionally equivalent to the reference's ``scaled_dot_product_attention`` /
``MultiHeadAttention`` (``/root/reference/models/transformer.py:70-155``), redesigned
for TPU:

  * einsum-based head-split attention (no explicit transposes — XLA picks the
    layout and keeps the contractions on the MXU);
  * softmax accumulated in float32 regardless of compute dtype (bfloat16-safe);
  * a functional KV-cache interface (``project_kv`` + ``attend_cached``) so the
    decode loop can run under ``lax.scan`` with an explicit cache carry, instead of
    the reference's full-prefix re-forward per beam step
    (``/root/reference/utils/pipeline.py:105-112``);
  * a batched ``MultiViewAttention`` module collapsing the reference's four
    per-view MHAs into stacked einsums (one MXU contraction per projection);
    the decode-time hot path is further fused in ``ops/fused_decoder.py``.

Naming note: the reference's call convention is ``mha(v, k, q, mask)`` (v first —
``transformer.py:131``). This framework uses the conventional ``(q, k, v)`` order;
call sites are mapped accordingly and parity-tested.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import he_normal, stacked_he_normal

__all__ = ["scaled_dot_product_attention", "MultiHeadAttention", "MultiViewAttention"]

NEG_INF_SCALE = -1e9  # reference parity: logits += mask * -1e9 (transformer.py:95)


def scaled_dot_product_attention(
    q: jax.Array,  # (..., Lq, D)
    k: jax.Array,  # (..., Lk, D)
    v: jax.Array,  # (..., Lk, Dv)
    mask: Optional[jax.Array] = None,  # broadcastable to (..., Lq, Lk); 1.0 = disallow
):
    """Reference-parity attention: returns (output, attention_weights)."""
    dk = k.shape[-1]
    logits = jnp.einsum("...qd,...kd->...qk", q, k) / jnp.sqrt(jnp.float32(dk)).astype(q.dtype)
    if mask is not None:
        logits = logits + (mask * NEG_INF_SCALE).astype(logits.dtype)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("...qk,...kd->...qd", weights, v)
    return out, weights


def _view_groups(lengths: list[int], solo_tokens: int = 512) -> list[list[int]]:
    """Static grouping of views for batched attention: views with ≥solo_tokens
    keys run solo (unpadded); the rest are stacked padded to their common max
    (small views, so the padding FLOPs are negligible but the op count drops)."""
    solo = [i for i, l in enumerate(lengths) if l >= solo_tokens]
    rest = [i for i, l in enumerate(lengths) if l < solo_tokens]
    return [[i] for i in solo] + ([rest] if rest else [])


class MultiViewAttention(nn.Module):
    """Multi-view cross-attention — the UMV encoder layer's per-view MHAs
    (reference ``transformer.py:162,:186-190``) residual-summed into the
    baseline stream, computed in *transposed-projection* form.

    With only ``Lq = 16`` baseline queries, materializing per-view K/V tensors
    is pure waste: O(L·d²) projection FLOPs plus an (L, d) HBM round-trip per
    view per layer. Instead the key/value projections are folded into the tiny
    query side:

        logits_v = ((q_v·Wk_vᵀ)/√Dh) · x_vᵀ + q_v·bk_v     (x_v = raw view tokens)
        ctx_v    = (softmax(logits_v) · x_v) Wv_v + bv_v    (softmax rows sum to 1,
                                                             so the value bias adds
                                                             directly)

    so the only large contractions are (B, Lv, d) × (B, d, H·Lq) — O(L·d·H·Lq)
    — and no K/V is ever written. Same parameters, same math as the reference's
    per-view ``MultiHeadAttention`` stack, just re-associated for the TPU: the
    big einsums keep the MXU busy, everything else is 16-token-sized.
    """

    num_views: int
    d_model: int
    num_heads: int
    rate: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        baseline: jax.Array,             # (B, Lq, d_model)
        sources: list[jax.Array],        # V arrays (B, Lv, d_model), raw tokens
        kv_w: jax.Array,                 # (V, d, 2d) — [Wk | Wv] per view
        kv_b: jax.Array,                 # (V, 2d)    — [bk | bv] per view
        deterministic: bool = True,
    ) -> jax.Array:
        V, d, H = self.num_views, self.d_model, self.num_heads
        assert len(sources) == V, (len(sources), V)
        Dh = d // H
        dt = self.dtype
        wq = self.param("wq", stacked_he_normal(1), (V, d, d), self.param_dtype)
        bq = self.param("bq", nn.initializers.zeros, (V, d), self.param_dtype)
        wo = self.param("wo", stacked_he_normal(1), (V, d, d), self.param_dtype)
        bo = self.param("bo", nn.initializers.zeros, (V, d), self.param_dtype)

        b, lq, _ = baseline.shape
        q = jnp.einsum("bqd,vde->vbqe", baseline, wq.astype(dt))
        q = (q + bq.astype(dt)[:, None, None, :]).reshape(V, b, lq, H, Dh)

        wk = kv_w[..., :d].reshape(V, d, H, Dh).astype(dt)
        wv = kv_w[..., d:].reshape(V, d, H, Dh).astype(dt)
        bk = kv_b[..., :d].reshape(V, H, Dh).astype(dt)
        bv = kv_b[..., d:].reshape(V, H, Dh).astype(dt)

        scale = jnp.asarray(1.0 / np.sqrt(Dh), dt)
        qx = jnp.einsum("vdhe,vbqhe->vbdhq", wk, q) * scale  # q in x-space
        qb = jnp.einsum("vbqhe,vhe->vbhq", q, bk) * scale    # key-bias logit term

        ctx: list[Any] = [None] * V
        for group in _view_groups([s.shape[1] for s in sources]):
            if len(group) == 1:
                vi = group[0]
                x = sources[vi]
                logits = jnp.einsum("bld,bdhq->bhql", x, qx[vi]) + qb[vi][..., None]
                w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dt)
                cx = jnp.einsum("bhql,bld->bhqd", w, x)
                ctx[vi] = jnp.einsum("bhqd,dhe->bqhe", cx, wv[vi]) + bv[vi][None, None]
            else:
                lmax = max(sources[i].shape[1] for i in group)
                xs = jnp.stack([
                    jnp.pad(sources[i], ((0, 0), (0, lmax - sources[i].shape[1]), (0, 0)))
                    for i in group
                ])
                pad_mask = jnp.stack([
                    (jnp.arange(lmax) >= sources[i].shape[1]).astype(jnp.float32)
                    for i in group
                ])
                logits = jnp.einsum("gbld,gbdhq->gbhql", xs, qx[jnp.asarray(group)])
                logits = logits + qb[jnp.asarray(group)][..., None]
                logits = logits + (pad_mask[:, None, None, None, :] * NEG_INF_SCALE).astype(dt)
                w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dt)
                cx = jnp.einsum("gbhql,gbld->gbhqd", w, xs)
                c = jnp.einsum("gbhqd,gdhe->gbqhe", cx, wv[jnp.asarray(group)])
                c = c + bv[jnp.asarray(group)][:, None, None]
                for gi, vi in enumerate(group):
                    ctx[vi] = c[gi]

        outs = jnp.stack([c.reshape(b, lq, d) for c in ctx])  # (V, B, Lq, d)
        outs = jnp.einsum("vbqd,vde->vbqe", outs, wo.astype(dt))
        outs = outs + bo.astype(dt)[:, None, None, :]
        outs = nn.Dropout(self.rate)(outs, deterministic=deterministic)  # per-view iid
        return outs.sum(axis=0)  # (B, Lq, d_model)


class MultiHeadAttention(nn.Module):
    """Multi-head attention with separate q/k/v/out projections (he_normal init,
    matching reference KERNEL_INITIALIZER — ``common/common_definitions.py:15``)."""

    d_model: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert self.d_model % self.num_heads == 0
        self.depth = self.d_model // self.num_heads
        dense = lambda name: nn.Dense(
            self.d_model,
            kernel_init=he_normal(),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name=name,
        )
        self.wq = dense("wq")
        self.wk = dense("wk")
        self.wv = dense("wv")
        self.dense = dense("out")

    def _split(self, x: jax.Array) -> jax.Array:
        b, l, _ = x.shape
        return x.reshape(b, l, self.num_heads, self.depth)

    # -- full (training / teacher-forced) path ---------------------------------
    def __call__(
        self,
        q: jax.Array,  # (B, Lq, d_model)
        k: jax.Array,  # (B, Lk, d_model)
        v: jax.Array,  # (B, Lk, d_model)
        mask: Optional[jax.Array] = None,  # (B, 1|H, Lq|1, Lk)
    ):
        qh = self._split(self.wq(q))  # (B, Lq, H, D)
        kh = self._split(self.wk(k))
        vh = self._split(self.wv(v))

        scale = jnp.asarray(1.0 / jnp.sqrt(self.depth), qh.dtype)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * scale
        if mask is not None:
            logits = logits + (mask * NEG_INF_SCALE).astype(logits.dtype)
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(qh.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", weights, vh)
        ctx = ctx.reshape(q.shape[0], q.shape[1], self.d_model)
        return self.dense(ctx), weights

    # -- KV-cache decode path ---------------------------------------------------
    def project_kv(self, x: jax.Array):
        """Project keys/values once — used to prefill self/cross caches.
        Returns (k, v) of shape (B, L, H, D)."""
        return self._split(self.wk(x)), self._split(self.wv(x))

    def attend_cached(
        self,
        q: jax.Array,          # (B, 1, d_model) — single decode position
        k_cache: jax.Array,    # (B, Lmax, H, D)
        v_cache: jax.Array,    # (B, Lmax, H, D)
        mask: Optional[jax.Array] = None,  # broadcastable to (B, Lmax, 1); 1.0 = disallow
        src: Optional[jax.Array] = None,   # (B, Lmax) int32 — lazy beam-ancestry rows
    ) -> jax.Array:
        """Single-position cached attention, formulated as fused VPU
        multiply-reduce (M=1 matmuls waste the MXU; the elementwise form lets XLA
        fuse the optional ancestry gather into the K/V reads, so beam-search
        reordering costs zero cache rewrites — see decode/beam_search.py).
        """
        b = q.shape[0]
        qh = self._split(self.wq(q))[:, 0]  # (B, H, D)
        if src is not None:
            idx = src[:, :, None, None]
            k_cache = jnp.take_along_axis(k_cache, idx, axis=0)
            v_cache = jnp.take_along_axis(v_cache, idx, axis=0)
        scale = jnp.asarray(1.0 / jnp.sqrt(self.depth), qh.dtype)
        # logits[b, l, h] = q[b, h, :] · k_cache[b, l, h, :]
        logits = (qh[:, None, :, :] * k_cache).sum(-1).astype(jnp.float32) * scale.astype(jnp.float32)
        if mask is not None:
            logits = logits + (mask * NEG_INF_SCALE).astype(logits.dtype)
        weights = jax.nn.softmax(logits, axis=1).astype(qh.dtype)  # (B, Lmax, H)
        ctx = (weights[..., None] * v_cache).sum(1)  # (B, H, D)
        ctx = ctx.reshape(b, 1, self.d_model)
        return self.dense(ctx)
