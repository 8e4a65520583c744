"""Spatial co-attention fusion.

Port of the reference's stateless ``CoAttention_CNN``
(``/root/reference/models/coattention.py:9-32``): a 1-channel regression "score"
map is softmaxed over its flattened H×W positions to form spatial attention
weights, which scale the multi-channel classification map elementwise.

Pure function — no parameters — so XLA fuses the softmax + multiply directly into
the surrounding conv pipeline (no kernel needed; the op is bandwidth-trivial at
FPN map sizes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["coattention"]


def coattention(score: jax.Array, hs: jax.Array) -> jax.Array:
    """``score``: (B, H, W, 1) attention logits; ``hs``: (B, H, W, C) features.
    Returns (B, H, W, C) = softmax_{H·W}(score) * hs."""
    b, h, w, _ = score.shape
    weights = jax.nn.softmax(
        score.reshape(b, h * w).astype(jnp.float32), axis=1
    ).astype(hs.dtype)
    return weights.reshape(b, h, w, 1) * hs
