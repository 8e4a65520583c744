"""Sinusoidal positional encodings and attention masks.

Numerical parity with the reference's numpy PE (``/root/reference/models/transformer.py:22-43``)
and mask builders (``transformer.py:46-67``). PEs are computed host-side in float64
numpy then cast — identical to the reference — and baked into the jitted graph as
constants.

Mask convention (reference parity): masks are *float* tensors with 1.0 at
**disallowed** positions; they enter attention as ``logits += mask * -1e9``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = [
    "raw_positional_encoding",
    "positional_encoding",
    "create_padding_mask",
    "create_look_ahead_mask",
    "create_masks",
]


def _get_angles(pos: np.ndarray, i: np.ndarray, d_model: int) -> np.ndarray:
    angle_rates = 1 / np.power(10000, (2 * (i // 2)) / np.float32(d_model))
    return pos * angle_rates


def raw_positional_encoding(position: int, d_model: int) -> np.ndarray:
    """(position, d_model) float32 sinusoidal table — sin on even dims, cos on odd."""
    angle_rads = _get_angles(
        np.arange(position)[:, np.newaxis],
        np.arange(d_model)[np.newaxis, :],
        d_model,
    )
    angle_rads[:, 0::2] = np.sin(angle_rads[:, 0::2])
    angle_rads[:, 1::2] = np.cos(angle_rads[:, 1::2])
    return angle_rads.astype(np.float32)


def positional_encoding(position: int, d_model: int) -> np.ndarray:
    """(1, position, d_model) — batch-broadcastable table."""
    return raw_positional_encoding(position, d_model)[np.newaxis, ...]


def create_padding_mask(seq: jnp.ndarray) -> jnp.ndarray:
    """(B, L) token ids → (B, 1, 1, L) float mask, 1.0 where pad (id == 0)."""
    mask = (seq == 0).astype(jnp.float32)
    return mask[:, jnp.newaxis, jnp.newaxis, :]


def create_look_ahead_mask(size: int) -> jnp.ndarray:
    """(L, L) float mask, 1.0 strictly above the diagonal (future positions)."""
    return 1.0 - jnp.tril(jnp.ones((size, size), dtype=jnp.float32))


def create_masks(tar: jnp.ndarray) -> jnp.ndarray:
    """Decoder self-attention mask: max(padding, look-ahead) → (B, 1, L, L)."""
    look_ahead_mask = create_look_ahead_mask(tar.shape[1])
    dec_target_padding_mask = create_padding_mask(tar)
    return jnp.maximum(dec_target_padding_mask, look_ahead_mask)
