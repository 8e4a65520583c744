"""Loss functions.

* ``masked_sparse_ce`` — the live training loss: sparse categorical cross-entropy
  from logits with padding positions zeroed, averaged over **all** positions
  (including masked ones in the denominator) — exact parity with the reference's
  ``Pipeline.loss`` (``/root/reference/utils/pipeline.py:50-57``, which multiplies
  by the mask then takes ``reduce_mean`` over the full tensor).

* ``focal_loss`` / ``smooth_l1_loss`` — working detection losses. The reference
  ships a broken ``losses.py`` (imports a nonexistent ``backend`` module —
  SURVEY.md §2.2); these are functional TPU-friendly equivalents of the focal /
  smooth-L1 pair RetinaNet training would need, provided for component parity.

All reductions accumulate in float32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["masked_sparse_ce", "focal_loss", "smooth_l1_loss", "weighted_mse_loss"]


def masked_sparse_ce(real: jax.Array, logits: jax.Array) -> jax.Array:
    """``real``: (B, L) int token ids; ``logits``: (B, L, V) float.
    Padding (id 0) contributes zero loss but still counts in the mean — reference
    parity (``utils/pipeline.py:50-57``).

    The denominator counts only rows holding a real caption (any nonzero
    token): identical to ``jnp.mean`` on reference-shaped batches, but the
    all-zero rows a mesh tail-batch pad appends (``Pipeline._pad_batch``) do
    not dilute the loss/gradients — a padded 3-real-row step optimizes exactly
    like the unpadded one."""
    logits = logits.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(log_probs, real[..., None].astype(jnp.int32), axis=-1)[..., 0]
    mask = (real != 0).astype(ce.dtype)
    real_rows = jnp.sum(jnp.any(real != 0, axis=-1).astype(ce.dtype))
    denom = jnp.maximum(real_rows, 1.0) * real.shape[-1]
    return jnp.sum(ce * mask) / denom


def focal_loss(
    labels: jax.Array,     # (..., num_classes) one-hot {0,1}; -1 rows = ignore
    logits: jax.Array,     # (..., num_classes)
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jax.Array:
    """RetinaNet focal loss (sigmoid), normalized by the positive count."""
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    valid = (labels >= 0).astype(jnp.float32)
    labels = jnp.clip(labels, 0.0, 1.0)
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(labels, logits)
    alpha_t = labels * alpha + (1.0 - labels) * (1.0 - alpha)
    p_t = labels * p + (1.0 - labels) * (1.0 - p)
    loss = alpha_t * jnp.power(1.0 - p_t, gamma) * ce * valid
    normalizer = jnp.maximum(jnp.sum(labels * valid), 1.0)
    return jnp.sum(loss) / normalizer


def optax_sigmoid_ce(labels: jax.Array, logits: jax.Array) -> jax.Array:
    # numerically stable sigmoid cross-entropy
    return jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def weighted_mse_loss(
    target: jax.Array, pred: jax.Array, light_background: bool = True
) -> jax.Array:
    """Brightness-weighted MSE (reference ``utils/utils.py:93-117``): per-pixel
    squared error weighted by 1 + normalized darkness (or brightness), summed —
    darker regions attract more loss when ``light_background``."""
    target = target.astype(jnp.float32)
    pred = pred.astype(jnp.float32)
    err = jnp.mean(jnp.square(target - pred), axis=-1)
    avg_pred = jnp.mean(pred, axis=-1)
    min_val = jnp.min(avg_pred)
    max_val = jnp.max(avg_pred)
    norm = (avg_pred - min_val) / jnp.maximum(max_val - min_val, 1e-12)
    ratio = (1.0 - norm) + 1.0 if light_background else norm + 1.0
    return jnp.sum(ratio * err)


def smooth_l1_loss(
    targets: jax.Array, preds: jax.Array, sigma: float = 3.0
) -> jax.Array:
    """Smooth-L1 (Huber) regression loss with RetinaNet's sigma parameterization."""
    sigma2 = sigma * sigma
    diff = jnp.abs(preds.astype(jnp.float32) - targets.astype(jnp.float32))
    loss = jnp.where(diff < 1.0 / sigma2, 0.5 * sigma2 * diff * diff, diff - 0.5 / sigma2)
    return jnp.mean(loss)
