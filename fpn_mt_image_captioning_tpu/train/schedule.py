"""Learning-rate schedules and the optimizer stack.

* ``custom_schedule`` — the reference's modified-Noam schedule
  (``/root/reference/utils/utils.py:35-50``):

      lr(step) = rsqrt(d) * min( rsqrt(step) / max((step - w)/(2w), 1),
                                 step * w^-1.5 )

  i.e. Noam warmup with an extra post-warmup decay accelerator. The reference
  constructs it with **dff** (2048) rather than d_model (512) — a quirk kept
  behind ``Config.schedule_uses_dff`` (``utils/pipeline.py:29``).

* ``custom_schedule_rough`` — the reference's 3-segment piecewise schedule
  (``utils/utils.py:53-86``), off the live path but part of the inventory.

* ``make_optimizer`` — AMSGrad Adam (β=(0.9, 0.98), ε=1e-9) with **per-variable**
  gradient-norm clipping to 1.0, matching Keras ``clipnorm`` semantics (clip each
  tensor independently, not the global norm — ``utils/pipeline.py:30``).

* ``keras_adam`` — the Adam/AMSGrad update in Keras's EXACT formulation
  (bias corrections folded into a per-step ``alpha``; the AMSGrad max taken
  over the UNCORRECTED second moment; ``eps`` added to the uncorrected
  ``sqrt(v_hat)``; the lr schedule evaluated at the PRE-increment step
  count). optax's ``amsgrad`` maxes over the bias-corrected moment and adds
  eps after correction — close but measurably different: in the round-4
  cross-framework trajectory probe the optax form drifted to 1.4% loss delta
  by step 6, the Keras form tracks the reference's own training loop.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Union

import jax
import jax.numpy as jnp
import optax

__all__ = [
    "custom_schedule", "custom_schedule_rough", "clip_by_per_variable_norm",
    "keras_adam", "make_optimizer",
]


def custom_schedule(d_model: int, warmup_steps: int = 4000, multiplier: float = 1.0):
    d = jnp.float32(d_model)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        arg1 = jax.lax.rsqrt(step) / jnp.maximum(
            (step - warmup_steps) * multiplier / (warmup_steps * 2), 1.0
        )
        arg2 = step * (warmup_steps ** -1.5)
        return jax.lax.rsqrt(d) * jnp.minimum(arg1, arg2)

    return schedule


def custom_schedule_rough(
    ratio_x1: float = 5, ratio_x2: float = 2, ratio_x3: float = 3,
    ratio_y1: float = 1, ratio_y2: float = 0.05, ratio_y3: float = 0.01,
    max_epoch: int = 50, max_lr: float = 1e-4,
):
    s = ratio_x1 + ratio_x2 + ratio_x3
    x1 = max_epoch * ratio_x1 // s
    x2 = max_epoch * ratio_x2 // s
    x3 = max_epoch * ratio_x3 // s
    y1, y2, y3 = max_lr * ratio_y1, max_lr * ratio_y2, max_lr * ratio_y3

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        seg1 = -(y1 / x1**2) * jnp.square(step) + 2 * y1 / x1 * step
        seg2 = (y2 - y1) / (x2 - x1) * (step - x1) + y1
        seg3 = (y3 - y2) / (x3 - x2) * (step - x2) + y2
        return jnp.where(step <= x1, seg1, jnp.where(step <= x2, seg2, seg3))

    return schedule


def clip_by_per_variable_norm(max_norm: float) -> optax.GradientTransformation:
    """Keras ``clipnorm`` parity: clip each gradient leaf to ``max_norm`` by its
    own L2 norm (optax's ``clip_by_global_norm`` clips the joint norm instead)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def clip(g):
            norm = jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32))))
            scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
            return (g * scale).astype(g.dtype)

        return jax.tree.map(clip, updates), state

    return init_fn, update_fn


class KerasAdamState(NamedTuple):
    count: jax.Array
    m: Any
    v: Any
    vhat: Any  # AMSGrad running max of the uncorrected v (zeros-shaped if off)


def keras_adam(
    learning_rate: Union[float, Callable],
    b1: float = 0.9, b2: float = 0.98, eps: float = 1e-9,
    amsgrad: bool = True,
) -> optax.GradientTransformation:
    """Adam/AMSGrad exactly as Keras computes it (keras Adam ``update_step``):

        t      = count + 1
        alpha  = lr(count) * sqrt(1 - b2^t) / (1 - b1^t)
        m     += (g - m) * (1 - b1)
        v     += (g² - v) * (1 - b2)
        v_hat  = max(v_hat, v)                    (amsgrad; uncorrected v)
        update = -(m * alpha) / (sqrt(v_hat) + eps)

    Matches reference training step-for-step (``utils/pipeline.py:30``) —
    note the schedule is evaluated at the PRE-increment count (Keras passes
    ``self.iterations``), so the first step runs at lr(0)."""

    def init_fn(params):
        zeros = lambda: jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), params)
        return KerasAdamState(
            count=jnp.zeros([], jnp.int32), m=zeros(), v=zeros(), vhat=zeros()
        )

    def update_fn(updates, state, params=None):
        del params
        t = (state.count + 1).astype(jnp.float32)
        lr = learning_rate(state.count) if callable(learning_rate) else learning_rate
        alpha = (
            jnp.asarray(lr, jnp.float32)
            * jnp.sqrt(1.0 - jnp.float32(b2) ** t)
            / (1.0 - jnp.float32(b1) ** t)
        )
        g32 = jax.tree.map(lambda g: g.astype(jnp.float32), updates)
        m = jax.tree.map(lambda m, g: m + (g - m) * (1.0 - b1), state.m, g32)
        v = jax.tree.map(lambda v, g: v + (g * g - v) * (1.0 - b2), state.v, g32)
        if amsgrad:
            vhat = jax.tree.map(jnp.maximum, state.vhat, v)
            denom_v = vhat
        else:
            vhat = state.vhat
            denom_v = v
        new_updates = jax.tree.map(
            lambda m, dv, g: (-(m * alpha) / (jnp.sqrt(dv) + eps)).astype(g.dtype),
            m, denom_v, updates,
        )
        return new_updates, KerasAdamState(state.count + 1, m, v, vhat)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    learning_rate, b1: float = 0.9, b2: float = 0.98, eps: float = 1e-9,
    clipnorm: float | None = 1.0,
) -> optax.GradientTransformation:
    """AMSGrad Adam + per-variable clipnorm (reference ``utils/pipeline.py:30``),
    in Keras's exact update formulation (see ``keras_adam``) — trajectory-
    matched against the actual reference training loop (tests/test_tf_parity.py)."""
    parts = []
    if clipnorm is not None:
        parts.append(optax.GradientTransformation(*clip_by_per_variable_norm(clipnorm)))
    parts.append(keras_adam(learning_rate, b1=b1, b2=b2, eps=eps, amsgrad=True))
    return optax.chain(*parts)
