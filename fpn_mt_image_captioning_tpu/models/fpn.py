"""Feature Pyramid Network (P3..P7) on backbone taps C3/C4/C5.

Graph port of the reference's ``__create_pyramid_features``
(``/root/reference/models/retinanet.py:105-141``), including its two deviations from
stock RetinaNet that matter for shape/numerics parity:

  * the top-down path upsamples the *reduced* / *merged* maps (pre-output-conv):
    ``P5_upsampled = resize(C5_reduced)``, ``P4_upsampled = resize(P4_merged)``;
  * P6/P7 are built with stride-1 3×3 convs followed by 2× max-pool on
    ``C5_reduced`` / ``P6`` (not stride-2 convs on C5/P6).

All output convs carry ReLU (reference ``activation="relu"`` on P3/P4/P5/P6/P7).
Upsampling is the integral-factor broadcast from ``layers.upsample_like`` — XLA
fuses it into the following conv's input.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import upsample_like

__all__ = ["FPN"]


class FPN(nn.Module):
    feature_size: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, C3: jax.Array, C4: jax.Array, C5: jax.Array):
        # Keras Conv2D default init (reference retinanet.py:118-138 passes
        # none): glorot_uniform, NOT Flax's lecun_normal
        conv = lambda k, name: nn.Conv(
            self.feature_size, (k, k), padding="SAME", dtype=self.dtype,
            name=name, kernel_init=nn.initializers.glorot_uniform(),
        )

        P5_reduced = conv(1, "C5_reduced")(C5)
        P5_upsampled = upsample_like(P5_reduced, C4.shape[1:3])
        P5 = jax.nn.relu(conv(3, "P5")(P5_reduced))

        P4_merged = P5_upsampled + conv(1, "C4_reduced")(C4)
        P4_upsampled = upsample_like(P4_merged, C3.shape[1:3])
        P4 = jax.nn.relu(conv(3, "P4")(P4_merged))

        P3 = jax.nn.relu(conv(3, "P3")(P4_upsampled + conv(1, "C3_reduced")(C3)))

        P6 = jax.nn.relu(conv(3, "P6_conv")(P5_reduced))
        P6 = nn.max_pool(P6, (2, 2), strides=(2, 2), padding="VALID")

        P7 = jax.nn.relu(conv(3, "P7_conv")(P6))
        P7 = nn.max_pool(P7, (2, 2), strides=(2, 2), padding="VALID")

        return [P3, P4, P5, P6, P7]
