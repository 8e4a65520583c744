"""VGG backbone (Flax) — C3/C4/C5 taps for the FPN.

The reference's ``models/vgg.py`` is dead code (missing ``..utils.image`` —
SURVEY.md §2.2); its intended taps are ``block3_pool/block4_pool/block5_pool``
at strides 8/16/32 (``/root/reference/models/vgg.py:97-99``). Working Flax
VGG16/19 (convs + max pools, no BN, Keras layout).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["VGGBackbone"]

_CFG = {
    16: ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3)),
    19: ((64, 2), (128, 2), (256, 4), (512, 4), (512, 4)),
}


class VGGBackbone(nn.Module):
    depth: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        del train  # no batch statistics in VGG
        taps = []
        for bi, (feats, reps) in enumerate(_CFG[self.depth]):
            for ci in range(reps):
                x = jax.nn.relu(
                    nn.Conv(feats, (3, 3), padding="SAME", dtype=self.dtype,
                            name=f"block{bi + 1}_conv{ci + 1}")(x)
                )
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            taps.append(x)
        # block3/4/5 pools → strides 8/16/32
        return taps[2], taps[3], taps[4]
