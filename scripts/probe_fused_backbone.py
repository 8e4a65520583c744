"""Probe: run each fused inverted-residual block standalone on the real chip
to find which Mosaic lowering fails (bench.py reported `MosaicError` and fell
back to the XLA backbone).

Fake folded weights are built straight from _BLOCK_CONFIG — no flax init, no
big compiles. Each block is probed at its true 512-input spatial size with a
small batch (lowering failures are shape-dependent, not batch-dependent).

Run:  nohup python scripts/probe_fused_backbone.py > /tmp/probe_fb.log 2>&1 &
"""

from __future__ import annotations

import sys
import traceback

import jax.numpy as jnp
import numpy as np

from fpn_mt_image_captioning_tpu.models.backbones.mobilenet_v2 import (
    _BLOCK_CONFIG,
    make_divisible,
)
from fpn_mt_image_captioning_tpu.ops.fused_backbone import (
    _round_up,
    fused_ir_block,
    pad_to_bordered,
)

BATCH = 2
DTYPE = jnp.bfloat16


def fake_block(cin, cexp, cout, has_expand):
    rng = np.random.default_rng(0)
    cin_p = _round_up(cin, 128)
    dw_p = cexp if has_expand else cin_p
    cout_p = _round_up(cout, 128)
    blk = {
        "w_dw": jnp.asarray(rng.standard_normal((16, dw_p)) * 0.1, jnp.float32),
        "b_dw": jnp.zeros((1, dw_p), jnp.float32),
        "w_proj": jnp.asarray(rng.standard_normal((dw_p, cout_p)) * 0.05, DTYPE),
        "b_proj": jnp.zeros((1, cout_p), jnp.float32),
    }
    if has_expand:
        blk["w_exp"] = jnp.asarray(rng.standard_normal((cin_p, cexp)) * 0.05, DTYPE)
        blk["b_exp"] = jnp.zeros((1, cexp), jnp.float32)
    return blk


def main():
    alpha = 1.0
    h = 256  # after the stride-2 stem on a 512 input
    cin = make_divisible(32 * alpha)
    rng = np.random.default_rng(1)

    bi_flat = 0
    for gi, (t, c, n, s) in enumerate(_BLOCK_CONFIG):
        cout = make_divisible(c * alpha)
        for bi in range(n):
            stride = s if bi == 0 else 1
            cexp = cin * t
            has_expand = t != 1
            residual = stride == 1 and cin == cout
            wp = _round_up(h + 2, 16)
            x = jnp.asarray(
                rng.standard_normal((BATCH, h, h, cin)) * 0.3, DTYPE
            )
            xb = pad_to_bordered(x, c_pad=_round_up(cin, 128))
            tag = (
                f"block_{gi}_{bi} flat={bi_flat} h={h} cin={cin} cexp={cexp} "
                f"cout={cout} stride={stride} res={residual}"
            )
            try:
                y = fused_ir_block(
                    xb, fake_block(cin, cexp, cout, has_expand),
                    stride=stride, h_in=h, w_in=h, residual=residual,
                )
                np.asarray(y)
                print(f"OK    {tag}", flush=True)
            except Exception as e:
                print(f"FAIL  {tag}", flush=True)
                traceback.print_exc(file=sys.stdout)
                print("", flush=True)
            if stride == 2:
                h //= 2
            cin = cout
            bi_flat += 1


if __name__ == "__main__":
    main()
