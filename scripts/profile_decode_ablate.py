"""Where does the fused decoder's per-step time go? Section ablations on-chip.

Runs the kernel at pos=0 (no history — isolates the fixed per-step compute)
and pos=59 (full history) with sections skipped via the `ablate` static arg;
each variant slope-measured. The delta (full - ablated) is the section's cost.

Run:  PYTHONPATH=/root/repo:/root/.axon_site nohup python scripts/profile_decode_ablate.py > /tmp/prof_ablate.log 2>&1 &
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from fpn_mt_image_captioning_tpu.decode.beam_search import cast_for_inference
from fpn_mt_image_captioning_tpu.models.positional import create_masks
from fpn_mt_image_captioning_tpu.models.transformer import Transformer
from fpn_mt_image_captioning_tpu.ops.fused_decoder import (
    fused_decode_step,
    init_fused_cache,
    pack_decoder_weights,
)

BATCH, BEAM, SIZE, MAXLEN, K = 64, 8, 512, 60, 64
NL, D, DFF, H, VOCAB = 6, 512, 2048, 8, 2000


def slope(fn_of_n, k=K):
    def run(n):
        np.asarray(fn_of_n(jnp.int32(n)))
        t0 = time.perf_counter()
        for _ in range(3):
            np.asarray(fn_of_n(jnp.int32(n)))
        return (time.perf_counter() - t0) / 3

    t1, t2 = run(k), run(2 * k)
    return (t2 - t1) / k


def main():
    model = Transformer(
        num_layers=NL, d_model=D, num_heads=H, dff=DFF,
        input_vocab_size=(SIZE // 16) ** 2, target_vocab_size=VOCAB,
        max_seq_len=MAXLEN, dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    tar = jnp.ones((1, 4), jnp.int32)
    variables = model.init({"params": rng, "dropout": rng}, img, tar, True, create_masks(tar))
    variables = cast_for_inference(variables)
    params = variables["params"]

    bk = BATCH * BEAM
    enc = jnp.asarray(
        np.random.default_rng(0).standard_normal((BATCH, 16, D), np.float32) * 0.1,
        jnp.bfloat16,
    )
    packed = pack_decoder_weights(params, NL)
    cache0 = init_fused_cache(packed, enc, BEAM, MAXLEN)
    lpad = cache0["k_self"].shape[1]
    srcT = jnp.broadcast_to(
        (jnp.arange(bk, dtype=jnp.int32) % BEAM)[None, :], (lpad, bk)
    )
    x0 = jnp.asarray(
        np.random.default_rng(1).standard_normal((bk, D), np.float32) * 0.1, jnp.bfloat16
    )
    scores0 = jnp.zeros((bk, 1), jnp.float32)
    fin0 = jnp.zeros((bk, 1), jnp.float32)

    def kernel_loop(pos, ablate):
        @jax.jit
        def f(n, x0, cache0, packed):
            def body(_, carry):
                x, cache, acc = carry
                top_s, top_i, cache = fused_decode_step(
                    packed, cache, x, srcT, jnp.int32(pos), scores0, fin0,
                    num_layers=NL, beam=BEAM, num_heads=H, ablate=ablate,
                )
                s = top_s[:, :BEAM].sum() + x.astype(jnp.float32).sum() * 1e-6
                return x + (s * 1e-30).astype(x.dtype), cache, acc + s

            _, _, acc = jax.lax.fori_loop(0, n, body, (x0, cache0, jnp.float32(0)))
            return acc

        return lambda n: f(n, x0, cache0, packed)

    base = {}
    for pos in (0, 59):
        t = slope(kernel_loop(pos, ""))
        base[pos] = t
        print(f"pos={pos:2d} full              {t*1000:8.3f} ms/step", flush=True)
    for ablate in ("final", "ffn", "cross", "softmax", "softmax,cross,ffn,final"):
        for pos in (0, 59):
            t = slope(kernel_loop(pos, ablate))
            print(
                f"pos={pos:2d} -{ablate:22s} {t*1000:8.3f} ms/step "
                f"(section ~{(base[pos]-t)*1000:6.3f} ms)",
                flush=True,
            )


if __name__ == "__main__":
    main()
