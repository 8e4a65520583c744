"""Decode-side timing on the real chip (batch 64, beam 8, flagship dims).

Splits the per-token decode cost into:
  * fused kernel alone, at position 0 / mid / last (KV-history DMA and the
    ancestry/one-hot matmuls scale with valid positions);
  * full beam-search step (kernel + XLA bookkeeping: embedding+PE, top-k over
    (B, K*Vp), ancestry/seq remaps, finished bookkeeping);
so (full step) - (kernel) = the XLA bookkeeping overhead that whole-loop
kernelization would remove.

Methodology as scripts/profile_encode.py: K vs 2K rounds inside one jit with a
sub-resolution data dependency; per-round cost is the slope, so the ~30ms
host<->device tunnel round-trip cancels.

Run:  nohup python scripts/profile_decode.py > /tmp/prof_decode.log 2>&1 &
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from fpn_mt_image_captioning_tpu.decode.beam_search import beam_search, cast_for_inference
from fpn_mt_image_captioning_tpu.models.positional import create_masks
from fpn_mt_image_captioning_tpu.models.transformer import Transformer
from fpn_mt_image_captioning_tpu.ops.fused_decoder import (
    fused_decode_step,
    init_fused_cache,
    pack_decoder_weights,
)

BATCH, BEAM, SIZE, MAXLEN, K = 64, 8, 512, 60, 64
TILE = int(__import__('os').environ.get('PROF_TILE', '128'))
NL, D, DFF, H, VOCAB = 6, 512, 2048, 8, 2000


def slope(fn_of_n, k=K):
    def run(n):
        np.asarray(fn_of_n(jnp.int32(n)))  # warm/compile on first use
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

    # ---- kernel-only at fixed positions --------------------------------------
    # weights/cache are runtime args, NOT closure constants: baked-in constants
    # push the HLO past the tunnel's ~100MB upload cap (HTTP 413)
    def kernel_loop(pos):
        @jax.jit
        def f(n, x0, cache0, packed):
            def body(_, carry):
                x, cache, acc = carry
                top_s, top_i, cache = fused_decode_step(
                    packed, cache, x, srcT, jnp.int32(pos), scores0, fin0,
                    num_layers=NL, beam=BEAM, num_heads=H, tile=TILE,
                )
                s = top_s[:, :BEAM].sum() + top_i[:, :BEAM].sum().astype(jnp.float32)
                return x + (s * 1e-30).astype(x.dtype), cache, acc + s

            _, _, acc = jax.lax.fori_loop(0, n, body, (x0, cache0, jnp.float32(0)))
            return acc

        return lambda n: f(n, x0, cache0, packed)

    for pos in (0, 30, 59):
        t = slope(kernel_loop(pos))
        print(f"kernel tile={TILE} pos={pos:2d}  {t*1000:8.3f} ms/step", flush=True)

    if TILE != 128:  # tile sweep probes skip the (tile-128) full-round measure
        return

    # ---- full beam-search rounds (60 steps incl. XLA bookkeeping) ------------
    @jax.jit
    def decode_rounds_fn(n, enc_in, vs):
        def body(_, carry):
            e, acc = carry
            seqs, lengths, _ = beam_search(
                model, vs, e,
                beam_n=BEAM, max_len=MAXLEN, start_token=1, end_token=VOCAB - 1,
                fused=True,
            )
            s = (seqs.sum() + lengths.sum()).astype(jnp.float32)
            return e + (s * 1e-30).astype(e.dtype), acc + s

        _, acc = jax.lax.fori_loop(0, n, body, (enc_in, jnp.float32(0)))
        return acc

    t_round = slope(lambda n: decode_rounds_fn(n, enc, variables), k=4)
    print(f"beam_search round     {t_round*1000:8.3f} ms ({t_round/MAXLEN*1e6:.0f} us/step)", flush=True)
    print(f"  -> XLA bookkeeping ~ {(t_round/MAXLEN)*1000 - 0:8.3f} ms/step minus kernel avg above", flush=True)


if __name__ == "__main__":
    main()
