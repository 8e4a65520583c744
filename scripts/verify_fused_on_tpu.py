"""On-chip fused-vs-XLA decode parity check (run on a real TPU).

The interpreter-mode tests (tests/test_fused_decoder.py, test_fused_beam.py)
pin the fused kernel's MATH against the XLA decode path, but they execute the
kernel body through XLA-on-CPU — they cannot catch a Mosaic lowering bug that
only manifests in the real TPU compilation. This script closes that gap, in
two phases on the chip at flagship model dims:

1. **Step probe** — one ``fused_decode_step`` vs the XLA ``decode_step`` math
   from identical state; reports max|Δ| on the per-row top-k scores. This is
   the decisive numeric: ~1e-5 relative = accumulation-order noise, anything
   large = a real lowering bug.
2. **Engine run** — the full beam-search engine twice (``fused=True`` vs
   ``fused=False``) from the same encoder output, demanding identical
   sequences and lengths.

Both phases pack the fused weights at float32 (``beam_search(pack_dtype=...)``)
— the production default packs bf16 for speed, which legitimately flips
beam choices vs the f32 XLA path, so a bf16-pack comparison says nothing
about lowering correctness (round-3 lesson: the first version of this script
compared f32-XLA vs bf16-fused and "failed").

    python scripts/verify_fused_on_tpu.py          # ~3 remote compiles
    python scripts/verify_fused_on_tpu.py --tiny   # CPU smoke (XLA-vs-XLA only)

Prints one JSON line per phase. Result of record: CLAUDE.md "Round 3
additions".
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def step_probe(model, variables, enc, batch, beam, max_len):
    """One decode step at t=0, fused (f32 pack) vs XLA, numeric comparison."""
    from fpn_mt_image_captioning_tpu.models.positional import raw_positional_encoding
    from fpn_mt_image_captioning_tpu.models.transformer import Transformer
    from fpn_mt_image_captioning_tpu.ops.fused_decoder import (
        fused_decode_step,
        init_fused_cache,
        pack_decoder_weights,
    )

    params = variables["params"]
    bk = batch * beam
    start = jnp.full((bk,), 1, jnp.int32)

    def fused_scores(variables, enc):
        packed = pack_decoder_weights(params, model.num_layers, dtype=jnp.float32)
        cache = init_fused_cache(packed, enc, beam, max_len)
        lpad = cache["k_self"].shape[1]
        pe = raw_positional_encoding(
            model.max_seq_len + model.max_position, model.d_model
        ).astype(jnp.float32)
        x_emb = jnp.take(
            params["decoder"]["embedding"]["embedding"].astype(jnp.float32),
            start, axis=0,
        ) + pe[0][None, :]
        src_t = jnp.broadcast_to(
            (jnp.arange(bk, dtype=jnp.int32) % beam)[None, :], (lpad, bk)
        )
        top_s, top_i, _ = fused_decode_step(
            packed, cache, x_emb, src_t, jnp.int32(0),
            jnp.zeros((bk, 1), jnp.float32), jnp.zeros((bk, 1), jnp.float32),
            num_layers=model.num_layers, beam=beam,
            num_heads=model.num_heads, topk=beam,
        )
        return top_s[:, :beam], top_i[:, :beam]

    def xla_scores(variables, enc):
        enc_tiled = jnp.repeat(enc, beam, axis=0)
        cache = model.apply(
            variables, enc_tiled, max_len + 1, method=Transformer.init_cache
        )
        src = jnp.broadcast_to(
            jnp.arange(bk, dtype=jnp.int32)[:, None], (bk, max_len + 1)
        )
        logits, _ = model.apply(
            variables, start, jnp.int32(0), cache, src,
            method=Transformer.decode_step,
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return jax.lax.top_k(logp, beam)

    f_s, f_i = jax.jit(fused_scores)(variables, enc)
    x_s, x_i = jax.jit(xla_scores)(variables, enc)
    f_s, f_i, x_s, x_i = (np.asarray(a) for a in (f_s, f_i, x_s, x_i))
    max_abs = float(np.max(np.abs(f_s - x_s)))
    idx_match = bool(np.array_equal(f_i, x_i))
    print(json.dumps({
        "phase": "step_probe", "max_abs_score_delta": max_abs,
        "topk_indices_match": idx_match,
        "fused_top1": float(f_s[0, 0]), "xla_top1": float(x_s[0, 0]),
    }), flush=True)
    return max_abs < 1e-3 and idx_match


def main():
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    tiny = "--tiny" in sys.argv
    if tiny:
        image_size, vocab, max_len, dims, batch, beam = 256, 200, 8, (2, 64, 128, 4), 2, 2
    else:
        image_size, vocab, max_len, dims, batch, beam = 512, 2000, 20, (6, 512, 2048, 8), 8, 8

    from bench import build
    from fpn_mt_image_captioning_tpu.decode.beam_search import beam_search
    from fpn_mt_image_captioning_tpu.models.transformer import Transformer

    model, variables = build(image_size, vocab, max_len, dims, "float32")
    on_tpu = jax.default_backend() == "tpu"

    rng = np.random.default_rng(7)
    images = jnp.asarray(
        rng.standard_normal((batch, image_size, image_size, 3), dtype=np.float32) * 0.5
    )
    enc = jax.jit(
        lambda v, x: model.apply(v, x, train=False, method=Transformer.encode)
    )(variables, images)

    step_ok = True
    if on_tpu:
        step_ok = step_probe(model, variables, enc, batch, beam, max_len)

    def decode(fused):
        fn = jax.jit(
            lambda v, e: beam_search(
                model, v, e, beam_n=beam, max_len=max_len,
                start_token=1, end_token=vocab - 1, fused=fused,
                pack_dtype=jnp.float32,
            )[:2]
        )
        seqs, lengths = fn(variables, enc)
        return np.asarray(seqs), np.asarray(lengths)

    xla_seqs, xla_len = decode(fused=False)
    if on_tpu:
        fused_seqs, fused_len = decode(fused=True)
    else:
        # no TPU: XLA-vs-XLA determinism sanity so --tiny still exercises the path
        fused_seqs, fused_len = decode(fused=False)

    seq_match = bool(np.array_equal(xla_seqs, fused_seqs))
    len_match = bool(np.array_equal(xla_len, fused_len))
    mismatch_rows = int(np.sum(np.any(xla_seqs != fused_seqs, axis=-1)))
    diff_pos = np.where(xla_seqs != fused_seqs)
    first_diff = (
        [int(diff_pos[0][0]), int(diff_pos[1][0])] if diff_pos[0].size else None
    )
    ok = seq_match and len_match and step_ok
    print(json.dumps({
        "phase": "engine",
        "parity": "PASS" if ok else "FAIL",
        "fused_on_chip": on_tpu, "pack_dtype": "float32",
        "batch": batch, "beam": beam, "max_len": max_len, "vocab": vocab,
        "dims": dims, "mismatching_rows": mismatch_rows,
        "first_diff_row_pos": first_diff,
        "mean_len": float(xla_len.mean()),
        "backend": jax.default_backend(),
    }), flush=True)
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
