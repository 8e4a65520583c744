"""On-chip fused-vs-XLA decode validation (run on a real TPU).

The interpreter-mode tests (tests/test_fused_decoder.py, test_fused_beam.py)
pin the fused kernel's MATH against the XLA decode path exactly at f32, but
they execute the kernel body through XLA-on-CPU — they cannot catch a Mosaic
lowering bug that only manifests in the real TPU compilation. This script
closes that gap at flagship model dims, on the chip.

What "parity" can mean on hardware (round-3 lessons, both measured here):

* Exact-sequence agreement is NOT achievable on chip even at float32 weight
  packing: Mosaic lowers the kernel's matmuls through MXU passes whose
  internal precision differs from the XLA path's (measured max top-k score
  delta ≈ 2.4e-3 at f32 pack, t=0, vs 0.0 in interpreter mode). With random
  weights the per-row top-8-of-2000 score gaps are routinely below that, so
  beam choices flip and full sequences diverge — arithmetic noise, not a bug.
  (The first version of this script demanded identical sequences and
  "failed"; don't resurrect that gate.)

* What a hardware bug WOULD look like: the history-DMA / ancestry-matmul /
  cache-aliasing machinery only engages at pos > 0 — a lowering bug there
  produces O(1)-huge score errors that GROW with step. So the decisive check
  is a **state-synchronized multi-step probe**: drive the fused and XLA
  engines through T steps forcing identical beam selections (taken from the
  XLA side) into both caches, and bound the per-step top-k score delta.
  Bounded-flat ≈ MXU precision noise (PASS); growing/large = real bug.

Phases (each prints one flushed JSON line):

1. ``step_probe``   — one step at t=0, max|Δ| on per-row top-k scores.
2. ``synced_steps`` — the T-step synchronized probe described above.
3. ``engine``       — both engines end-to-end (informational: reports how many
                      rows diverge under free-running beam search at f32 pack;
                      nonzero is expected per the above).

Gate: step_probe max|Δ| < 1e-2 AND synced max-over-steps|Δ| < 5e-2.

    python scripts/verify_fused_on_tpu.py          # a few remote compiles
    python scripts/verify_fused_on_tpu.py --tiny   # CPU smoke (XLA-vs-XLA only)

Result of record: CLAUDE.md "Round 3 additions".
"""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1.0e9


def make_steppers(model, variables, beam, max_len):
    """Jitted single-step functions for both engines + shared init."""
    from fpn_mt_image_captioning_tpu.models.positional import raw_positional_encoding
    from fpn_mt_image_captioning_tpu.models.transformer import Transformer
    from fpn_mt_image_captioning_tpu.ops.fused_decoder import (
        fused_decode_step,
        init_fused_cache,
        pack_decoder_weights,
    )

    params = variables["params"]
    emb = params["decoder"]["embedding"]["embedding"].astype(jnp.float32)
    pe = raw_positional_encoding(
        model.max_seq_len + model.max_position, model.d_model
    ).astype(jnp.float32)

    @jax.jit
    def fused_init(variables, enc):
        # weights must flow through the ARG: closed-over params bake into the
        # HLO as constants and can blow the tunnel's ~100MB upload cap
        packed = pack_decoder_weights(
            variables["params"], model.num_layers, dtype=jnp.float32
        )
        return packed, init_fused_cache(packed, enc, beam, max_len)

    @functools.partial(jax.jit, static_argnames=())
    def fused_step(packed, cache, tokens, src_t, pos, scores, finished):
        pe_row = jax.lax.dynamic_slice_in_dim(pe, pos, 1, axis=0)
        x_emb = jnp.take(emb, tokens, axis=0) + pe_row
        return fused_decode_step(
            packed, cache, x_emb, src_t, pos, scores, finished,
            num_layers=model.num_layers, beam=beam,
            num_heads=model.num_heads, topk=beam,
        )

    @jax.jit
    def xla_init(variables, enc):
        enc_tiled = jnp.repeat(enc, beam, axis=0)
        return model.apply(
            variables, enc_tiled, max_len + 1, method=Transformer.init_cache
        )

    @jax.jit
    def xla_step(variables, tokens, pos, cache, src, scores, finished):
        logits, cache = model.apply(
            variables, tokens, pos, cache, src, method=Transformer.decode_step
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        vocab = logp.shape[-1]
        # freeze finished beams exactly like the engine/kernel: only pad (0)
        # continues, at zero added score
        pad_row = jnp.full((vocab,), NEG_INF, jnp.float32).at[0].set(0.0)
        logp = jnp.where(finished > 0, pad_row[None, :], logp)
        cand = scores + logp                                    # (BK, V)
        top_s, top_i = jax.lax.top_k(cand, beam)
        return top_s, top_i, cache

    return fused_init, fused_step, xla_init, xla_step


def synced_probe(model, variables, enc, batch, beam, max_len, steps):
    """Drive both engines T steps with IDENTICAL (XLA-chosen) selections;
    report the per-step max|Δ| between their top-k candidate scores."""
    bk = batch * beam
    fused_init, fused_step, xla_init, xla_step = make_steppers(
        model, variables, beam, max_len
    )
    packed, fcache = fused_init(variables, enc)
    xcache = xla_init(variables, enc)
    lpad = int(fcache["k_self"].shape[1])

    own_local = np.arange(bk, dtype=np.int32) % beam
    src_t = np.broadcast_to(own_local[None, :], (lpad, bk)).copy()      # fused
    src = np.broadcast_to(
        np.arange(bk, dtype=np.int32)[:, None], (bk, max_len + 1)
    ).copy()                                                            # xla
    tokens = np.full((bk,), 1, np.int32)
    scores = np.full((batch, beam), NEG_INF, np.float32)
    scores[:, 0] = 0.0
    finished = np.zeros((batch, beam), np.float32)

    deltas, idx_mismatch = [], 0
    for t in range(steps):
        s_col = jnp.asarray(scores.reshape(bk, 1))
        f_col = jnp.asarray(finished.reshape(bk, 1))
        ts, ti, fcache = fused_step(
            packed, fcache, jnp.asarray(tokens), jnp.asarray(src_t),
            jnp.int32(t), s_col, f_col,
        )
        xs, xi, xcache = xla_step(
            variables, jnp.asarray(tokens), jnp.int32(t), xcache,
            jnp.asarray(src), s_col, f_col,
        )
        f_s = np.asarray(ts)[:, :beam]
        f_i = np.asarray(ti)[:, :beam]
        x_s, x_i = np.asarray(xs), np.asarray(xi)
        # compare only live rows: frozen rows produce a single 0-added-score
        # pad candidate; the remaining slots are NEG_INF filler whose exact
        # value differs between kernel (-1e9 bias) and XLA top_k padding
        live = finished.reshape(-1) == 0.0
        deltas.append(float(np.max(np.abs(f_s[live] - x_s[live]))) if live.any() else 0.0)
        idx_mismatch += int(np.sum(f_i[live] != x_i[live]))

        # one shared selection (from the XLA side) drives BOTH caches
        cand_s = x_s.reshape(batch, beam * beam)
        cand_i = x_i.reshape(batch, beam * beam)
        sel = np.argsort(-cand_s, axis=1, kind="stable")[:, :beam]
        scores = np.take_along_axis(cand_s, sel, axis=1)
        new_tokens = np.take_along_axis(cand_i, sel, axis=1).astype(np.int32)
        beam_idx = (sel // beam).astype(np.int32)
        flat_parent = (
            np.arange(batch, dtype=np.int32)[:, None] * beam + beam_idx
        ).reshape(-1)
        src_t = src_t[:, flat_parent]
        src_t[t + 1, :] = own_local
        src = src[flat_parent, :]
        src[:, t + 1] = np.arange(bk, dtype=np.int32)
        # beams never finish here by design: all rows stay live for all T steps
        # (max DMA/ancestry coverage); the freeze math itself is pinned exactly
        # by the interpreter tests (test_fused_decoder.py, multi-chunk vocab)
        finished = np.take_along_axis(finished, beam_idx, axis=1)
        tokens = new_tokens.reshape(-1)

    max_delta = max(deltas)
    print(json.dumps({
        "phase": "synced_steps", "steps": steps,
        "max_abs_score_delta": max_delta,
        "per_step_delta": [round(d, 6) for d in deltas],
        "topk_index_flips": idx_mismatch,
        "delta_growth": round(deltas[-1] / max(deltas[0], 1e-9), 2),
    }), flush=True)
    return max_delta < 5e-2


def step_probe(model, variables, enc, batch, beam, max_len):
    """One decode step at t=0, fused (f32 pack) vs XLA, numeric comparison."""
    bk = batch * beam
    fused_init, fused_step, xla_init, xla_step = make_steppers(
        model, variables, beam, max_len
    )
    packed, fcache = fused_init(variables, enc)
    xcache = xla_init(variables, enc)
    lpad = int(fcache["k_self"].shape[1])
    start = jnp.full((bk,), 1, jnp.int32)
    src_t = jnp.broadcast_to(
        (jnp.arange(bk, dtype=jnp.int32) % beam)[None, :], (lpad, bk)
    )
    src = jnp.broadcast_to(
        jnp.arange(bk, dtype=jnp.int32)[:, None], (bk, max_len + 1)
    )
    zeros = jnp.zeros((bk, 1), jnp.float32)
    ts, ti, _ = fused_step(packed, fcache, start, src_t, jnp.int32(0), zeros, zeros)
    xs, xi, _ = xla_step(variables, start, jnp.int32(0), xcache, src, zeros, zeros)
    f_s, f_i = np.asarray(ts)[:, :beam], np.asarray(ti)[:, :beam]
    x_s, x_i = np.asarray(xs), np.asarray(xi)
    max_abs = float(np.max(np.abs(f_s - x_s)))
    idx_match = bool(np.array_equal(f_i, x_i))
    print(json.dumps({
        "phase": "step_probe", "max_abs_score_delta": max_abs,
        "topk_indices_match": idx_match,
        "fused_top1": float(f_s[0, 0]), "xla_top1": float(x_s[0, 0]),
    }), flush=True)
    return max_abs < 1e-2


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

    step_ok = synced_ok = True
    if on_tpu:
        step_ok = step_probe(model, variables, enc, batch, beam, max_len)
        synced_ok = synced_probe(
            model, variables, enc, batch, beam, max_len, steps=max_len - 1
        )
    else:
        # no TPU: run the same probes with the kernel in interpreter mode —
        # validates the probe machinery itself (state sync, freeze math,
        # comparison masking); deltas here are pure f32 reduction-order noise
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            step_ok = step_probe(model, variables, enc, batch, beam, max_len)
            synced_ok = synced_probe(
                model, variables, enc, batch, beam, max_len, steps=max_len - 1
            )

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

    mismatch_rows = int(np.sum(np.any(xla_seqs != fused_seqs, axis=-1)))
    ok = step_ok and synced_ok
    print(json.dumps({
        "phase": "engine",
        "verdict": "PASS" if ok else "FAIL",
        "gate": "step_probe<1e-2 AND synced_steps<5e-2",
        "fused_on_chip": on_tpu, "pack_dtype": "float32",
        "batch": batch, "beam": beam, "max_len": max_len, "vocab": vocab,
        "dims": dims,
        "free_running_row_divergence": mismatch_rows,
        "note": "free-running divergence under MXU precision noise is expected; the gate is the synchronized probes",
        "mean_len": float(xla_len.mean()),
        "backend": jax.default_backend(),
    }), flush=True)
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
