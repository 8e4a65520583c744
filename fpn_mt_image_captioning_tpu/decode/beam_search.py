"""Batched KV-cached beam search and greedy decoding.

The reference decodes ONE image at a time with a Python-loop beam search that
re-forwards the whole growing prefix every step with no KV cache
(``/root/reference/utils/pipeline.py:82-154``). This engine is the TPU-native
redesign: a single compiled ``lax.while_loop`` advances all ``batch × beam``
hypotheses one token per step through the cached decoder (O(1) work per step),
stopping as soon as the termination condition holds.

Two scoring modes:

* **fast (default)** — correct log-space beam search: beams start as
  ``[0, -inf, ...]`` so the first expansion diversifies from a single hypothesis;
  finished beams are frozen (forced pad continuation at zero added score); the
  loop stops when *all* beams of all batch items are finished.

* **parity** — reproduces the reference's quirks exactly (SURVEY.md §2 C23): all
  beams initialize with equal scores from identical states, so the first top-k
  tie-breaks beam-major and every beam picks the same token — the search
  degenerates to greedy, which is what the reference actually computes. Exact
  loop semantics (``pipeline.py:118-154``) are preserved, including on crafted
  ties: finished beams are NOT frozen (the reference keeps multiplying real
  probabilities, so a beam that emitted ``<end>`` keeps expanding); the stop
  check looks only at whether the current *best* beam's *last* token is
  ``<end>`` (non-sticky — a mid-sequence ``<end>`` does not stop or strip); per
  batch item the result is latched the first time that check fires, mirroring
  the reference's early ``return``. (The reference scores by cumulative
  raw-probability product; product-of-probs ordering equals sum-of-log-probs
  ordering, so log-space accumulation reproduces its selection without the
  underflow, and ``lax.top_k``'s lowest-index tie-break matches ``tf.math.top_k``.)

Termination/stripping semantics match the reference (``pipeline.py:143-154``):
the returned best sequence drops the leading ``<start>`` and, if the beam ended
with ``<end>``, that trailing token (fast mode additionally cuts at the first
``<end>``; parity mode keeps mid-sequence ``<end>``s exactly as the reference
does).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from ..models.transformer import Transformer

__all__ = ["beam_search", "greedy_decode", "sample_decode", "strip_sequence",
           "cast_for_inference"]

NEG_INF = -1.0e9


def _nucleus_keep(probs, top_p):
    """Nucleus (top-p) keep-mask: the smallest prefix of the descending-prob
    ordering whose mass reaches ``top_p`` (the top token always survives).

    POSITIONAL, scattered back through the sort order — a value-based prob
    cutoff would keep every token TIED with the boundary probability,
    overshooting the requested mass (probs [.5, .25, .25] at top_p 0.6 kept
    all three). top_p is clamped below like temperature: at top_p <= 0 an
    unclamped threshold keeps NOTHING (0 < 0 is False) and masking all
    logits would degrade to uniform sampling over the whole vocab."""
    order = jnp.argsort(probs, axis=-1)[:, ::-1]  # descending
    sorted_probs = jnp.take_along_axis(probs, order, axis=-1)
    csum = jnp.cumsum(sorted_probs, axis=-1)
    keep_sorted = (csum - sorted_probs) < jnp.maximum(
        top_p[:, None], 1e-9
    )  # mass BEFORE each position
    return jnp.zeros(probs.shape, bool).at[
        jnp.arange(probs.shape[0])[:, None], order
    ].set(keep_sorted)


def _strip_ended(seqs, t, end_token: int):
    """Replace everything from the first ``<end>`` on with pad (0) and return
    ``(stripped, lengths)`` — lengths = the ``<end>`` position, or ``t`` for
    rows that never finished. Shared by the beam epilogue and sample_decode
    so the stop/strip return contract can't silently fork."""
    is_end = seqs == end_token
    ended = jnp.any(is_end, axis=1)
    end_pos = jnp.argmax(is_end, axis=1)
    idx = jnp.arange(seqs.shape[1])[None, :]
    keep = jnp.where(ended[:, None], idx < end_pos[:, None], idx < t)
    stripped = jnp.where(keep, seqs, 0)
    lengths = jnp.where(ended, end_pos, t).astype(jnp.int32)
    return stripped, lengths


def cast_for_inference(variables: Any, dtype=jnp.bfloat16) -> Any:
    """Cast float32 weights to the compute dtype once, so the decode loop reads
    half the weight bytes per step (params are otherwise cast on every use)."""
    def cast(x):
        if hasattr(x, "dtype") and x.dtype == jnp.float32:
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, variables)


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "beam_n", "max_len", "start_token", "end_token", "parity",
        "fused", "pack_dtype",
    ),
)
def beam_search(
    model: Transformer,
    variables: Any,
    enc_output: jax.Array,     # (B, Lenc, d_model)
    *,
    beam_n: int,
    max_len: int,              # maximum generated tokens (incl. <end>), == max_seq_len
    start_token: int,
    end_token: int,
    parity: bool = False,
    fused: bool = False,       # use the fused Pallas decoder-step kernel (TPU)
    pack_dtype: Any = jnp.bfloat16,  # fused path's weight/compute dtype
                                     # (float32 for on-chip parity vs the XLA path)
):
    """Returns ``(sequences (B, max_len) int32, lengths (B,) int32, scores (B,))``.

    ``sequences`` hold the best beam per batch item with <start>/<end> already
    stripped (pad-0 beyond ``lengths``).
    """
    batch = enc_output.shape[0]
    bk = batch * beam_n

    if parity and fused:
        raise ValueError(
            "parity mode requires the XLA decode path (the fused kernel "
            "freezes finished beams in-kernel; the reference does not freeze)"
        )

    if fused:
        from ..ops.fused_decoder import (
            fused_decode_step,
            init_fused_cache,
            pack_decoder_weights,
        )
        from ..models.positional import raw_positional_encoding

        params = variables["params"]
        # NOTE: packing runs inside the jitted body, i.e. once per
        # invocation — a deliberate tradeoff: the transpose/concat/cast
        # traffic is tens of MB at HBM bandwidth (sub-ms, amortized over 60
        # decode steps), and hoisting it would change beam_search's public
        # signature (pre-packed tables as arguments) for every caller and
        # exported artifact. Revisit only if batch-1 latency becomes the
        # binding target.
        packed = pack_decoder_weights(params, model.num_layers, dtype=pack_dtype)
        cache = init_fused_cache(packed, enc_output, beam_n, max_len)
        lpad = cache["k_self"].shape[1]
        emb_table = jnp.asarray(
            params["decoder"]["embedding"]["embedding"], packed["wqkv"].dtype
        )
        pe_table = jnp.asarray(
            raw_positional_encoding(model.max_seq_len + model.max_position, model.d_model),
            packed["wqkv"].dtype,
        )
        srcT = jnp.broadcast_to(
            (jnp.arange(bk, dtype=jnp.int32) % beam_n)[None, :], (lpad, bk)
        )
        own_local = jnp.arange(bk, dtype=jnp.int32) % beam_n
    else:
        # tile encoder output beam-major: (B, L, D) → (B*K, L, D)
        enc_tiled = jnp.repeat(enc_output, beam_n, axis=0)
        cache = model.apply(
            variables, enc_tiled, max_len + 1, method=Transformer.init_cache
        )
        srcT = None

    if parity:
        init_scores = jnp.zeros((batch, beam_n), jnp.float32)
    else:
        init_scores = jnp.full((batch, beam_n), NEG_INF, jnp.float32).at[:, 0].set(0.0)

    seqs = jnp.zeros((batch, beam_n, max_len), jnp.int32)
    tokens = jnp.full((bk,), start_token, jnp.int32)
    finished = jnp.zeros((batch, beam_n), jnp.bool_)
    # Lazy beam reordering: the self-attention K/V caches are never physically
    # gathered. ``src[row, p]`` holds the physical row whose cache slot stores
    # logical beam ``row``'s position-p keys/values (its ancestry); the gather is
    # fused into the attention reads (attention.attend_cached), eliminating
    # ~2/3 of decode HBM traffic (cache rewrite read+write per step).
    own_rows = jnp.arange(bk, dtype=jnp.int32)
    src = srcT if fused else jnp.broadcast_to(own_rows[:, None], (bk, max_len + 1))

    # Parity mode mirrors the reference's early `return` (pipeline.py:147-149):
    # per batch item, latch the result the first time the best beam's LAST
    # token is <end>. The beams themselves keep expanding (no freezing), which
    # matters on exact ties where beams diverge.
    done = jnp.zeros((batch,), jnp.bool_)
    res_seq = jnp.zeros((batch, max_len), jnp.int32)
    res_len = jnp.zeros((batch,), jnp.int32)
    res_score = jnp.zeros((batch,), jnp.float32)

    def cond(carry):
        t, _, _, _, _, _, finished, done, *_ = carry
        if parity:
            all_done = jnp.all(done)
        else:
            all_done = jnp.all(finished)
        return jnp.logical_and(t < max_len, jnp.logical_not(all_done))

    def body(carry):
        (t, tokens, scores, cache, src, seqs, finished,
         done, res_seq, res_len, res_score) = carry
        if fused:
            # embedding + PE in XLA; everything else (6 layers + final vocab
            # projection + log-softmax + freeze + score add + per-row top-k)
            # in ONE kernel — the XLA side then sorts only (B, K²) candidates
            pe_row = jax.lax.dynamic_slice_in_dim(pe_table, t, 1, axis=0)
            x_emb = jnp.take(emb_table, tokens, axis=0) + pe_row
            top_s, top_i, cache = fused_decode_step(
                packed, cache, x_emb, src, t,
                scores.reshape(bk, 1), finished.reshape(bk, 1).astype(jnp.float32),
                num_layers=model.num_layers, beam=beam_n,
                num_heads=model.num_heads, topk=beam_n,
                activation=model.activation,
            )
            cand_s = top_s[:, :beam_n].reshape(batch, beam_n * beam_n)
            cand_i = top_i[:, :beam_n].reshape(batch, beam_n * beam_n)
            # candidate order (beam-major, then descending score / ascending
            # vocab id) makes this top_k tie-break identically to the full
            # (B, K·V) top_k of the XLA path
            new_scores, sel = jax.lax.top_k(cand_s, beam_n)
            beam_idx = sel // beam_n                               # (B, K)
            new_tokens = jnp.take_along_axis(cand_i, sel, axis=1).astype(jnp.int32)
        else:
            logits, cache = model.apply(
                variables, tokens, t, cache, src, method=Transformer.decode_step
            )
            log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            vocab = log_probs.shape[-1]
            log_probs = log_probs.reshape(batch, beam_n, vocab)

            if not parity:
                # freeze finished beams: only pad (id 0) continues, at zero
                # added score (the reference never freezes — pipeline.py:118-141)
                pad_row = jnp.full((vocab,), NEG_INF, jnp.float32).at[0].set(0.0)
                log_probs = jnp.where(
                    finished[..., None], pad_row[None, None, :], log_probs
                )
            total = scores[..., None] + log_probs                  # (B, K, V)
            flat = total.reshape(batch, beam_n * vocab)

            new_scores, flat_idx = jax.lax.top_k(flat, beam_n)     # ties → lowest index
            beam_idx = flat_idx // vocab                           # (B, K)
            new_tokens = (flat_idx % vocab).astype(jnp.int32)      # (B, K)

        # lazy reorder: remap ancestry rows instead of gathering the caches
        flat_parent = (
            jnp.arange(batch, dtype=jnp.int32)[:, None] * beam_n + beam_idx
        ).reshape(-1)
        if fused:
            src = jnp.take(src, flat_parent, axis=1)
            src = jax.lax.dynamic_update_slice(src, own_local[None, :], (t + 1, 0))
        else:
            src = jnp.take(src, flat_parent, axis=0)
            src = jax.lax.dynamic_update_slice(src, own_rows[:, None], (0, t + 1))

        seqs = jnp.take_along_axis(seqs, beam_idx[..., None], axis=1)
        seqs = jax.lax.dynamic_update_slice(
            seqs, new_tokens[..., None], (0, 0, t)
        )
        if parity:
            # reference: finished means "last token is <end>" — non-sticky
            finished = new_tokens == end_token
            # latch results for items whose best beam just ended (first time)
            ended_now = new_tokens[:, 0] == end_token
            newly = jnp.logical_and(ended_now, jnp.logical_not(done))
            idx = jnp.arange(max_len, dtype=jnp.int32)[None, :]
            cand = jnp.where(idx < t, seqs[:, 0, :], 0)  # 0..t-1: trailing <end> dropped
            res_seq = jnp.where(newly[:, None], cand, res_seq)
            res_len = jnp.where(newly, t, res_len)
            res_score = jnp.where(newly, new_scores[:, 0], res_score)
            done = jnp.logical_or(done, newly)
        else:
            was_finished = jnp.take_along_axis(finished, beam_idx, axis=1)
            finished = jnp.logical_or(was_finished, new_tokens == end_token)

        return (t + 1, new_tokens.reshape(-1), new_scores, cache, src, seqs,
                finished, done, res_seq, res_len, res_score)

    carry = (jnp.int32(0), tokens, init_scores, cache, src, seqs, finished,
             done, res_seq, res_len, res_score)
    (t, tokens, scores, cache, src, seqs, finished,
     done, res_seq, res_len, res_score) = jax.lax.while_loop(cond, body, carry)

    # best beam per batch item (top_k keeps beams score-sorted → index 0)
    best_seq = seqs[:, 0, :]           # (B, max_len) — includes <end> if emitted
    best_score = scores[:, 0]
    idx = jnp.arange(best_seq.shape[1])[None, :]

    if parity:
        # items never latched ran to max_len with a best beam whose last token
        # is not <end> (else they would have latched): return all t tokens,
        # mid-sequence <end>s kept — exact reference stripping
        # (pipeline.py:143-154: `beam_result[1:-1]` / `beam_result[1:]`)
        tail_seq = jnp.where(idx < t, best_seq, 0)
        stripped = jnp.where(done[:, None], res_seq, tail_seq)
        lengths = jnp.where(done, res_len, t).astype(jnp.int32)
        final_score = jnp.where(done, res_score, best_score)
        return stripped, lengths, final_score

    # strip trailing <end> (replace with pad) and compute lengths
    stripped, lengths = _strip_ended(best_seq, t, end_token)
    return stripped, lengths, best_score


@functools.partial(
    jax.jit, static_argnames=("model", "max_len", "start_token", "end_token")
)
def greedy_decode(
    model: Transformer,
    variables: Any,
    enc_output: jax.Array,
    *,
    max_len: int,
    start_token: int,
    end_token: int,
):
    """Greedy argmax decode — (B, max_len) stripped sequences + lengths."""
    seqs, lengths, _ = beam_search(
        model, variables, enc_output,
        beam_n=1, max_len=max_len,
        start_token=start_token, end_token=end_token, parity=False,
    )
    return seqs, lengths


@functools.partial(
    jax.jit,
    static_argnames=("model", "max_len", "start_token", "end_token", "top_k"),
)
def sample_decode(
    model: Transformer,
    variables: Any,
    enc_output: jax.Array,     # (B, Lenc, d_model)
    rng: jax.Array,            # PRNG key (folded per step)
    *,
    max_len: int,
    start_token: int,
    end_token: int,
    temperature=1.0,           # scalar or (B,) — per-row supported (serving
                               # batches can mix request temperatures)
    top_k: int = 0,            # 0 = no top-k truncation (static: shapes lax.top_k)
    top_p=None,                # scalar or (B,) — nucleus truncation. None (a
                               # TRACE-TIME off switch) omits the per-step
                               # descending sort entirely: measured 788.6 →
                               # see CLAUDE.md — the (B, V) sort is the single
                               # most expensive op in the sampling step
):
    """Ancestral sampling with temperature / top-k / nucleus truncation on the
    shared-KV-cache decode engine. A serving extra with no reference
    counterpart (upstream decodes beam-only — ``utils/pipeline.py:82-154``);
    same cache/decode_step machinery and stripped-sequence return contract as
    ``beam_search``. ``temperature``/``top_p`` are traced (scalar or per-row)
    so sweeping them never recompiles. Returns (seqs (B, max_len), lengths)."""
    batch = enc_output.shape[0]
    vocab = model.target_vocab_size
    temperature = jnp.broadcast_to(jnp.asarray(temperature, jnp.float32), (batch,))
    if top_p is not None:
        top_p = jnp.broadcast_to(jnp.asarray(top_p, jnp.float32), (batch,))

    cache = model.apply(
        variables, enc_output, max_len + 1, method=Transformer.init_cache
    )
    own_rows = jnp.arange(batch, dtype=jnp.int32)
    src = jnp.broadcast_to(own_rows[:, None], (batch, max_len + 1))  # no reorder

    seqs = jnp.zeros((batch, max_len), jnp.int32)
    tokens = jnp.full((batch,), start_token, jnp.int32)
    finished = jnp.zeros((batch,), jnp.bool_)

    def cond(carry):
        t, _, _, _, finished = carry
        return jnp.logical_and(t < max_len, jnp.logical_not(jnp.all(finished)))

    def body(carry):
        t, tokens, cache, seqs, finished = carry
        logits, cache = model.apply(
            variables, tokens, t, cache, src, method=Transformer.decode_step
        )
        logits = logits.astype(jnp.float32) / jnp.maximum(
            temperature[:, None], 1e-6
        )
        if top_k and top_k < vocab:
            kth = jax.lax.top_k(logits, top_k)[0][:, -1:]
            logits = jnp.where(logits < kth, NEG_INF, logits)
        if top_p is not None:
            keep = _nucleus_keep(jax.nn.softmax(logits, axis=-1), top_p)
            logits = jnp.where(keep, logits, NEG_INF)

        new_tokens = jax.random.categorical(jax.random.fold_in(rng, t), logits)
        new_tokens = jnp.where(finished, 0, new_tokens.astype(jnp.int32))
        seqs = jax.lax.dynamic_update_slice(seqs, new_tokens[:, None], (0, t))
        finished = jnp.logical_or(finished, new_tokens == end_token)
        return (t + 1, new_tokens, cache, seqs, finished)

    carry = (jnp.int32(0), tokens, cache, seqs, finished)
    t, _, _, seqs, _ = jax.lax.while_loop(cond, body, carry)

    return _strip_ended(seqs, t, end_token)


def strip_sequence(tokens, end_token: int) -> list[int]:
    """Host-side helper mirroring the reference's return contract
    (``pipeline.py:143-154``): assumes tokens exclude <start>; cut at <end>."""
    out = []
    for t in list(tokens):
        t = int(t)
        if t == end_token:
            break
        if t != 0:
            out.append(t)
    return out
