"""Fused decoder-step Pallas kernel: the ENTIRE N-layer decoder advance for one
token position in ONE kernel launch.

Why: autoregressive decode is dispatch-bound, not FLOP-bound — the XLA path
issues ~200 small HLO ops per generated token (qkv/out/ffn matmuls, cache
updates, gathers, softmaxes, LayerNorms × 6 layers). This kernel runs the whole
stack inside a single ``pallas_call`` with ``grid=(num_layers,)``:

  * the hidden state x (BK, d) lives in VMEM scratch across grid steps (TPU grid
    cells execute sequentially, so layer l+1 sees layer l's write);
  * per-layer weights are streamed as blocked VMEM inputs indexed by the layer
    id — Pallas double-buffers them, so layer l+1's weights DMA in while layer l
    computes;
  * self-attention K/V caches stay in HBM, position-major ``(N, L, BK, d)`` so
    the one new row per step is a single contiguous (BK, d) DMA write; history
    (positions < pos only — the current position's terms come straight from
    the in-register projections) is DMA'd per row-tile into double-buffered
    VMEM scratch, prefetching tile ti+1 while tile ti computes;
  * beam ancestry ("which physical row holds position p's K/V for this beam")
    is resolved by a one-hot matmul over the beam group — the TPU-idiomatic
    gather (``k_eff = onehot @ k_group`` batched over (L, group)) — so beam
    reordering costs zero cache rewrites (see decode/beam_search.py);
  * cross-attention K/V (16-token encoder output) are precomputed per layer and
    stored per *batch item*, not per beam — beams share them;
  * LayerNorms, softmaxes (float32), residuals, and the leaky-ReLU FFN all run
    in-kernel.

Semantics match ``Decoder.decode_step`` (models/transformer.py) up to bf16
rounding; verified against the XLA path by tests/test_fused_decoder.py
(interpreter mode on CPU).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "pack_decoder_weights", "init_fused_cache", "fused_decode_step", "round_up",
    "FUSED_ACTIVATIONS",
]

# FFN activations implemented inside the kernel (all of
# models/layers.py:resolve_activation today); Pipeline falls back to the XLA
# decode path for anything outside this set rather than silently serving the
# wrong nonlinearity.
FUSED_ACTIVATIONS = frozenset({"leaky_relu", "relu", "relu6", "gelu"})


def round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# weight packing: flax decoder param tree → stacked per-layer arrays
# ---------------------------------------------------------------------------
def pack_decoder_weights(params: Any, num_layers: int, dtype=jnp.bfloat16) -> dict:
    """Stack the decoder's per-layer weights along a leading layer axis.

    Layout (d = d_model, f = dff):
      wqkv (N, d, 3d)  bqkv (N, 3d)     — self-attn q|k|v fused
      wo   (N, d, d)   bo   (N, d)
      wcq  (N, d, d)   bcq  (N, d)      — cross-attn query
      wco  (N, d, d)   bco  (N, d)
      wkv_x(N, d, 2d)  bkv_x(N, 2d)     — cross-attn k|v (applied to enc output)
      w1   (N, d, f)   b1   (N, f)
      w2   (N, f, d)   b2   (N, d)
      ln   (N, 8, d)   float32          — s1,b1,s2,b2,s3,b3,(pad,pad)
    """
    dec = params["decoder"]

    def get(l, *path):
        node = dec[f"layer_{l}"]
        for k in path:
            node = node[k]
        return node

    def stack(fn):
        return jnp.stack([fn(l) for l in range(num_layers)]).astype(dtype)

    zeros_d = jnp.zeros_like(jnp.asarray(get(0, "layernorm1", "scale")))
    return {
        "wqkv": stack(lambda l: jnp.concatenate(
            [get(l, "mha1", n, "kernel") for n in ("wq", "wk", "wv")], axis=1)),
        "bqkv": stack(lambda l: jnp.concatenate(
            [get(l, "mha1", n, "bias") for n in ("wq", "wk", "wv")])[None, :]),
        "wo": stack(lambda l: get(l, "mha1", "out", "kernel")),
        "bo": stack(lambda l: get(l, "mha1", "out", "bias")[None, :]),
        "wcq": stack(lambda l: get(l, "mha2", "wq", "kernel")),
        "bcq": stack(lambda l: get(l, "mha2", "wq", "bias")[None, :]),
        "wco": stack(lambda l: get(l, "mha2", "out", "kernel")),
        "bco": stack(lambda l: get(l, "mha2", "out", "bias")[None, :]),
        "wkv_x": stack(lambda l: jnp.concatenate(
            [get(l, "mha2", n, "kernel") for n in ("wk", "wv")], axis=1)),
        "bkv_x": stack(lambda l: jnp.concatenate(
            [get(l, "mha2", n, "bias") for n in ("wk", "wv")])),
        "w1": stack(lambda l: get(l, "ffn", "ffn1", "kernel")),
        "b1": stack(lambda l: get(l, "ffn", "ffn1", "bias")[None, :]),
        "w2": stack(lambda l: get(l, "ffn", "ffn2", "kernel")),
        "b2": stack(lambda l: get(l, "ffn", "ffn2", "bias")[None, :]),
        "ln": jnp.stack([
            jnp.stack([
                get(l, "layernorm1", "scale"), get(l, "layernorm1", "bias"),
                get(l, "layernorm2", "scale"), get(l, "layernorm2", "bias"),
                get(l, "layernorm3", "scale"), get(l, "layernorm3", "bias"),
                zeros_d, zeros_d,
            ]) for l in range(num_layers)
        ]).astype(jnp.float32),
        # final vocabulary projection, vocab padded to a lane multiple; padded
        # bias columns get -1e9 so they never win top-k and vanish in logsumexp
        **_pack_final(params, num_layers, dtype),
    }


def _pack_final(params: Any, num_layers: int, dtype) -> dict:
    """Final projection, pre-chunked per grid cell: ``wf`` is (cells, d, chunk)
    with cells = num_layers + 1, so the kernel's blocked pipeline streams one
    chunk per grid cell (overlapped with layer compute) instead of fetching
    the whole (d, Vp) matrix serially before cell 0 — at vocab 10000 that
    pre-launch DMA measured ~59 µs/step (benchmarks/vocab10k_ablation.json,
    the vocab-dependent cost that survives final-cell ablation). ``bf`` keeps
    the un-chunked (1, Vp) shape; Vp is recovered from it."""
    wf = jnp.asarray(params["final_layer"]["kernel"])
    bf = jnp.asarray(params["final_layer"]["bias"], jnp.float32)
    d, vocab = wf.shape
    vp = round_up(vocab, 128)
    cells = num_layers + 1
    chunk = round_up(-(-vp // cells), 128)
    wf_p = jnp.zeros((d, cells * chunk), dtype).at[:, :vocab].set(wf.astype(dtype))
    wf_c = wf_p.reshape(d, cells, chunk).transpose(1, 0, 2)
    bf_p = jnp.full((1, vp), -1e9, jnp.float32).at[0, :vocab].set(bf)
    return {"wf": wf_c, "bf": bf_p}


def init_fused_cache(
    packed: dict, enc_output: jax.Array, beam: int, max_len: int
) -> dict:
    """Zero self caches (N, Lpad, B·beam, d) + cross K/V per batch item
    (N, B, Lenc, 2d). ``enc_output`` is UNtiled (B, Lenc, d_model)."""
    n, d, _ = packed["wqkv"].shape
    lpad = round_up(max_len + 1, 8)
    dtype = packed["wqkv"].dtype
    # stored (N, Lenc, B, 2d): the kernel replicates per-batch K/V over beams
    kv_cross = jnp.einsum(
        "bld,nde->nlbe", enc_output.astype(dtype), packed["wkv_x"]
    ) + packed["bkv_x"][:, None, None, :].astype(dtype)
    bk = enc_output.shape[0] * beam
    return {
        "k_self": jnp.zeros((n, lpad, bk, d), dtype),
        "v_self": jnp.zeros((n, lpad, bk, d), dtype),
        "kv_cross": kv_cross.astype(dtype),  # (N, Lenc, B, 2d)
    }


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------
def _decoder_kernel(
    # scalar prefetch
    pos_ref,                 # (1,) int32
    # inputs
    x_in_ref,                # (BK, d) VMEM
    oh_ref,                  # (n_tiles, Lpad, T, T) VMEM — block-diag ancestry one-hots
    wqkv_ref, bqkv_ref, wo_ref, bo_ref,
    wcq_ref, bcq_ref, wco_ref, bco_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, ln_ref,
    kv_cross_ref,            # (1, Lenc, B, 2d) VMEM
    wf_ref,                  # (1, d, chunk) — this grid cell's final-projection chunk
    bf_ref,                  # (1, Vp) f32 — bias, padded cols = -1e9
    scores_ref,              # (BK, 1) f32 — running beam log-prob scores
    fin_ref,                 # (BK, 1) f32 — 1.0 where beam already finished
    k_self_hbm,              # (N, Lpad, BK, d) ANY/HBM — aliased with output
    v_self_hbm,
    # outputs
    tops_ref,                # (BK, 128) f32 — top-k scores+log-probs (cols 0..topk-1)
    topi_ref,                # (BK, 128) int32 — matching vocab ids
    k_self_out,              # aliased full-array ANY ref
    v_self_out,
    # scratch
    x_s,                     # (BK, d)
    row_s,                   # (2, BK, d) — new K/V rows staged for DMA
    k_tile_s,                # (2, Lpad, TILE, d) — double-buffered history staging
    v_tile_s,                # (2, Lpad, TILE, d)
    ctx_s,                   # (BK, d)
    lg_s,                    # (Lpad, TILE, 128) f32 — per-head logits staging
    ctx_acc_s,               # (TILE, d) f32 — chunked context accumulator
    wf_s,                    # (d, cells·chunk) — final projection assembled
                             # chunk-by-chunk across grid cells (overlapped DMA)
    sem,                     # DMA semaphores (6,): 0,1 row writes;
                             # 2,3 K-history per buffer; 4,5 V-history per buffer
    *,
    num_layers: int,
    beam: int,
    num_heads: int,
    tile: int,
    topk: int,
    activation: str = "leaky_relu",
    ablate: str = "",
):
    layer = pl.program_id(0)
    bk, d = x_s.shape
    lpad = k_tile_s.shape[1]
    h = num_heads
    dh = d // h
    pos = pos_ref[0]
    f32 = jnp.float32
    scale = 1.0 / np.sqrt(dh)

    @pl.when(layer == 0)
    def _():
        x_s[:] = x_in_ref[:]

    # stage this cell's final-projection chunk (VMEM→VMEM, ~µs): the blocked
    # pipeline DMA'd it from HBM during the PREVIOUS cell's compute, so the
    # full (d, Vp) matrix is assembled by final-cell time with zero serial
    # pre-launch fetch (was ~59 µs/step at vocab 10000)
    chunk = wf_ref.shape[-1]
    wf_s[:, pl.ds(layer * chunk, chunk)] = wf_ref[0]

    def layer_norm(y_f32, scale_row, bias_row):
        mu = jnp.mean(y_f32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y_f32 - mu), axis=-1, keepdims=True)
        yn = (y_f32 - mu) * jax.lax.rsqrt(var + 1e-6)
        return yn * scale_row[None, :] + bias_row[None, :]

    dtype = x_s.dtype

    def _run_layer():
        x = x_s[:]
        # ---- self-attention: projections + cache write ----------------------
        qkv = jnp.dot(x, wqkv_ref[0], preferred_element_type=f32) + bqkv_ref[0]
        qkv = qkv.astype(dtype)
        q = qkv[:, :d]
        row_s[0, :, :] = qkv[:, d : 2 * d]   # k_t
        row_s[1, :, :] = qkv[:, 2 * d :]     # v_t

        kw = pltpu.make_async_copy(
            row_s.at[0], k_self_out.at[layer, pos], sem.at[0]
        )
        vw = pltpu.make_async_copy(
            row_s.at[1], v_self_out.at[layer, pos], sem.at[1]
        )
        kw.start()
        vw.start()
        # the row write must land before any history DMA whose bucket overlaps
        # row ``pos`` starts (a torn concurrent read could yield NaN bit
        # patterns, and 0·NaN = NaN in the context pass). ~1 µs for 1 MB.
        kw.wait()
        vw.wait()

        n_tiles = bk // tile

        # Head-segment indicator matrices (the Mosaic-safe way to do per-head
        # contractions without lane-dim reshapes): S[dd, j] = 1 iff lane dd
        # belongs to head j; logits-per-head = (q ⊙ k) @ S, expansion = w @ Sᵀ.
        hp = 128  # padded head axis (≥ num_heads, MXU-friendly)
        S = (
            jax.lax.broadcasted_iota(jnp.int32, (d, hp), 0) // dh
            == jax.lax.broadcasted_iota(jnp.int32, (d, hp), 1)
        ).astype(dtype)
        ST = (
            jax.lax.broadcasted_iota(jnp.int32, (hp, d), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (hp, d), 1) // dh
        ).astype(dtype)

        q_scaled = (q.astype(f32) * scale).astype(dtype)

        # History = positions 0..pos-1 ONLY: the current position's K/V never
        # round-trips HBM — its logit/context terms are computed straight from
        # the staged rows (``row_s``), exploiting the beam-search invariant that
        # ancestry at the current position is always the row's own beam
        # (decode/beam_search.py sets src[t] = own before step t runs).
        # K/V HBM reads land in ONE DMA per cache per tile, sized to the
        # smallest power-of-two bucket covering the history (per-8-slot-chunk
        # DMAs serialize ~8× more DMA latency than they save in bytes), and are
        # DOUBLE-BUFFERED across row tiles: tile ti+1's history streams in
        # while tile ti computes, and the V wait is deferred past the logit
        # pass, so most DMA latency hides behind the attention matmuls.
        # The ancestry one-hot gather, per-head logit matmul and weight-
        # expansion matmul stay gated per 8-slot chunk, so matmul FLOPs track
        # the history length exactly. Skipped chunks leave stale scratch; their
        # logit rows are overwritten with -1e9 (and the current row with the
        # in-register self term) before the softmax, and every V row a gated
        # chunk touches is real DMA'd bytes (finite), so stale data never
        # contributes.
        chunk = 8
        n_chunks = lpad // chunk
        dn = (((2,), (1,)), ((0,), (0,)))
        buckets, sz = [], chunk
        while sz < lpad:
            buckets.append(sz)
            sz *= 2
        buckets.append(lpad)

        def hist_copy(which, ti, buf, sz):
            src = k_self_out if which == 0 else v_self_out
            dst = k_tile_s if which == 0 else v_tile_s
            return pltpu.make_async_copy(
                src.at[layer, pl.ds(0, sz), pl.ds(ti * tile, tile), :],
                dst.at[buf, pl.ds(0, sz)],
                sem.at[2 + 2 * which + buf],
            )

        def for_bucket(fn):
            """Run fn(sz) under the bucket predicate covering pos history rows
            (exactly one fires when pos > 0; none at pos == 0)."""
            for bi, sz in enumerate(buckets):
                lo = 0 if bi == 0 else buckets[bi - 1]
                cond = (pos > lo) if sz == lpad else (pos > lo) & (pos <= sz)

                @pl.when(cond)
                def _(sz=sz):
                    fn(sz)

        def start_hist(which, ti, buf):
            for_bucket(lambda sz: hist_copy(which, ti, buf, sz).start())

        def wait_hist(which, ti, buf):
            for_bucket(lambda sz: hist_copy(which, ti, buf, sz).wait())

        start_hist(0, 0, 0)
        start_hist(1, 0, 0)

        for ti in range(n_tiles):
            buf = ti % 2
            r0 = ti * tile
            q_t = q_scaled[r0 : r0 + tile, :]

            if ti + 1 < n_tiles:
                start_hist(0, ti + 1, (ti + 1) % 2)
                start_hist(1, ti + 1, (ti + 1) % 2)
            wait_hist(0, ti, buf)

            # per history chunk: ancestry-gather K (block-diagonal one-hot
            # matmul — 8× the FLOPs of per-group GEMMs but M=tile instead of
            # M=beam on the MXU and zero group reshapes), then per-head logits
            # via head-segment matmul (q ⊙ k) @ S
            for c in range(n_chunks):
                c0 = c * chunk

                @pl.when(c0 < pos)
                def _(c0=c0):
                    k_eff_c = jax.lax.dot_general(
                        oh_ref[ti, c0 : c0 + chunk],
                        k_tile_s[buf, c0 : c0 + chunk],
                        dn, preferred_element_type=f32,
                    ).astype(dtype)                               # (chunk, T, d)
                    prod_c = jnp.broadcast_to(q_t[None], (chunk, tile, d)) * k_eff_c
                    lg_s[c0 : c0 + chunk] = jnp.dot(
                        prod_c.reshape(chunk * tile, d), S,
                        preferred_element_type=f32,
                    ).reshape(chunk, tile, hp)

            if "softmax" in ablate:  # perf-ablation: ctx := current V row only
                w_hist = jnp.zeros((lpad, tile, hp), f32)
                ctx_acc_s[:] = row_s[1, r0 : r0 + tile, :].astype(f32)
            else:
                # current position's logits from the staged rows (identity ancestry)
                self_lg = jnp.dot(
                    q_t * row_s[0, r0 : r0 + tile, :], S, preferred_element_type=f32
                )                                                 # (T, hp)

                lg = lg_s[:]
                iota0 = jax.lax.broadcasted_iota(jnp.int32, (lpad, tile, hp), 0)
                lg = jnp.where(
                    iota0 == pos, self_lg[None], jnp.where(iota0 > pos, -1e9, lg)
                )
                m = jnp.max(lg, axis=0, keepdims=True)
                e = jnp.exp(lg - m)
                w = e / jnp.sum(e, axis=0, keepdims=True)        # (L, T, 128) f32
                w_self = jnp.sum(jnp.where(iota0 == pos, w, 0.0), axis=0)  # (T, hp)
                w_hist = jnp.where(iota0 == pos, 0.0, w)

                # current position's context from the staged V rows
                w_self_d = jnp.dot(
                    w_self.astype(dtype), ST, preferred_element_type=f32
                )                                                 # (T, d)
                ctx_acc_s[:] = w_self_d * row_s[1, r0 : r0 + tile, :].astype(f32)

            wait_hist(1, ti, buf)

            # pass 2 per history chunk: expand per-head weights back over lanes
            # (@ Sᵀ), ancestry-gather V, accumulate the context contraction
            for c in range(n_chunks):
                c0 = c * chunk

                @pl.when(c0 < pos)
                def _(c0=c0):
                    w_d_c = jnp.dot(
                        w_hist[c0 : c0 + chunk].reshape(chunk * tile, hp).astype(dtype),
                        ST, preferred_element_type=f32,
                    ).reshape(chunk, tile, d)
                    v_eff_c = jax.lax.dot_general(
                        oh_ref[ti, c0 : c0 + chunk],
                        v_tile_s[buf, c0 : c0 + chunk],
                        dn, preferred_element_type=f32,
                    )
                    ctx_acc_s[:] = ctx_acc_s[:] + (w_d_c * v_eff_c).sum(0)

            ctx_s[r0 : r0 + tile, :] = ctx_acc_s[:].astype(dtype)

        ln = ln_ref[0]  # (8, d) f32
        attn = jnp.dot(ctx_s[:], wo_ref[0], preferred_element_type=f32) + bo_ref[0]
        out1 = layer_norm(attn + x.astype(f32), ln[0], ln[1])
        out1_b = out1.astype(dtype)

        if "cross" in ablate:  # perf-ablation: skip cross-attention
            out2 = out1
            out2_b = out1_b
            if "ffn" in ablate:
                x_s[:] = out2.astype(dtype)
                return
            hdn = jnp.dot(out2_b, w1_ref[0], preferred_element_type=f32) + b1_ref[0]
            hdn = jnp.where(hdn > 0, hdn, 0.2 * hdn).astype(dtype)
            ffn = jnp.dot(hdn, w2_ref[0], preferred_element_type=f32) + b2_ref[0]
            x_s[:] = layer_norm(ffn + out2, ln[4], ln[5]).astype(dtype)
            return

        # ---- cross-attention (K/V shared per batch item, (Lenc, B, 2d) layout) --
        q2 = jnp.dot(out1_b, wcq_ref[0], preferred_element_type=f32) + bcq_ref[0]
        q2 = (q2 * scale).astype(dtype)
        kv_x = kv_cross_ref[0]                     # (Lenc, B, 2d)
        lenc, b_items = kv_x.shape[0], kv_x.shape[1]
        k_x = kv_x[:, :, :d]                       # (Lenc, B, d)
        v_x = kv_x[:, :, d:]
        # replicate each batch item's K/V over its beams (rows are batch-major):
        # one-hot expansion matmul E[r, b] = (r // beam == b), batched over Lenc
        # (pltpu.repeat is tile-order, not element-repeat, so it can't be used here)
        E = (
            jax.lax.broadcasted_iota(jnp.int32, (bk, b_items), 0) // beam
            == jax.lax.broadcasted_iota(jnp.int32, (bk, b_items), 1)
        ).astype(dtype)
        E_bc = jnp.broadcast_to(E[None], (lenc, bk, b_items))
        dn_e = (((2,), (1,)), ((0,), (0,)))
        k_bc = jax.lax.dot_general(E_bc, k_x, dn_e, preferred_element_type=f32).astype(dtype)
        v_bc = jax.lax.dot_general(E_bc, v_x, dn_e, preferred_element_type=f32)
        prod2 = jnp.broadcast_to(q2[None], (lenc, bk, d)) * k_bc
        lg2 = jnp.dot(
            prod2.reshape(lenc * bk, d), S, preferred_element_type=f32
        ).reshape(lenc, bk, hp)
        m2 = jnp.max(lg2, axis=0, keepdims=True)
        e2 = jnp.exp(lg2 - m2)
        w2a = e2 / jnp.sum(e2, axis=0, keepdims=True)
        w2d = jnp.dot(
            w2a.reshape(lenc * bk, hp).astype(dtype), ST, preferred_element_type=f32
        ).reshape(lenc, bk, d)
        ctx2 = (w2d * v_bc.astype(f32)).sum(0).astype(dtype)      # (BK, d)

        attn2 = jnp.dot(ctx2, wco_ref[0], preferred_element_type=f32) + bco_ref[0]
        out2 = layer_norm(attn2 + out1, ln[2], ln[3])
        out2_b = out2.astype(dtype)

        # ---- FFN ----------------------------------------------------------------
        if "ffn" in ablate:  # perf-ablation: skip FFN
            x_s[:] = out2.astype(dtype)
            return
        hdn = jnp.dot(out2_b, w1_ref[0], preferred_element_type=f32) + b1_ref[0]
        # Config.activation, in-kernel (elementwise — the Mosaic-safe subset;
        # matches models/layers.py:resolve_activation). FUSED_ACTIVATIONS
        # gates callers to exactly this set.
        if activation == "leaky_relu":
            hdn = jnp.where(hdn > 0, hdn, 0.2 * hdn)
        elif activation == "relu":
            hdn = jnp.maximum(hdn, 0.0)
        elif activation == "relu6":
            hdn = jnp.clip(hdn, 0.0, 6.0)
        elif activation == "gelu":
            hdn = jax.nn.gelu(hdn)  # tanh approximation — lowers elementwise
        else:  # pragma: no cover — callers gate on FUSED_ACTIVATIONS
            raise ValueError(f"fused decoder: unsupported activation {activation!r}")
        hdn = hdn.astype(dtype)
        ffn = jnp.dot(hdn, w2_ref[0], preferred_element_type=f32) + b2_ref[0]
        out3 = layer_norm(ffn + out2, ln[4], ln[5])

        x_s[:] = out3.astype(dtype)

    @pl.when(layer < num_layers)
    def _layer_body():
        _run_layer()

    @pl.when(layer == num_layers)
    def _final_cell():
        if "final" in ablate:  # perf-ablation: skip vocab projection + top-k
            tops_ref[:] = jnp.zeros((bk, 128), f32)
            topi_ref[:] = jnp.zeros((bk, 128), jnp.int32)
            return
        # vocabulary projection + log-softmax + beam freeze + score add + the
        # per-row top-k extraction, all folded into the last grid step: the XLA
        # loop then runs top_k over (B, beam²) instead of (B, beam·V) — the
        # measured ~0.3 ms/step of loop bookkeeping was dominated by that sort
        xf = x_s[:]
        vp_used = bf_ref.shape[-1]
        logits = (
            jnp.dot(xf, wf_s[:, :vp_used], preferred_element_type=f32) + bf_ref[0]
        )
        m = jnp.max(logits, axis=-1, keepdims=True)
        lse = m + jnp.log(jnp.sum(jnp.exp(logits - m), axis=-1, keepdims=True))
        lp = logits - lse
        vp = logits.shape[-1]
        col = jax.lax.broadcasted_iota(jnp.int32, (bk, vp), 1)
        pad_row = jnp.where(col == 0, 0.0, -1e9)
        fin = fin_ref[:]
        lp = fin * pad_row + (1.0 - fin) * lp
        total = lp + scores_ref[:]

        # iterative max-extract: top `topk` (score, vocab-id) pairs per row,
        # ties resolved to the lowest vocab id (matches lax.top_k ordering)
        lane = jax.lax.broadcasted_iota(jnp.int32, (bk, 128), 1)
        out_s = jnp.full((bk, 128), -jnp.inf, f32)
        out_i = jnp.zeros((bk, 128), jnp.int32)
        for j in range(topk):
            mj = jnp.max(total, axis=-1, keepdims=True)           # (BK, 1)
            idx = jnp.min(
                jnp.where(total == mj, col, vp), axis=-1, keepdims=True
            )                                                      # (BK, 1)
            out_s = jnp.where(lane == j, mj, out_s)
            out_i = jnp.where(lane == j, idx, out_i)
            total = jnp.where(col == idx, -1e30, total)
        tops_ref[:] = out_s
        topi_ref[:] = out_i




@functools.partial(
    jax.jit,
    static_argnames=(
        "num_layers", "beam", "num_heads", "tile", "topk", "interpret",
        "activation", "ablate",
    ),
)
def fused_decode_step(
    packed: dict,
    cache: dict,
    x_emb: jax.Array,     # (BK, d) — token embedding + positional encoding
    src_t: jax.Array,     # (Lpad, BK) int32, values 0..beam-1 (transposed ancestry)
    pos: jax.Array,       # scalar int32
    scores: jax.Array,    # (BK, 1) f32 — running beam scores
    finished: jax.Array,  # (BK, 1) f32 — 1.0 where beam finished
    *,
    num_layers: int,
    beam: int,
    num_heads: int,
    tile: int = 128,
    topk: int | None = None,
    interpret: bool = False,
    activation: str = "leaky_relu",
    ablate: str = "",  # perf-ablation sections to skip: softmax/cross/ffn/final
):
    """All decoder layers + final vocab projection + log-softmax + beam freeze
    + per-row top-k for one position, in one kernel (grid = num_layers + 1).
    Returns ``(top_scores (BK, 128) f32, top_ids (BK, 128) int32, new_cache)``
    — columns 0..topk-1 hold the row's best (scores+log-prob, vocab id) pairs
    in lax.top_k order (descending, ties to the lowest id); self caches are
    updated in place via buffer aliasing. ``topk`` defaults to ``beam``.

    Contract: ``src_t[pos]`` must be each row's OWN beam index (identity
    ancestry at the current position) — ``beam_search`` guarantees this by
    construction; the kernel exploits it to source the current position's
    K/V from registers instead of reading the cache row back from HBM."""
    bk, d = x_emb.shape
    n = num_layers
    lpad = cache["k_self"].shape[1]
    dtype = packed["wqkv"].dtype
    dff = packed["w1"].shape[-1]
    lenc, b_items = cache["kv_cross"].shape[1:3]
    vp = packed["bf"].shape[-1]          # true padded vocab width
    cells, _, chunk = packed["wf"].shape  # per-grid-cell streaming chunks
    assert cells == n + 1, (
        "packed['wf'] chunk count must equal num_layers+1 grid cells — "
        "repack with pack_decoder_weights(params, num_layers)"
    )
    tile = min(tile, bk)
    while bk % tile or tile % beam:
        tile -= 1
    g = tile // beam
    n_tiles = bk // tile

    # Block-diagonal ancestry one-hots per tile:
    # oh[ti, l, r, r'] = (r, r' in the same beam group) ∧ (src_t[l, row r] == beam(r'))
    rows = jnp.arange(tile, dtype=jnp.int32)
    same_group = (rows[:, None] // beam) == (rows[None, :] // beam)   # (T, T)
    beam_of = rows % beam                                             # (T,)
    srcr = src_t.reshape(lpad, n_tiles, tile).transpose(1, 0, 2)      # (ti, L, T)
    oh = (
        (srcr[:, :, :, None] == beam_of[None, None, None, :])
        & same_group[None, None]
    ).astype(dtype)                                                   # (ti, L, T, T)

    nl = n - 1  # weight blocks clamp to the last layer on the final grid cell

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n + 1,),
        in_specs=[
            pl.BlockSpec((bk, d), lambda l, *_: (0, 0)),            # x_in
            pl.BlockSpec(
                (n_tiles, lpad, tile, tile), lambda l, *_: (0, 0, 0, 0)
            ),                                                      # oh
            pl.BlockSpec((1, d, 3 * d), lambda l, *_: (jnp.minimum(l, nl), 0, 0)),
            pl.BlockSpec((1, 1, 3 * d), lambda l, *_: (jnp.minimum(l, nl), 0, 0)),
            pl.BlockSpec((1, d, d), lambda l, *_: (jnp.minimum(l, nl), 0, 0)),
            pl.BlockSpec((1, 1, d), lambda l, *_: (jnp.minimum(l, nl), 0, 0)),
            pl.BlockSpec((1, d, d), lambda l, *_: (jnp.minimum(l, nl), 0, 0)),
            pl.BlockSpec((1, 1, d), lambda l, *_: (jnp.minimum(l, nl), 0, 0)),
            pl.BlockSpec((1, d, d), lambda l, *_: (jnp.minimum(l, nl), 0, 0)),
            pl.BlockSpec((1, 1, d), lambda l, *_: (jnp.minimum(l, nl), 0, 0)),
            pl.BlockSpec((1, d, dff), lambda l, *_: (jnp.minimum(l, nl), 0, 0)),
            pl.BlockSpec((1, 1, dff), lambda l, *_: (jnp.minimum(l, nl), 0, 0)),
            pl.BlockSpec((1, dff, d), lambda l, *_: (jnp.minimum(l, nl), 0, 0)),
            pl.BlockSpec((1, 1, d), lambda l, *_: (jnp.minimum(l, nl), 0, 0)),
            pl.BlockSpec((1, 8, d), lambda l, *_: (jnp.minimum(l, nl), 0, 0)),
            pl.BlockSpec(
                (1, lenc, b_items, 2 * d),
                lambda l, *_: (jnp.minimum(l, nl), 0, 0, 0),
            ),
            pl.BlockSpec((1, d, chunk), lambda l, *_: (l, 0, 0)),   # wf chunk
            pl.BlockSpec((1, vp), lambda l, *_: (0, 0)),            # bf
            pl.BlockSpec((bk, 1), lambda l, *_: (0, 0)),            # scores
            pl.BlockSpec((bk, 1), lambda l, *_: (0, 0)),            # finished
            pl.BlockSpec(memory_space=pltpu.ANY),               # k_self (full)
            pl.BlockSpec(memory_space=pltpu.ANY),               # v_self (full)
        ],
        out_specs=[
            pl.BlockSpec((bk, 128), lambda l, *_: (0, 0)),
            pl.BlockSpec((bk, 128), lambda l, *_: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, d), dtype),
            pltpu.VMEM((2, bk, d), dtype),
            pltpu.VMEM((2, lpad, tile, d), dtype),
            pltpu.VMEM((2, lpad, tile, d), dtype),
            pltpu.VMEM((bk, d), dtype),
            pltpu.VMEM((lpad, tile, 128), jnp.float32),
            pltpu.VMEM((tile, d), jnp.float32),
            pltpu.VMEM((d, cells * chunk), dtype),
            pltpu.SemaphoreType.DMA((6,)),
        ],
    )

    if topk is None:
        topk = beam
    kernel = functools.partial(
        _decoder_kernel,
        num_layers=n, beam=beam, num_heads=num_heads, tile=tile, topk=topk,
        activation=activation, ablate=ablate,
    )

    top_s, top_i, k_new, v_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bk, 128), jnp.float32),
            jax.ShapeDtypeStruct((bk, 128), jnp.int32),
            jax.ShapeDtypeStruct(cache["k_self"].shape, dtype),
            jax.ShapeDtypeStruct(cache["v_self"].shape, dtype),
        ],
        # alias self caches: input operand index (incl. scalar prefetch) → output
        input_output_aliases={21: 2, 22: 3},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.asarray(pos, jnp.int32).reshape(1),
        x_emb.astype(dtype),
        oh,
        packed["wqkv"], packed["bqkv"], packed["wo"], packed["bo"],
        packed["wcq"], packed["bcq"], packed["wco"], packed["bco"],
        packed["w1"], packed["b1"], packed["w2"], packed["b2"], packed["ln"],
        cache["kv_cross"],
        packed["wf"], packed["bf"],
        scores.astype(jnp.float32), finished.astype(jnp.float32),
        cache["k_self"], cache["v_self"],
    )
    new_cache = {"k_self": k_new, "v_self": v_new, "kv_cross": cache["kv_cross"]}
    return top_s, top_i, new_cache
