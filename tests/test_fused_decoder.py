"""Fused decoder-step Pallas kernel vs the XLA decode path (interpreter mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fpn_mt_image_captioning_tpu.models.positional import raw_positional_encoding
from fpn_mt_image_captioning_tpu.models.transformer import Transformer
from fpn_mt_image_captioning_tpu.ops.fused_decoder import (
    fused_decode_step,
    init_fused_cache,
    pack_decoder_weights,
    round_up,
)

B, BEAM, D, H, NL, DFF, VOCAB = 2, 2, 32, 4, 2, 64, 40
MAX_LEN = 7
BK = B * BEAM


@pytest.fixture(scope="module")
def setup(rng):
    model = Transformer(
        num_layers=NL, d_model=D, num_heads=H, dff=DFF,
        input_vocab_size=16, target_vocab_size=VOCAB, max_seq_len=MAX_LEN + 1,
    )
    enc = jax.random.normal(rng, (B, 4, D))
    tar = jnp.ones((B, 4), dtype=jnp.int32)
    variables = model.init({"params": rng, "dropout": rng}, enc, tar, False, None)
    return model, variables, enc


def test_fused_matches_xla_decode(setup, rng):
    model, variables, enc = setup
    params = variables["params"]
    packed = pack_decoder_weights(params, NL, dtype=jnp.float32)
    lpad = round_up(MAX_LEN + 1, 8)

    # XLA path: beam-tiled enc
    enc_tiled = jnp.repeat(enc, BEAM, axis=0)
    xla_cache = model.apply(variables, enc_tiled, lpad, method=Transformer.init_cache)
    fused_cache = init_fused_cache(packed, enc, BEAM, MAX_LEN)
    assert fused_cache["k_self"].shape == (NL, lpad, BK, D)

    emb_table = np.asarray(params["decoder"]["embedding"]["embedding"])
    pe = raw_positional_encoding(MAX_LEN + 1, D)

    own = jnp.arange(BK, dtype=jnp.int32)
    src_flat = jnp.broadcast_to(own[:, None], (BK, lpad))          # XLA: flat rows
    src_local = jnp.broadcast_to((own % BEAM)[:, None], (BK, lpad))  # fused: in-group

    tokens_per_step = jax.random.randint(rng, (4, BK), 1, VOCAB)
    for t in range(4):
        tokens = tokens_per_step[t]
        # XLA reference step
        xla_logits, xla_cache = model.apply(
            variables, tokens, jnp.int32(t), xla_cache, src_flat,
            method=Transformer.decode_step,
        )
        # fused step (zero scores / nothing finished → total == log-softmax)
        x_emb = jnp.asarray(emb_table[np.asarray(tokens)] + pe[t])
        topk = 5
        top_s, top_i, fused_cache = fused_decode_step(
            packed, fused_cache, x_emb, src_local.T, jnp.int32(t),
            jnp.zeros((BK, 1)), jnp.zeros((BK, 1)),
            num_layers=NL, beam=BEAM, num_heads=H, topk=topk, interpret=True,
        )
        expected = jax.nn.log_softmax(np.asarray(xla_logits), axis=-1)
        exp_s, exp_i = jax.lax.top_k(jnp.asarray(expected), topk)
        np.testing.assert_allclose(
            np.asarray(top_s[:, :topk]), np.asarray(exp_s), atol=3e-4,
            err_msg=f"step {t}",
        )
        np.testing.assert_array_equal(
            np.asarray(top_i[:, :topk]), np.asarray(exp_i), err_msg=f"step {t}"
        )
        # lane-padded vocab columns must never win top-k
        assert np.all(np.asarray(top_i[:, :topk]) < VOCAB)

        if t == 2:
            # simulate a beam reorder: beam 1 adopts beam 0's ancestry
            parent = jnp.array([0, 0, 0, 0], dtype=jnp.int32)  # all -> beam 0 of own group
            group_base = (jnp.arange(BK) // BEAM) * BEAM
            flat_parent = group_base + parent
            src_flat = jnp.take(src_flat, flat_parent, axis=0)
            src_local = jnp.take(src_local, flat_parent, axis=0)
        # beam_search resets the NEXT position's ancestry to identity on EVERY
        # step (decode/beam_search.py body) — the kernel's self-term contract
        # relies on it, so the harness must maintain the same invariant
        src_flat = src_flat.at[:, t + 1].set(own)
        src_local = src_local.at[:, t + 1].set(own % BEAM)


@pytest.mark.parametrize("activation", ["relu", "gelu"])
def test_fused_respects_config_activation(rng, activation):
    """The kernel implements Config.activation itself (it used to hardcode
    leaky_relu, silently serving the wrong nonlinearity for models trained
    with --activation=relu/gelu); beam_search passes model.activation."""
    model = Transformer(
        num_layers=NL, d_model=D, num_heads=H, dff=DFF,
        input_vocab_size=16, target_vocab_size=VOCAB, max_seq_len=MAX_LEN + 1,
        activation=activation,
    )
    enc = jax.random.normal(rng, (B, 4, D))
    tar = jnp.ones((B, 4), dtype=jnp.int32)
    variables = model.init({"params": rng, "dropout": rng}, enc, tar, False, None)
    params = variables["params"]
    packed = pack_decoder_weights(params, NL, dtype=jnp.float32)
    lpad = round_up(MAX_LEN + 1, 8)

    enc_tiled = jnp.repeat(enc, BEAM, axis=0)
    xla_cache = model.apply(variables, enc_tiled, lpad, method=Transformer.init_cache)
    fused_cache = init_fused_cache(packed, enc, BEAM, MAX_LEN)

    emb_table = np.asarray(params["decoder"]["embedding"]["embedding"])
    pe = raw_positional_encoding(MAX_LEN + 1, D)
    own = jnp.arange(BK, dtype=jnp.int32)
    src_flat = jnp.broadcast_to(own[:, None], (BK, lpad))
    src_local = jnp.broadcast_to((own % BEAM)[:, None], (BK, lpad))

    tokens = jax.random.randint(rng, (BK,), 1, VOCAB)
    xla_logits, _ = model.apply(
        variables, tokens, jnp.int32(0), xla_cache, src_flat,
        method=Transformer.decode_step,
    )
    x_emb = jnp.asarray(emb_table[np.asarray(tokens)] + pe[0])
    topk = 5
    kw = dict(num_layers=NL, beam=BEAM, num_heads=H, topk=topk, interpret=True)
    top_s, top_i, _ = fused_decode_step(
        packed, fused_cache, x_emb, src_local.T, jnp.int32(0),
        jnp.zeros((BK, 1)), jnp.zeros((BK, 1)), activation=activation, **kw,
    )
    expected = jax.nn.log_softmax(np.asarray(xla_logits), axis=-1)
    exp_s, exp_i = jax.lax.top_k(jnp.asarray(expected), topk)
    np.testing.assert_allclose(np.asarray(top_s[:, :topk]), np.asarray(exp_s), atol=3e-4)
    np.testing.assert_array_equal(np.asarray(top_i[:, :topk]), np.asarray(exp_i))

    # the old hardcoded leaky_relu must now visibly disagree with this model
    wrong_s, _, _ = fused_decode_step(
        packed, init_fused_cache(packed, enc, BEAM, MAX_LEN), x_emb, src_local.T,
        jnp.int32(0), jnp.zeros((BK, 1)), jnp.zeros((BK, 1)),
        activation="leaky_relu", **kw,
    )
    assert float(np.abs(np.asarray(wrong_s[:, :topk]) - np.asarray(exp_s)).max()) > 1e-3


def test_fused_matches_xla_multichunk(rng):
    """Positions spanning several 8-slot history chunks: the chunk-gated DMA,
    ancestry matmuls, and context accumulation must agree with XLA at every
    step, including steps whose valid history partially fills a chunk."""
    max_len = 18                       # lpad = 24 -> 3 chunks
    model = Transformer(
        num_layers=NL, d_model=D, num_heads=H, dff=DFF,
        input_vocab_size=16, target_vocab_size=VOCAB, max_seq_len=max_len + 1,
    )
    enc = jax.random.normal(rng, (B, 4, D))
    tar = jnp.ones((B, 4), dtype=jnp.int32)
    variables = model.init({"params": rng, "dropout": rng}, enc, tar, False, None)
    params = variables["params"]
    packed = pack_decoder_weights(params, NL, dtype=jnp.float32)
    lpad = round_up(max_len + 1, 8)

    enc_tiled = jnp.repeat(enc, BEAM, axis=0)
    xla_cache = model.apply(variables, enc_tiled, lpad, method=Transformer.init_cache)
    fused_cache = init_fused_cache(packed, enc, BEAM, max_len)

    emb_table = np.asarray(params["decoder"]["embedding"]["embedding"])
    pe = raw_positional_encoding(max_len + 1, D)
    own = jnp.arange(BK, dtype=jnp.int32)
    src_flat = jnp.broadcast_to(own[:, None], (BK, lpad))
    src_local = jnp.broadcast_to((own % BEAM)[:, None], (BK, lpad))

    tokens_per_step = jax.random.randint(rng, (max_len, BK), 1, VOCAB)
    for t in range(max_len):
        tokens = tokens_per_step[t]
        xla_logits, xla_cache = model.apply(
            variables, tokens, jnp.int32(t), xla_cache, src_flat,
            method=Transformer.decode_step,
        )
        x_emb = jnp.asarray(emb_table[np.asarray(tokens)] + pe[t])
        top_s, top_i, fused_cache = fused_decode_step(
            packed, fused_cache, x_emb, src_local.T, jnp.int32(t),
            jnp.zeros((BK, 1)), jnp.zeros((BK, 1)),
            num_layers=NL, beam=BEAM, num_heads=H, topk=4, interpret=True,
        )
        expected = jax.nn.log_softmax(np.asarray(xla_logits), axis=-1)
        exp_s, exp_i = jax.lax.top_k(jnp.asarray(expected), 4)
        np.testing.assert_allclose(
            np.asarray(top_s[:, :4]), np.asarray(exp_s), atol=3e-4, err_msg=f"step {t}"
        )
        np.testing.assert_array_equal(
            np.asarray(top_i[:, :4]), np.asarray(exp_i), err_msg=f"step {t}"
        )
        if t in (5, 9, 13):  # reorders landing in different chunks
            parent = jnp.asarray(np.resize([1, 0], BEAM), jnp.int32)
            flat_parent = (jnp.arange(BK) // BEAM) * BEAM + jnp.tile(parent, B)
            src_flat = jnp.take(src_flat, flat_parent, axis=0)
            src_local = jnp.take(src_local, flat_parent, axis=0)
        if t + 1 < lpad:  # identity-at-current-position invariant (see above)
            src_flat = src_flat.at[:, t + 1].set(own)
            src_local = src_local.at[:, t + 1].set(own % BEAM)


def test_fused_manual_oh_path_matches_xla(rng):
    """batch*beam = 128 -> tile 128 -> the manual-DMA ancestry/vocab staging
    path (oh_manual) — the large-batch serving configuration — must agree with
    XLA just like the small-batch blocked path."""
    b, beam = 16, 8
    bk = b * beam
    model = Transformer(
        num_layers=NL, d_model=D, num_heads=H, dff=DFF,
        input_vocab_size=16, target_vocab_size=VOCAB, max_seq_len=MAX_LEN + 1,
    )
    enc = jax.random.normal(rng, (b, 4, D))
    tar = jnp.ones((b, 4), dtype=jnp.int32)
    variables = model.init({"params": rng, "dropout": rng}, enc, tar, False, None)
    params = variables["params"]
    packed = pack_decoder_weights(params, NL, dtype=jnp.float32)
    lpad = round_up(MAX_LEN + 1, 8)

    enc_tiled = jnp.repeat(enc, beam, axis=0)
    xla_cache = model.apply(variables, enc_tiled, lpad, method=Transformer.init_cache)
    fused_cache = init_fused_cache(packed, enc, beam, MAX_LEN)

    emb_table = np.asarray(params["decoder"]["embedding"]["embedding"])
    pe = raw_positional_encoding(MAX_LEN + 1, D)
    own = jnp.arange(bk, dtype=jnp.int32)
    src_flat = jnp.broadcast_to(own[:, None], (bk, lpad))
    src_local = jnp.broadcast_to((own % beam)[:, None], (bk, lpad))

    tokens_per_step = jax.random.randint(rng, (3, bk), 1, VOCAB)
    for t in range(3):
        tokens = tokens_per_step[t]
        xla_logits, xla_cache = model.apply(
            variables, tokens, jnp.int32(t), xla_cache, src_flat,
            method=Transformer.decode_step,
        )
        x_emb = jnp.asarray(emb_table[np.asarray(tokens)] + pe[t])
        top_s, top_i, fused_cache = fused_decode_step(
            packed, fused_cache, x_emb, src_local.T, jnp.int32(t),
            jnp.zeros((bk, 1)), jnp.zeros((bk, 1)),
            num_layers=NL, beam=beam, num_heads=H, topk=4, interpret=True,
        )
        expected = jax.nn.log_softmax(np.asarray(xla_logits), axis=-1)
        exp_s, exp_i = jax.lax.top_k(jnp.asarray(expected), 4)
        np.testing.assert_allclose(
            np.asarray(top_s[:, :4]), np.asarray(exp_s), atol=3e-4, err_msg=f"step {t}"
        )
        np.testing.assert_array_equal(
            np.asarray(top_i[:, :4]), np.asarray(exp_i), err_msg=f"step {t}"
        )
        if t == 1:  # one reorder inside the window
            parent = jnp.asarray(np.resize([1, 0], beam), jnp.int32)
            flat_parent = (jnp.arange(bk) // beam) * beam + jnp.tile(parent, b)
            src_flat = jnp.take(src_flat, flat_parent, axis=0)
            src_local = jnp.take(src_local, flat_parent, axis=0)
        src_flat = src_flat.at[:, t + 1].set(own)
        src_local = src_local.at[:, t + 1].set(own % beam)


def test_fused_wide_vocab_scores_and_freeze(rng):
    """Multi-lane-chunk vocabulary (Vp = 384 > 128) with NONZERO running
    scores and a mix of finished/unfinished rows: the final cell's beam
    freeze (finished rows collapse to column 0 at their carried score) and
    the iterative top-k across several 128-lane chunks must match the XLA
    formula exactly. The other unit tests pass zero scores / nothing
    finished, leaving this path covered only by whole-engine parity tests."""
    vocab = 300                     # round_up(300, 128) = 384 -> 3 lane chunks
    model = Transformer(
        num_layers=NL, d_model=D, num_heads=H, dff=DFF,
        input_vocab_size=16, target_vocab_size=vocab, max_seq_len=MAX_LEN + 1,
    )
    enc = jax.random.normal(rng, (B, 4, D))
    tar = jnp.ones((B, 4), dtype=jnp.int32)
    variables = model.init({"params": rng, "dropout": rng}, enc, tar, False, None)
    params = variables["params"]
    packed = pack_decoder_weights(params, NL, dtype=jnp.float32)
    lpad = round_up(MAX_LEN + 1, 8)

    enc_tiled = jnp.repeat(enc, BEAM, axis=0)
    xla_cache = model.apply(variables, enc_tiled, lpad, method=Transformer.init_cache)
    fused_cache = init_fused_cache(packed, enc, BEAM, MAX_LEN)

    emb_table = np.asarray(params["decoder"]["embedding"]["embedding"])
    pe = raw_positional_encoding(MAX_LEN + 1, D)
    own = jnp.arange(BK, dtype=jnp.int32)
    src_flat = jnp.broadcast_to(own[:, None], (BK, lpad))
    src_local = jnp.broadcast_to((own % BEAM)[:, None], (BK, lpad))

    scores = jnp.asarray([[-1.5], [0.25], [-7.0], [3.5]], jnp.float32)
    finished = jnp.asarray([[0.0], [1.0], [0.0], [1.0]], jnp.float32)

    tokens = jax.random.randint(rng, (BK,), 1, vocab)
    xla_logits, xla_cache = model.apply(
        variables, tokens, jnp.int32(0), xla_cache, src_flat,
        method=Transformer.decode_step,
    )
    x_emb = jnp.asarray(emb_table[np.asarray(tokens)] + pe[0])
    topk = BEAM
    top_s, top_i, fused_cache = fused_decode_step(
        packed, fused_cache, x_emb, src_local.T, jnp.int32(0),
        scores, finished,
        num_layers=NL, beam=BEAM, num_heads=H, topk=topk, interpret=True,
    )

    # XLA formula: finished rows emit only padding (col 0) at prob 1
    lp = jax.nn.log_softmax(jnp.asarray(np.asarray(xla_logits)), axis=-1)
    pad_row = jnp.full((1, vocab), -1e9).at[0, 0].set(0.0)
    lp = finished * pad_row + (1.0 - finished) * lp
    total = lp + scores
    exp_s, exp_i = jax.lax.top_k(total, topk)

    np.testing.assert_allclose(
        np.asarray(top_s[:, :topk]), np.asarray(exp_s), atol=3e-4
    )
    np.testing.assert_array_equal(np.asarray(top_i[:, :topk]), np.asarray(exp_i))
    assert np.all(np.asarray(top_i[:, :topk]) < vocab)  # padded lanes never win
    # finished rows: winner is the padding column at exactly the carried score
    np.testing.assert_allclose(
        np.asarray(top_s[[1, 3], 0]), np.asarray(scores[[1, 3], 0]), atol=1e-6
    )
    assert np.all(np.asarray(top_i[[1, 3], 0]) == 0)


def test_fused_cache_positions_written(setup, rng):
    """The aliased HBM cache must contain the projected K rows at each position."""
    model, variables, enc = setup
    params = variables["params"]
    packed = pack_decoder_weights(params, NL, dtype=jnp.float32)
    fused_cache = init_fused_cache(packed, enc, BEAM, MAX_LEN)
    lpad = fused_cache["k_self"].shape[1]

    x_emb = jax.random.normal(rng, (BK, D))
    src_local = jnp.zeros((lpad, BK), jnp.int32)
    _s, _i, fused_cache = fused_decode_step(
        packed, fused_cache, x_emb, src_local, jnp.int32(0),
        jnp.zeros((BK, 1)), jnp.zeros((BK, 1)),
        num_layers=NL, beam=BEAM, num_heads=H, interpret=True,
    )
    # layer-0 K at position 0 == x_emb @ Wk + bk
    wqkv, bqkv = np.asarray(packed["wqkv"][0]), np.asarray(packed["bqkv"][0, 0])
    expect_k = np.asarray(x_emb) @ wqkv[:, D : 2 * D] + bqkv[D : 2 * D]
    np.testing.assert_allclose(
        np.asarray(fused_cache["k_self"][0, 0]), expect_k, atol=2e-4
    )
    # untouched positions stay zero
    assert np.all(np.asarray(fused_cache["k_self"][0, 1]) == 0)
