"""Beam-search engine tests: greedy equivalence, naive-reference beam parity,
degenerate parity mode (SURVEY.md §2 C23)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fpn_mt_image_captioning_tpu.decode.beam_search import beam_search, greedy_decode
from fpn_mt_image_captioning_tpu.models.positional import create_look_ahead_mask
from fpn_mt_image_captioning_tpu.models.transformer import Transformer

VOCAB = 23
START, END = 2, 3
MAX_LEN = 7


@pytest.fixture(scope="module")
def small_model():
    key = jax.random.PRNGKey(1)
    model = Transformer(
        num_layers=2, d_model=16, num_heads=2, dff=32,
        input_vocab_size=16, target_vocab_size=VOCAB, max_seq_len=MAX_LEN + 1,
    )
    enc_output = jax.random.normal(key, (2, 4, 16))
    tar = jnp.ones((2, 4), dtype=jnp.int32)
    variables = model.init(
        {"params": key, "dropout": key}, enc_output, tar, False, None
    )
    return model, variables, enc_output


def full_logits(model, variables, enc_output, prefix):
    """Teacher-forced forward over the whole prefix (the reference's decode style,
    utils/pipeline.py:105-112) — returns last-position logits."""
    tar = jnp.asarray(prefix, jnp.int32)
    mask = create_look_ahead_mask(tar.shape[1])[None, None]
    logits, _ = model.apply(variables, enc_output, tar, False, mask)
    return np.asarray(logits[:, -1, :], np.float64)


def naive_beam(model, variables, enc_output_1, beam_n, max_len):
    """Log-space beam search via full re-forward, for one batch item."""
    beams = [([START], 0.0, False)]
    for _ in range(max_len):
        if all(b[2] for b in beams):
            break
        candidates = []
        for seq, score, fin in beams:
            if fin:
                candidates.append((seq + [0], score, True))
                continue
            logits = full_logits(
                model, variables, enc_output_1, np.array([seq])
            )[0]
            logp = logits - np.log(np.exp(logits - logits.max()).sum()) - logits.max()
            for tok in range(VOCAB):
                candidates.append(
                    (seq + [tok], score + logp[tok], tok == END)
                )
        candidates.sort(key=lambda c: -c[1])
        beams = candidates[:beam_n]
    return beams


def test_greedy_matches_manual(small_model):
    model, variables, enc = small_model
    seqs, lengths = greedy_decode(
        model, variables, enc, max_len=MAX_LEN, start_token=START, end_token=END
    )
    for b in range(enc.shape[0]):
        prefix = [START]
        for _ in range(MAX_LEN):
            logits = full_logits(model, variables, enc[b : b + 1], np.array([prefix]))
            tok = int(np.argmax(logits[0]))
            if tok == END:
                break
            prefix.append(tok)
        expected = prefix[1:]
        got = [int(x) for x in seqs[b][: lengths[b]]]
        assert got == expected, (b, got, expected)


def test_beam_matches_naive_reference(small_model):
    model, variables, enc = small_model
    K = 3
    seqs, lengths, scores = beam_search(
        model, variables, enc,
        beam_n=K, max_len=MAX_LEN, start_token=START, end_token=END,
    )
    for b in range(enc.shape[0]):
        beams = naive_beam(model, variables, enc[b : b + 1], K, MAX_LEN)
        best_seq, best_score, _fin = beams[0]
        # strip start and trailing end/pads
        expected = [t for t in best_seq[1:] if t not in (0, END)]
        # naive list may include tokens after END from the pad-continuation: cut at END
        if END in best_seq:
            expected = best_seq[1 : best_seq.index(END)]
        got = [int(x) for x in seqs[b][: lengths[b]]]
        assert got == expected, (b, got, expected)
        np.testing.assert_allclose(float(scores[b]), best_score, atol=1e-3)


def test_parity_mode_is_degenerate_greedy(small_model):
    """All beams tie-break to the same token every step — the reference's
    duplicate-beam quirk means beam=K equals greedy."""
    model, variables, enc = small_model
    parity_seqs, parity_len, _ = beam_search(
        model, variables, enc,
        beam_n=4, max_len=MAX_LEN, start_token=START, end_token=END, parity=True,
    )
    greedy_seqs, greedy_len = greedy_decode(
        model, variables, enc, max_len=MAX_LEN, start_token=START, end_token=END
    )
    np.testing.assert_array_equal(parity_seqs, greedy_seqs)
    np.testing.assert_array_equal(parity_len, greedy_len)


# ---------------------------------------------------------------------------
# Exact reference-loop parity (VERDICT r3 item 8): clean-room transcription of
# /root/reference/utils/pipeline.py:82-154 run on the same model, including
# crafted tie cases where the quirks actually bite.


def reference_beam_transcription(model, variables, enc_1, beam_n, max_len):
    """Literal clean-room transcription of the reference's predict loop
    (``utils/pipeline.py:99-154``, behavior-by-reading): raw-probability
    product scoring from beam_prob=1, flat top-k with tf.math.top_k's
    lowest-index tie-break, per-step greedy best-beam <end> check with early
    return, and ``beam_result[1:-1]`` / ``[1:]`` stripping (trailing <end>
    only — mid-sequence <end>s survive)."""
    vocab = model.target_vocab_size
    beam_output = np.full((beam_n, 1), START, np.int64)
    beam_prob = np.ones((beam_n, 1), np.float64)
    enc_tiled = jnp.repeat(enc_1, beam_n, axis=0)
    beam_result = None
    for _ in range(max_len):
        logits = full_logits(model, variables, enc_tiled, beam_output)  # (K, V)
        e = np.exp(logits - logits.max(axis=-1, keepdims=True))
        preds = e / e.sum(axis=-1, keepdims=True)                       # softmax
        candidates = (preds * beam_prob).reshape(-1)                    # (K*V,)
        # tf.math.top_k: descending order, ties broken toward lower index
        top = np.argsort(-candidates, kind="stable")[:beam_n]
        i_beams = top // vocab
        j_beams = top % vocab
        beam_output = np.concatenate(
            [beam_output[i_beams], j_beams[:, None]], axis=1
        )
        beam_prob = candidates[top][:, None]
        predicted = int(np.argmax(beam_prob[:, 0]))  # first max = best beam
        beam_result = beam_output[predicted]
        if beam_result[-1] == END:
            return list(beam_result[1:-1])
    if beam_result[-1] == END:
        return list(beam_result[1:-1])
    return list(beam_result[1:])


def _parity_vs_transcription(model, variables, enc, beam_n=4):
    got_seqs, got_len, _ = beam_search(
        model, variables, enc,
        beam_n=beam_n, max_len=MAX_LEN, start_token=START, end_token=END,
        parity=True,
    )
    got_seqs, got_len = np.asarray(got_seqs), np.asarray(got_len)
    for b in range(enc.shape[0]):
        expected = reference_beam_transcription(
            model, variables, enc[b : b + 1], beam_n, MAX_LEN
        )
        got = [int(x) for x in got_seqs[b][: got_len[b]]]
        assert got == expected, (b, got, expected)


def test_parity_matches_reference_transcription(small_model):
    """Random weights (no ties): the engine must trace the reference loop
    exactly — scoring order, stop condition, stripping."""
    model, variables, enc = small_model
    _parity_vs_transcription(model, variables, enc)


def _with_final_layer(variables, kernel_fn, bias_fn):
    import flax

    flat = flax.traverse_util.flatten_dict(variables, sep="/")
    kkey = next(k for k in flat if k.endswith("final_layer/kernel"))
    bkey = next(k for k in flat if k.endswith("final_layer/bias"))
    flat = dict(flat)
    flat[kkey] = kernel_fn(flat[kkey])
    flat[bkey] = bias_fn(flat[bkey])
    return flax.traverse_util.unflatten_dict(flat, sep="/")


def test_parity_crafted_all_way_tie(small_model):
    """Zeroed final layer ⇒ every logit exactly equal at every step: the flat
    top-k's lowest-index tie-break routes ALL K continuations through beam 0
    with tokens 0..K-1 (the reference quirk), the <end> beam created at step 1
    is discarded at step 2 (the reference never freezes), and the loop runs to
    max_len returning K repeats of token 0."""
    model, variables, enc = small_model
    crafted = _with_final_layer(
        variables, lambda k: jnp.zeros_like(k), lambda b: jnp.zeros_like(b)
    )
    _parity_vs_transcription(model, crafted, enc)
    # pin the expected degenerate output explicitly, not only via transcription
    seqs, lens, _ = beam_search(
        model, crafted, enc,
        beam_n=4, max_len=MAX_LEN, start_token=START, end_token=END, parity=True,
    )
    np.testing.assert_array_equal(np.asarray(lens), MAX_LEN)
    np.testing.assert_array_equal(np.asarray(seqs), 0)


def test_parity_crafted_two_way_tie_no_end(small_model):
    """Tokens 5 and 7 exactly tied at the top every step: beams alternate
    5/7 continuations from beam-major tie-breaks; best beam never ends —
    result is token 5 repeated to max_len."""
    model, variables, enc = small_model
    crafted = _with_final_layer(
        variables,
        lambda k: jnp.zeros_like(k),
        lambda b: jnp.zeros_like(b).at[5].set(1.0).at[7].set(1.0),
    )
    _parity_vs_transcription(model, crafted, enc)
    seqs, lens, _ = beam_search(
        model, crafted, enc,
        beam_n=4, max_len=MAX_LEN, start_token=START, end_token=END, parity=True,
    )
    np.testing.assert_array_equal(np.asarray(lens), MAX_LEN)
    np.testing.assert_array_equal(np.asarray(seqs), 5)


def test_parity_crafted_end_tie_stops_immediately(small_model):
    """<end> tied with token 5 at the top: lowest-index tie-break makes the
    best beam emit <end> at step 1 — the reference returns an EMPTY caption
    (beam_result[1:-1] of [<start>, <end>])."""
    model, variables, enc = small_model
    crafted = _with_final_layer(
        variables,
        lambda k: jnp.zeros_like(k),
        lambda b: jnp.zeros_like(b).at[END].set(1.0).at[5].set(1.0),
    )
    _parity_vs_transcription(model, crafted, enc)
    seqs, lens, _ = beam_search(
        model, crafted, enc,
        beam_n=4, max_len=MAX_LEN, start_token=START, end_token=END, parity=True,
    )
    np.testing.assert_array_equal(np.asarray(lens), 0)
    np.testing.assert_array_equal(np.asarray(seqs), 0)


def test_teacher_forced_reforward_reproduces_decode_time_computation(small_model):
    """VERDICT r2 weak #6: ``Pipeline.predict_with_attention`` recovers the
    decoder attention-weight dict by teacher-forcing the decoded sequence back
    through the full decoder, claiming numerical equivalence with decode-time
    weights for the winning beam. Causality makes that claim checkable: with
    the look-ahead mask, position t of the teacher-forced forward sees exactly
    the prefix the decode loop saw when it produced token t+1 — so for a
    greedy (beam-1) decode, argmax of the re-forward's position-t logits must
    equal the decoded token t+1, i.e. the re-forward (and hence its attention
    weights) reproduces the decode-time computation step for step."""
    from fpn_mt_image_captioning_tpu.models.positional import create_masks

    model, variables, enc = small_model
    seqs, lengths = greedy_decode(
        model, variables, enc, max_len=MAX_LEN, start_token=START, end_token=END
    )
    seqs, lengths = np.asarray(seqs), np.asarray(lengths)

    for b in range(enc.shape[0]):
        n = int(lengths[b])
        decoded = list(seqs[b][:n]) + ([END] if n < MAX_LEN else [])
        prefix = jnp.asarray([[START] + decoded], jnp.int32)[:, :-1]
        logits, attn = model.apply(
            variables, enc[b : b + 1], prefix, False, create_masks(prefix)
        )
        steps = np.argmax(np.asarray(logits[0]), axis=-1)
        np.testing.assert_array_equal(steps, np.asarray(decoded))
        # the attention dict carries every layer's self/cross weights over the
        # exact prefixes the decode loop attended to
        assert f"decoder_layer{model.num_layers}_block2" in attn
        a = np.asarray(attn[f"decoder_layer{model.num_layers}_block2"])
        assert a.shape == (1, model.num_heads, prefix.shape[1], enc.shape[1])


# ---------------------------------------------------------------------------
# sample_decode (serving extra: temperature / top-k / nucleus sampling)


def test_sample_decode_zero_temperature_is_greedy(small_model):
    from fpn_mt_image_captioning_tpu.decode.beam_search import sample_decode

    model, variables, enc = small_model
    g_seqs, g_lens = greedy_decode(
        model, variables, enc, max_len=MAX_LEN, start_token=START, end_token=END
    )
    for kwargs in (
        {"temperature": 1e-7},            # temperature -> 0: argmax
        {"top_k": 1},                      # top-k=1: argmax survives alone
        {"top_p": 1e-7},                   # nucleus -> 0: first token only
        # top_p=0 exactly: the unclamped threshold kept NOTHING (0 < 0 is
        # False), silently degrading to uniform sampling over the whole vocab
        {"top_p": 0.0},
    ):
        s_seqs, s_lens = sample_decode(
            model, variables, enc, jax.random.PRNGKey(0),
            max_len=MAX_LEN, start_token=START, end_token=END, **kwargs
        )
        np.testing.assert_array_equal(np.asarray(s_lens), np.asarray(g_lens), kwargs)
        np.testing.assert_array_equal(np.asarray(s_seqs), np.asarray(g_seqs), kwargs)


def test_nucleus_keep_mask_is_positional():
    """The top-p mask must keep EXACTLY the smallest descending-prob prefix
    reaching the mass — a value-based prob cutoff kept every token tied with
    the boundary probability, overshooting the requested nucleus (probs
    [.5,.25,.25] at top_p 0.6 kept all three)."""
    import jax.numpy as jnp

    from fpn_mt_image_captioning_tpu.decode.beam_search import _nucleus_keep

    probs = jnp.asarray([
        [0.5, 0.25, 0.25, 0.0],   # tie at the boundary: keep exactly 2
        [0.25, 0.25, 0.25, 0.25], # all tied: 0.6 mass -> 3 tokens
        [0.97, 0.01, 0.01, 0.01], # peaked: top token alone
    ])
    keep = np.asarray(_nucleus_keep(probs, jnp.asarray([0.6, 0.6, 0.6])))
    assert keep.sum(axis=1).tolist() == [2, 3, 1]
    assert keep[0, 0] and keep[2, 0]          # the top token always survives
    # top_p <= 0 clamps to keep the single top token (not uniform-everything)
    keep0 = np.asarray(_nucleus_keep(probs, jnp.asarray([0.0, 0.0, 0.0])))
    assert keep0.sum(axis=1).tolist() == [1, 1, 1]


def test_sample_decode_deterministic_per_seed(small_model):
    from fpn_mt_image_captioning_tpu.decode.beam_search import sample_decode

    model, variables, enc = small_model
    a = sample_decode(model, variables, enc, jax.random.PRNGKey(7),
                      max_len=MAX_LEN, start_token=START, end_token=END,
                      temperature=1.0)
    b = sample_decode(model, variables, enc, jax.random.PRNGKey(7),
                      max_len=MAX_LEN, start_token=START, end_token=END,
                      temperature=1.0)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    # high temperature across many seeds must produce SOME variation
    outs = {
        np.asarray(sample_decode(
            model, variables, enc, jax.random.PRNGKey(s),
            max_len=MAX_LEN, start_token=START, end_token=END, temperature=3.0,
        )[0]).tobytes()
        for s in range(8)
    }
    assert len(outs) > 1


def test_sample_decode_per_row_settings(small_model):
    """Per-row temperature: a near-zero row reproduces greedy while its
    neighbor samples freely — one compiled program serves mixed requests."""
    from fpn_mt_image_captioning_tpu.decode.beam_search import sample_decode

    model, variables, enc = small_model
    g_seqs, _ = greedy_decode(
        model, variables, enc, max_len=MAX_LEN, start_token=START, end_token=END
    )
    s_seqs, s_lens = sample_decode(
        model, variables, enc, jax.random.PRNGKey(11),
        max_len=MAX_LEN, start_token=START, end_token=END,
        temperature=jnp.asarray([1e-7, 2.0]),
    )
    np.testing.assert_array_equal(np.asarray(s_seqs)[0], np.asarray(g_seqs)[0])


def test_sample_decode_output_contract(small_model):
    """Stripped-sequence contract (as beam_search): no <end> in the kept
    region, zeros beyond lengths, lengths <= MAX_LEN."""
    from fpn_mt_image_captioning_tpu.decode.beam_search import sample_decode

    model, variables, enc = small_model
    seqs, lens = sample_decode(
        model, variables, enc, jax.random.PRNGKey(3),
        max_len=MAX_LEN, start_token=START, end_token=END, temperature=1.5,
    )
    seqs, lens = np.asarray(seqs), np.asarray(lens)
    assert seqs.shape == (2, MAX_LEN) and (lens <= MAX_LEN).all()
    for row, n in zip(seqs, lens):
        assert END not in row[:n]
        assert (row[n:] == 0).all()
