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
