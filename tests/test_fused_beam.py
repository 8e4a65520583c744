"""Fused-kernel beam search must match the XLA beam search exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from fpn_mt_image_captioning_tpu.decode.beam_search import beam_search
from fpn_mt_image_captioning_tpu.models.transformer import Transformer

VOCAB, START, END, MAX_LEN = 23, 2, 3, 7


@pytest.fixture(scope="module")
def small_model():
    key = jax.random.PRNGKey(7)
    model = Transformer(
        num_layers=2, d_model=32, num_heads=4, dff=64,
        input_vocab_size=16, target_vocab_size=VOCAB, max_seq_len=MAX_LEN + 1,
    )
    enc_output = jax.random.normal(key, (2, 4, 32))
    tar = jnp.ones((2, 4), dtype=jnp.int32)
    variables = model.init({"params": key, "dropout": key}, enc_output, tar, False, None)
    return model, variables, enc_output


@pytest.mark.parametrize("beam_n", [1, 4])
def test_fused_beam_matches_xla(small_model, beam_n):
    """Default (production) bf16 weight packing: a RELATIVE perturbation, so
    with random toy weights some steps are near-ties and a tie flip
    propagates — free-running beams can legitimately diverge (the same
    physics measured on-chip; CLAUDE.md round-3 fused-kernel validation).
    The exact-parity gate is the f32-pack test below; here we bound the bf16
    divergence: winning-beam scores agree to bf16 precision and token
    agreement stays high."""
    model, variables, enc = small_model
    ref_seqs, ref_len, ref_scores = beam_search(
        model, variables, enc,
        beam_n=beam_n, max_len=MAX_LEN, start_token=START, end_token=END,
    )
    with pltpu.force_tpu_interpret_mode():
        f_seqs, f_len, f_scores = beam_search(
            model, variables, enc,
            beam_n=beam_n, max_len=MAX_LEN, start_token=START, end_token=END,
            fused=True,
        )
    agree = (np.asarray(ref_seqs) == np.asarray(f_seqs)).mean()
    assert agree >= 0.7, f"token agreement {agree:.2f} below the bf16 bound"
    assert np.abs(np.asarray(ref_len) - np.asarray(f_len)).max() <= 2
    # a flipped near-tie selects a sequence whose score is within the tie gap
    np.testing.assert_allclose(
        np.asarray(ref_scores), np.asarray(f_scores), rtol=5e-3, atol=5e-3
    )


@pytest.mark.parametrize("beam_n", [1, 4])
def test_fused_beam_matches_xla_exactly_at_f32(small_model, beam_n):
    """With pack_dtype=float32 the fused engine picks IDENTICAL sequences vs
    the XLA path, and scores agree to f32 accumulation noise (~1e-6 — the
    kernel's chunked log-softmax reduces in a different order, so bit-exact
    score equality is compiler-dependent even in interpreter mode; the
    production bf16 packing is the only *choice-flipping* divergence source.
    scripts/verify_fused_on_tpu.py runs this comparison on the real chip)."""
    model, variables, enc = small_model
    ref_seqs, ref_len, ref_scores = beam_search(
        model, variables, enc,
        beam_n=beam_n, max_len=MAX_LEN, start_token=START, end_token=END,
    )
    with pltpu.force_tpu_interpret_mode():
        f_seqs, f_len, f_scores = beam_search(
            model, variables, enc,
            beam_n=beam_n, max_len=MAX_LEN, start_token=START, end_token=END,
            fused=True, pack_dtype=jnp.float32,
        )
    np.testing.assert_array_equal(np.asarray(ref_seqs), np.asarray(f_seqs))
    np.testing.assert_array_equal(np.asarray(ref_len), np.asarray(f_len))
    np.testing.assert_allclose(
        np.asarray(ref_scores), np.asarray(f_scores), rtol=1e-5, atol=1e-5
    )
