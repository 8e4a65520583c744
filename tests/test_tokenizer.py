"""Tokenizer parity tests: Keras semantics, JSON wire-format round-trip,
reference fit/sequence quirks (SURVEY.md §2 C5)."""

import json

import numpy as np

from fpn_mt_image_captioning_tpu.data.tokenizer import (
    REFERENCE_FILTERS,
    Tokenizer,
    load_tokenizer_from_path,
    pad_sequences,
    store_tokenizer_to_path,
    text_to_word_sequence,
)

CAPTIONS = [
    "<start> the heart is normal. lungs are clear. <end>",
    "<start> no acute disease. heart size normal <end>",
    "<start> lungs are clear <end>",
]


def make_tokenizer():
    tok = Tokenizer(num_words=10000, oov_token="unk", filters=REFERENCE_FILTERS)
    tok.fit_on_texts(CAPTIONS)
    tok.add_padding_token()
    return tok


def test_word_sequence_keeps_punctuation_and_angle_brackets():
    # '.' ',' '<' '>' are not in the reference filter set (dataset.py:63)
    seq = text_to_word_sequence("<start> Heart, is normal. <end>", REFERENCE_FILTERS)
    assert seq == ["<start>", "heart,", "is", "normal.", "<end>"]


def test_fit_assigns_oov_index_1_and_counts_order():
    tok = make_tokenizer()
    assert tok.word_index["unk"] == 1
    # most frequent words get the smallest indices (stable on ties)
    assert tok.word_index["<start>"] in (2, 3)
    assert tok.word_index["<end>"] in (2, 3)
    assert tok.word_index[""] == 0
    assert tok.index_word[0] == ""


def test_texts_to_sequences_oov_and_roundtrip():
    tok = make_tokenizer()
    [seq] = tok.texts_to_sequences(["<start> zebra lungs are clear <end>"])
    assert seq[1] == tok.word_index["unk"]  # zebra unseen → oov
    text = tok.sequences_to_texts([seq])[0]
    assert "unk" in text and "lungs" in text


def test_json_roundtrip_through_file(tmp_path):
    tok = make_tokenizer()
    path = tmp_path / "_tokenizer.json"
    store_tokenizer_to_path(tok, path)
    # file must be double-encoded (reference dataset.py:137-146): outer load is a str
    with open(path) as f:
        outer = json.load(f)
    assert isinstance(outer, str)
    tok2 = load_tokenizer_from_path(path)
    assert tok2.word_index == tok.word_index
    assert tok2.index_word == tok.index_word
    assert tok2.num_words == tok.num_words
    assert tok2.oov_token == "unk"
    assert tok2.texts_to_sequences(CAPTIONS) == tok.texts_to_sequences(CAPTIONS)


def test_pad_sequences_post():
    out = pad_sequences([[1, 2], [3]], maxlen=4)
    assert out.shape == (2, 4)
    np.testing.assert_array_equal(out[0], [1, 2, 0, 0])
    np.testing.assert_array_equal(out[1], [3, 0, 0, 0])
