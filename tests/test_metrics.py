"""Caption-metric tests: hand-computed golden values for BLEU/ROUGE-L/CIDEr-D/
METEOR, Porter stemmer vectors, and the MetricEval facade contract."""

import json
import math

import pytest

from fpn_mt_image_captioning_tpu.data.metrics import (
    CiderScorer,
    MetricEval,
    corpus_bleu,
    meteor,
    ptb_tokenize,
    rouge_l,
)
from fpn_mt_image_captioning_tpu.utils.porter import porter_stem


def test_ptb_tokenize():
    assert ptb_tokenize("The heart is Normal.") == ["the", "heart", "is", "normal"]
    assert ptb_tokenize("no acute disease, stable!") == ["no", "acute", "disease", "stable"]
    assert ptb_tokenize("") == []


def test_porter_stem_vectors():
    # classic examples from Porter's paper
    for word, stem in [
        ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
        ("caress", "caress"), ("cats", "cat"), ("feed", "feed"),
        ("agreed", "agre"), ("plastered", "plaster"), ("motoring", "motor"),
        ("sing", "sing"), ("conflated", "conflat"), ("troubled", "troubl"),
        ("sized", "size"), ("hopping", "hop"), ("relational", "relat"),
        ("conditional", "condit"), ("rational", "ration"),
    ]:
        assert porter_stem(word) == stem, word


def _one(tokens):
    return {1: [tokens]}


def test_bleu_perfect_match():
    hyp = _one(["the", "cat", "sat", "on", "the", "mat"])
    scores = corpus_bleu(hyp, hyp)
    assert scores == pytest.approx([1.0, 1.0, 1.0, 1.0])


def test_bleu_hand_computed():
    hyp = {1: [["the", "cat", "the", "cat"]]}
    ref = {1: [["the", "cat", "sat"]]}
    scores = corpus_bleu(hyp, ref)
    # unigrams: clipped the=1, cat=1 → 2/4; bigrams: "the cat"×2 clipped to 1 → 1/3
    # hyp_len=4 > ref_len=3 → bp=1
    assert scores[0] == pytest.approx(0.5)
    assert scores[1] == pytest.approx(math.sqrt(0.5 * (1 / 3)))


def test_bleu_brevity_penalty():
    hyp = {1: [["the", "cat"]]}
    ref = {1: [["the", "cat", "sat", "on", "mat"]]}
    scores = corpus_bleu(hyp, ref)
    bp = math.exp(1 - 5 / 2)
    assert scores[0] == pytest.approx(bp * 1.0)


def test_rouge_l_hand_computed():
    hyp = {1: [["the", "cat", "sat"]]}
    ref = {1: [["the", "cat", "on", "the", "mat"]]}
    # LCS = 2 ("the cat"); P = 2/3, R = 2/5, beta=1.2
    p, r, b = 2 / 3, 2 / 5, 1.2
    expected = (1 + b * b) * p * r / (r + b * b * p)
    assert rouge_l(hyp, ref) == pytest.approx(expected)


def test_cider_identical_corpus():
    hyps = {
        1: [["a", "chest", "xray", "with", "no", "findings"]],
        2: [["heart", "size", "is", "normal", "today"]],
    }
    corpus, per_img = CiderScorer().compute(hyps, hyps)
    # identical hyp/ref with distinct captions → cosine 1 per n, delta 0 → 10.0
    assert corpus == pytest.approx(10.0, abs=1e-6)
    assert per_img[1] == pytest.approx(10.0, abs=1e-6)


def test_cider_orders_quality():
    refs = {
        1: [["the", "heart", "is", "normal"]],
        2: [["lungs", "are", "clear", "bilaterally"]],
    }
    good = {1: [["the", "heart", "is", "normal"]], 2: [["lungs", "are", "hazy"]]}
    bad = {1: [["pleural", "effusion", "seen"]], 2: [["lungs", "are", "hazy"]]}
    c_good, _ = CiderScorer().compute(good, refs)
    c_bad, _ = CiderScorer().compute(bad, refs)
    assert c_good > c_bad


def test_meteor_identical_and_stem_match():
    hyp = {1: [["the", "lungs", "are", "clear"]]}
    score = meteor(hyp, hyp)
    # P=R=1, F=1, chunks=1, matches=4 → penalty = 0.5·(1/4)^3
    assert score == pytest.approx(1 - 0.5 * (1 / 4) ** 3)
    # stem module: "clearing" matches "clear"
    hyp2 = {1: [["the", "lungs", "are", "clearing"]]}
    assert meteor(hyp2, hyp) > 0.8


def test_metric_eval_facade(tmp_path):
    ann = {
        "images": [{"id": 1, "file_name": "a.png"}, {"id": 2, "file_name": "b.png"}],
        "annotations": [
            {"id": 10, "image_id": 1, "caption": "the heart is normal"},
            {"id": 11, "image_id": 1, "caption": "normal heart size"},
            {"id": 12, "image_id": 2, "caption": "lungs are clear"},
        ],
    }
    (tmp_path / "annotations").mkdir()
    with open(tmp_path / "annotations" / "captions_val2017.json", "w") as f:
        json.dump(ann, f)
    res = [
        {"image_id": 1, "caption": "the heart is normal"},
        {"image_id": 2, "caption": "lungs are clear"},
    ]
    res_file = tmp_path / "result.json"
    with open(res_file, "w") as f:
        json.dump(res, f)

    me = MetricEval(str(tmp_path), "val2017")
    cider = me(str(res_file))
    # image 1 has two refs; CIDEr averages over refs so an exact match to one
    # of them lands strictly between 5 and 10
    assert 5.0 < cider < 10.0
    assert set(me.eval) == {"Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "METEOR", "ROUGE_L", "CIDEr"}
    assert me.eval["Bleu_1"] == pytest.approx(1.0)
    assert me.eval["ROUGE_L"] == pytest.approx(1.0)
