"""METEOR (pure-Python approximation).

pycocoevalcap scores METEOR through a bundled Java jar; this framework instead
implements the classic METEOR algorithm (Banerjee & Lavie 2005) in Python with
two match modules — exact and Porter-stem — and the standard parameters
(alpha = 0.9, beta = 3.0, gamma = 0.5):

    F_mean  = P·R / (alpha·P + (1 - alpha)·R)
    penalty = gamma · (chunks / matches)^beta
    score   = F_mean · (1 - penalty)

Multiple references: the per-reference maximum is taken; the corpus score is the
mean over images.

Validation (tests/test_metrics_crosscheck.py, vs nltk's INDEPENDENT
implementation of the same algorithm with an empty WordNet):

  * captions without repeated words: EXACT agreement (unique alignment —
    validates matching, chunk counting, F-mean and penalty bit-for-bit);
  * realistic caption corpus: |delta| = 0.0011 (greedy alignment direction
    differs only in chunk tie-breaks among duplicate words; match counts are
    always identical);
  * pathological duplicate-heavy stress set: mean per-pair |delta| = 0.024.

Residual (unmeasurable offline — no Java, no jar, no WordNet/paraphrase data,
zero egress) vs pycocoevalcap's METEOR-1.5 jar (`/root/reference/
dataset.py:277-298`): the WordNet-synonym and paraphrase match modules and
METEOR-1.5's retuned parameters/module weights. Not used for checkpoint gating
(CIDEr gates saves, as in the reference).
"""

from __future__ import annotations

from ...utils.porter import porter_stem

__all__ = ["meteor"]

_ALPHA, _BETA, _GAMMA = 0.9, 3.0, 0.5


def _align(hyp: list[str], ref: list[str]) -> list[tuple[int, int]]:
    """Greedy two-stage unigram alignment: exact matches first (leftmost), then
    Porter-stem matches over the remainder. Returns (hyp_idx, ref_idx) pairs."""
    matches: list[tuple[int, int]] = []
    used_h: set[int] = set()
    used_r: set[int] = set()

    for key_fn in (lambda w: w, porter_stem):
        ref_keys = {}
        for j, w in enumerate(ref):
            if j not in used_r:
                ref_keys.setdefault(key_fn(w), []).append(j)
        for i, w in enumerate(hyp):
            if i in used_h:
                continue
            k = key_fn(w)
            if ref_keys.get(k):
                j = ref_keys[k].pop(0)
                matches.append((i, j))
                used_h.add(i)
                used_r.add(j)
    return sorted(matches)


def _chunks(matches: list[tuple[int, int]]) -> int:
    if not matches:
        return 0
    chunks = 1
    for (h0, r0), (h1, r1) in zip(matches, matches[1:]):
        if h1 != h0 + 1 or r1 != r0 + 1:
            chunks += 1
    return chunks


def _score_pair(hyp: list[str], ref: list[str]) -> float:
    matches = _align(hyp, ref)
    m = len(matches)
    if m == 0 or not hyp or not ref:
        return 0.0
    p = m / len(hyp)
    r = m / len(ref)
    f_mean = p * r / (_ALPHA * p + (1 - _ALPHA) * r)
    frag = _chunks(matches) / m
    penalty = _GAMMA * (frag**_BETA)
    return f_mean * (1.0 - penalty)


def meteor(
    hypotheses: dict[int, list[list[str]]],
    references: dict[int, list[list[str]]],
) -> float:
    total = 0.0
    for img_id, hyps in hypotheses.items():
        hyp = hyps[0]
        total += max((_score_pair(hyp, ref) for ref in references[img_id]), default=0.0)
    return total / max(len(hypotheses), 1)
