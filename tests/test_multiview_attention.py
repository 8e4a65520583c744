"""Transposed-projection multi-view attention must equal the naive per-view MHA
formulation (reference EncoderLayer semantics, transformer.py:162,:186-190):
one MultiHeadAttention per view — k/v projected from the view tokens, q from
the baseline — with the per-view outputs summed."""

import jax
import jax.numpy as jnp
import numpy as np

from fpn_mt_image_captioning_tpu.models.attention import (
    MultiViewAttention,
    _view_groups,
)

V, B, LQ, D, H = 3, 2, 4, 16, 4
DH = D // H


def per_view_reference(params, kv_w, kv_b, baseline, sources):
    """Loop formulation: project k/v per view, per-view softmax + out-proj, sum."""
    wq, bq = np.asarray(params["wq"], np.float64), np.asarray(params["bq"], np.float64)
    wo, bo = np.asarray(params["wo"], np.float64), np.asarray(params["bo"], np.float64)
    kv_w, kv_b = np.asarray(kv_w, np.float64), np.asarray(kv_b, np.float64)
    base = np.asarray(baseline, np.float64)
    total = np.zeros_like(base)
    for i, src in enumerate(sources):
        src = np.asarray(src, np.float64)
        lk = src.shape[1]
        q = (base @ wq[i] + bq[i]).reshape(B, LQ, H, DH)
        k = (src @ kv_w[i, :, :D] + kv_b[i, :D]).reshape(B, lk, H, DH)
        v = (src @ kv_w[i, :, D:] + kv_b[i, D:]).reshape(B, lk, H, DH)
        logits = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(DH)
        w = np.exp(logits - logits.max(-1, keepdims=True))
        w = w / w.sum(-1, keepdims=True)
        ctx = np.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, LQ, D)
        total += ctx @ wo[i] + bo[i]
    return total


def _make_inputs(rng, lengths):
    keys = jax.random.split(rng, V + 3)
    baseline = jax.random.normal(keys[0], (B, LQ, D))
    sources = [jax.random.normal(keys[1 + i], (B, lengths[i], D)) for i in range(V)]
    kv_w = jax.random.normal(keys[V + 1], (V, D, 2 * D)) * 0.3
    kv_b = jax.random.normal(keys[V + 2], (V, 2 * D)) * 0.1
    return baseline, sources, kv_w, kv_b


def test_mva_equals_per_view_loop(rng):
    mva = MultiViewAttention(num_views=V, d_model=D, num_heads=H, rate=0.0)
    baseline, sources, kv_w, kv_b = _make_inputs(rng, [6, 3, 1])

    variables = mva.init(rng, baseline, sources, kv_w, kv_b)
    out = mva.apply(variables, baseline, sources, kv_w, kv_b)

    expected = per_view_reference(variables["params"], kv_w, kv_b, baseline, sources)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4)


def test_mva_solo_and_stacked_groups_agree(rng):
    """A long view (solo path) mixed with short ones (stacked path) must still
    match the naive loop — exercises both branches of _view_groups."""
    mva = MultiViewAttention(num_views=V, d_model=D, num_heads=H, rate=0.0)
    lengths = [600, 9, 2]  # 600 ≥ solo threshold
    assert _view_groups(lengths) == [[0], [1, 2]]
    baseline, sources, kv_w, kv_b = _make_inputs(rng, lengths)

    variables = mva.init(rng, baseline, sources, kv_w, kv_b)
    out = mva.apply(variables, baseline, sources, kv_w, kv_b)

    expected = per_view_reference(variables["params"], kv_w, kv_b, baseline, sources)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4)


def test_view_groups():
    assert _view_groups([1024, 256, 64, 4]) == [[0], [1, 2, 3]]
    assert _view_groups([256, 64, 16, 1]) == [[0, 1, 2, 3]]
    assert _view_groups([1024, 1024]) == [[0], [1]]


def test_stacked_init_has_per_matrix_he_statistics(rng):
    """Leading stack axes must NOT count as fan-in: each (d, d) / (d, 2d) slice
    keeps stddev ~= sqrt(2/d), matching the reference's per-Dense Keras
    he_normal (common_definitions.py:15). Regression test for the round-1
    fan-in bug (VERDICT Weak #1)."""
    from fpn_mt_image_captioning_tpu.models.layers import stacked_he_normal

    d = 256
    w1 = stacked_he_normal(1)(rng, (4, d, d), jnp.float32)
    w2 = stacked_he_normal(2)(rng, (6, 4, d, 2 * d), jnp.float32)
    target = np.sqrt(2.0 / d)
    # truncated normal at +/-2 sigma has std ~0.88x the nominal sigma; flax
    # pre-corrects for that, so the sample std should land on target directly
    for w in (w1, w2):
        sd = float(np.asarray(w).std())
        assert abs(sd - target) / target < 0.05, (sd, target)

    # and the in-model params actually use it
    mva = MultiViewAttention(num_views=V, d_model=D, num_heads=H, rate=0.0)
    baseline, sources, kv_w, kv_b = _make_inputs(rng, [6, 3, 1])
    params = mva.init(rng, baseline, sources, kv_w, kv_b)["params"]
    sd = float(np.asarray(params["wq"]).std())
    assert abs(sd - np.sqrt(2.0 / D)) / np.sqrt(2.0 / D) < 0.2, sd
