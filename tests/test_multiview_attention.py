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
