"""Throughput of the stochastic (sampling) serving path on real TPU.

Same protocol as bench.py's headline (flagship dims, 512² images, 60 decode
steps, slope-measured on device) but decoding with
``decode.beam_search.sample_decode`` (temperature 1.0) instead of beam-8:
sampling runs B cache rows instead of B×8 and skips the candidate sort, so it
bounds how much of the serving cost is beam bookkeeping vs the model itself.

Run:  timeout 3600 python scripts/profile_sample_decode.py [--batch N] [--top_p P]

``--top_p`` enables nucleus truncation (adds a per-step (B, V) descending
sort + cumsum); without it the trace omits the sort entirely (top_p=None) —
measured 788.6 img/s WITH the sort at top_p=1.0 vs the sort-free number in
CLAUDE.md, i.e. the sort is the costliest op in the sampling step.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_export_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from bench import build
    from fpn_mt_image_captioning_tpu.decode.beam_search import (
        cast_for_inference,
        sample_decode,
    )
    from fpn_mt_image_captioning_tpu.models.transformer import Transformer

    batch = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv else 64
    top_p = (
        float(sys.argv[sys.argv.index("--top_p") + 1])
        if "--top_p" in sys.argv else None
    )
    image_size, vocab, max_len, dims = 512, 2000, 60, (6, 512, 2048, 8)
    model, variables = build(image_size, vocab, max_len, dims, "bfloat16")
    variables = cast_for_inference(variables)

    def one_round(imgs, rng):
        enc = model.apply(variables, imgs, train=False, method=Transformer.encode)
        seqs, lengths = sample_decode(
            model, variables, enc, rng,
            max_len=max_len, start_token=1, end_token=vocab - 1,
            temperature=1.0, top_p=top_p,
        )
        return seqs, lengths

    @jax.jit
    def run(images, n):
        def body(i, carry):
            imgs, acc = carry
            seqs, lengths = one_round(imgs, jax.random.fold_in(jax.random.PRNGKey(0), i + acc))
            bump = ((lengths.sum() + seqs.sum()).astype(imgs.dtype)) * 1e-30
            return imgs + bump, acc + lengths.sum()

        _, acc = jax.lax.fori_loop(0, n, body, (images, jnp.int32(0)))
        return acc

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((batch, image_size, image_size, 3), np.float32) * 0.5
    )

    def t(n):
        t0 = time.perf_counter()
        np.asarray(run(images, jnp.int32(n)))
        return time.perf_counter() - t0

    np.asarray(run(images, jnp.int32(1)))  # compile + warm
    k = 8
    t1, t2 = t(k), t(2 * k)
    batch_ms = max((t2 - t1) / k, 1e-9) * 1000
    print(json.dumps({
        "metric": "sampled captions/sec/chip (temperature 1.0)",
        "value": round(batch / (batch_ms / 1000), 2),
        "unit": "img/s",
        "batch_ms": round(batch_ms, 2),
        "batch": batch, "decode_steps": max_len, "vocab": vocab,
        "top_p": top_p, "backend": jax.default_backend(),
    }), flush=True)


if __name__ == "__main__":
    main()
