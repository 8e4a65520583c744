"""Headline benchmark: captioned images/sec/chip at beam=8 (BASELINE.json).

Protocol (config 5 of BASELINE.json — batched serving): flagship model
(512² input, d_model=512, 6+6 layers, dff=2048, 8 heads, vocab 2000, bfloat16
compute), batch 64, beam 8, 60 decode steps with the shared-KV-cache
``lax.while_loop`` engine. Encoder runs once per image; decode is
batch×beam-parallel. Also reports p50 single-image latency.

Prints ONE JSON line:
  {"metric": "captioned images/sec/chip @ beam=8", "value": N, "unit": "img/s",
   "vs_baseline": N/500, ...}
(the 500 img/s denominator is the BASELINE.json v5e target; the TF reference
publishes no throughput numbers — SURVEY.md §6).

``--tiny`` runs a CPU-safe miniature for smoke-testing the bench path.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def build(image_size, vocab, max_seq_len, dims, dtype):
    from fpn_mt_image_captioning_tpu.models.transformer import Transformer

    num_layers, d_model, dff, num_heads = dims
    model = Transformer(
        num_layers=num_layers, d_model=d_model, num_heads=num_heads, dff=dff,
        input_vocab_size=(image_size // 16) ** 2, target_vocab_size=vocab,
        max_seq_len=max_seq_len, dtype=jnp.dtype(dtype),
    )
    from fpn_mt_image_captioning_tpu.models.positional import create_masks

    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    tar = jnp.ones((1, 4), jnp.int32)
    variables = model.init(
        {"params": rng, "dropout": rng}, img, tar, True, create_masks(tar)
    )
    return model, variables


def main():
    tiny = "--tiny" in sys.argv
    if tiny:
        image_size, vocab, max_len, dims = 256, 200, 8, (2, 64, 128, 4)
        batch, beam, iters, dtype = 4, 2, 2, "float32"
    else:
        image_size, vocab, max_len, dims = 512, 2000, 60, (6, 512, 2048, 8)
        batch, beam, iters, dtype = 64, 8, 3, "bfloat16"

    from fpn_mt_image_captioning_tpu.decode.beam_search import beam_search, cast_for_inference
    from fpn_mt_image_captioning_tpu.models.transformer import Transformer

    model, variables = build(image_size, vocab, max_len, dims, dtype)
    if dtype == "bfloat16":
        variables = cast_for_inference(variables)

    @jax.jit
    def encode(variables, images):
        return model.apply(variables, images, train=False, method=Transformer.encode)

    fused = jax.default_backend() == "tpu"

    def caption(images):
        enc = encode(variables, images)
        seqs, lengths, _ = beam_search(
            model, variables, enc,
            beam_n=beam, max_len=max_len, start_token=1, end_token=vocab - 1,
            fused=fused,
        )
        return seqs, lengths

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((batch, image_size, image_size, 3), dtype=np.float32) * 0.5
    )

    # NOTE: sync via device→host copy (np.asarray); block_until_ready does not
    # reliably wait on the axon-tunneled backend.
    def sync(x):
        return np.asarray(x)

    # warmup / compile
    seqs, lengths = caption(images)
    sync(seqs)

    t0 = time.perf_counter()
    for _ in range(iters):
        seqs, lengths = caption(images)
        sync(seqs)
    dt = time.perf_counter() - t0
    throughput = batch * iters / dt

    # p50 single-image latency
    one = images[:1]
    s, l = caption(one)
    sync(s)
    lat = []
    for _ in range(5 if tiny else 10):
        t1 = time.perf_counter()
        s, l = caption(one)
        sync(s)
        lat.append(time.perf_counter() - t1)
    p50_ms = statistics.median(lat) * 1000

    print(json.dumps({
        "metric": "captioned images/sec/chip @ beam=8",
        "value": round(throughput, 2),
        "unit": "img/s",
        "vs_baseline": round(throughput / 500.0, 4),
        "p50_latency_ms": round(p50_ms, 2),
        "batch": batch, "beam": beam, "decode_steps": max_len,
        "image_size": image_size, "dtype": dtype,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
