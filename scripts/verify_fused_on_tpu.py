"""On-chip fused-vs-XLA decode parity check (run on a real TPU).

The interpreter-mode tests (tests/test_fused_decoder.py, test_fused_beam.py)
pin the fused kernel's MATH against the XLA decode path, but they execute the
kernel body through XLA-on-CPU — they cannot catch a Mosaic lowering bug that
only manifests in the real TPU compilation. This script closes that gap: it
runs the full beam-search engine twice ON THE CHIP — ``fused=True`` (Pallas
mega-kernel) vs ``fused=False`` (pure XLA decode) — from the same encoder
output at flagship model dims, and demands identical sequences and lengths.

float32 end-to-end: with random N(0, 0.02) weights the per-step logit gaps are
orders of magnitude above f32 accumulation-order noise, so beam choices must
agree exactly; any mismatch indicates a real kernel bug, not rounding.

    python scripts/verify_fused_on_tpu.py          # ~2 remote compiles
    python scripts/verify_fused_on_tpu.py --tiny   # CPU smoke (interpreter N/A
                                                   # -> XLA-vs-XLA sanity only)

Prints one JSON line: {"parity": "PASS"|"FAIL", ...}. Result of record:
CLAUDE.md "Round 3 additions".
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    tiny = "--tiny" in sys.argv
    if tiny:
        image_size, vocab, max_len, dims, batch, beam = 256, 200, 8, (2, 64, 128, 4), 2, 2
    else:
        image_size, vocab, max_len, dims, batch, beam = 512, 2000, 20, (6, 512, 2048, 8), 8, 8

    from bench import build
    from fpn_mt_image_captioning_tpu.decode.beam_search import beam_search
    from fpn_mt_image_captioning_tpu.models.transformer import Transformer

    model, variables = build(image_size, vocab, max_len, dims, "float32")
    on_tpu = jax.default_backend() == "tpu"

    rng = np.random.default_rng(7)
    images = jnp.asarray(
        rng.standard_normal((batch, image_size, image_size, 3), dtype=np.float32) * 0.5
    )
    enc = jax.jit(
        lambda v, x: model.apply(v, x, train=False, method=Transformer.encode)
    )(variables, images)

    def decode(fused):
        fn = jax.jit(
            lambda v, e: beam_search(
                model, v, e, beam_n=beam, max_len=max_len,
                start_token=1, end_token=vocab - 1, fused=fused,
            )[:2]
        )
        seqs, lengths = fn(variables, enc)
        return np.asarray(seqs), np.asarray(lengths)

    xla_seqs, xla_len = decode(fused=False)
    if on_tpu:
        fused_seqs, fused_len = decode(fused=True)
    else:
        # no TPU: XLA-vs-XLA determinism sanity so --tiny still exercises the path
        fused_seqs, fused_len = decode(fused=False)

    seq_match = bool(np.array_equal(xla_seqs, fused_seqs))
    len_match = bool(np.array_equal(xla_len, fused_len))
    mismatch_rows = int(np.sum(np.any(xla_seqs != fused_seqs, axis=-1)))
    print(json.dumps({
        "parity": "PASS" if (seq_match and len_match) else "FAIL",
        "fused_on_chip": on_tpu,
        "batch": batch, "beam": beam, "max_len": max_len, "vocab": vocab,
        "dims": dims, "mismatching_rows": mismatch_rows,
        "mean_len": float(xla_len.mean()),
        "backend": jax.default_backend(),
    }), flush=True)
    raise SystemExit(0 if (seq_match and len_match) else 1)


if __name__ == "__main__":
    main()
