"""Training-step throughput benchmark (images/sec/chip).

Measures the jitted teacher-forced train step (fwd + bwd + AMSGrad update) on
the flagship model via the slope method (K vs 2K steps back-to-back on device
inside one jit — see ``utils/profiling.train_step_slope``, the shared engine
also behind ``bench.py --train``). The reference publishes no training
throughput (single-GPU TF2, batch 10 — ``common/common_definitions.py:19``);
this gives the TPU number for the same batch and for a saturating batch.

    python benchmarks/train_throughput.py [--tiny]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    tiny = "--tiny" in sys.argv
    if tiny:
        image_size, vocab, seq, dims = 128, 200, 16, (2, 64, 128, 4)
        batches, base_k, dtype = (2,), 2, "float32"
    else:
        image_size, vocab, seq, dims = 512, 2000, 64, (6, 512, 2048, 8)
        batches, base_k, dtype = (10, 32, 64), 3, "bfloat16"
    for arg in sys.argv[1:]:  # e.g. --batches=128,256 to probe the envelope
        if arg.startswith("--batches="):
            batches = tuple(int(b) for b in arg.split("=", 1)[1].split(","))

    from fpn_mt_image_captioning_tpu.models.positional import create_masks
    from fpn_mt_image_captioning_tpu.models.transformer import Transformer
    from fpn_mt_image_captioning_tpu.utils.profiling import train_step_slope

    num_layers, d_model, dff, num_heads = dims
    model = Transformer(
        num_layers=num_layers, d_model=d_model, num_heads=num_heads, dff=dff,
        input_vocab_size=(image_size // 16) ** 2, target_vocab_size=vocab,
        max_seq_len=seq, dtype=jnp.dtype(dtype),
    )
    rng = jax.random.PRNGKey(0)
    img1 = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    tar1 = jnp.ones((1, seq - 1), jnp.int32)
    variables = model.init(
        {"params": rng, "dropout": rng}, img1, tar1, True, create_masks(tar1)
    )

    results = {}
    for batch in batches:
        # slope rounds scale inversely with step time so every batch size gets
        # the same signal-to-tunnel-jitter ratio
        k = 2 if tiny else max(base_k, 4 * max(batches) // batch)
        r = train_step_slope(
            model, variables, batch=batch, seq_len=seq, image_size=image_size,
            vocab=vocab, k=k, schedule_dim=dff,
        )
        results[f"batch_{batch}"] = {
            "step_ms": r["step_ms"], "images_per_sec": r["images_per_sec"],
        }
        print(json.dumps({f"batch_{batch}": results[f"batch_{batch}"]}), flush=True)

    print(json.dumps({
        "metric": "train images/sec/chip",
        "results": results,
        "image_size": image_size, "dtype": dtype,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
