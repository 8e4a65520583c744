"""Training-step throughput benchmark (images/sec/chip).

Measures the jitted teacher-forced train step (fwd + bwd + AMSGrad update) on
the flagship model. The reference publishes no training throughput (single-GPU
TF2, batch 10 — ``common/common_definitions.py:19``); this gives the TPU
number for the same batch and for a saturating batch.

    python benchmarks/train_throughput.py [--tiny]
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
    tiny = "--tiny" in sys.argv
    if tiny:
        image_size, vocab, seq, dims = 128, 200, 16, (2, 64, 128, 4)
        batches, iters, dtype = (2,), 2, "float32"
    else:
        image_size, vocab, seq, dims = 512, 2000, 64, (6, 512, 2048, 8)
        batches, iters, dtype = (10, 32), 3, "bfloat16"

    import optax

    from fpn_mt_image_captioning_tpu.models.positional import create_masks
    from fpn_mt_image_captioning_tpu.models.transformer import Transformer
    from fpn_mt_image_captioning_tpu.train.losses import masked_sparse_ce
    from fpn_mt_image_captioning_tpu.train.pipeline import TrainState
    from fpn_mt_image_captioning_tpu.train.schedule import custom_schedule, make_optimizer

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
    optimizer = make_optimizer(custom_schedule(dff, 4000))
    state = TrainState(
        variables["params"], variables.get("batch_stats", {}),
        optimizer.init(variables["params"]), jnp.int32(0),
    )

    def train_step(state, img, caps):
        tar_inp, tar_real = caps[:, :-1], caps[:, 1:]
        mask = create_masks(tar_inp)
        drng = jax.random.fold_in(jax.random.PRNGKey(0), state.step)

        def loss_fn(params):
            (logits, _), mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                img, tar_inp, True, mask, rngs={"dropout": drng},
                mutable=["batch_stats"],
            )
            return masked_sparse_ce(tar_real, logits), mut["batch_stats"]

        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, bs, opt, state.step + 1), loss

    # slope measurement: n steps back-to-back on device inside one jit; the
    # fori carry reuses the state buffers between steps. The INPUT state is
    # deliberately NOT donated: timed() re-runs with the same state arrays, so
    # the bench holds one extra params+optimizer copy (fine at these sizes).
    # Per-step cost is (t(2k) - t(k)) / k — the ~30 ms/sync tunnel RTT cancels.
    @jax.jit
    def run_steps(state, img, caps, n):
        def body(_, carry):
            st, acc = carry
            st, loss = train_step(st, img, caps)
            return st, acc + loss

        st, acc = jax.lax.fori_loop(0, n, body, (state, jnp.float32(0)))
        return st, acc

    results = {}
    rng_np = np.random.default_rng(0)
    for batch in batches:
        # slope rounds scale inversely with step time so every batch size gets
        # the same signal-to-tunnel-jitter ratio
        k = 2 if tiny else max(iters, 4 * max(batches) // batch)
        img = jnp.asarray(
            rng_np.standard_normal((batch, image_size, image_size, 3), dtype=np.float32) * 0.5
        )
        caps = jnp.asarray(rng_np.integers(1, vocab, (batch, seq)), jnp.int32)

        def timed(n):
            t0 = time.perf_counter()
            _, acc = run_steps(state, img, caps, jnp.int32(n))
            np.asarray(acc)  # sync (block_until_ready unreliable on tunnel)
            return time.perf_counter() - t0

        timed(1)  # warm / compile
        t1, t2 = timed(k), timed(2 * k)
        dt = max((t2 - t1) / k, 1e-9)
        results[f"batch_{batch}"] = {
            "step_ms": round(dt * 1000, 1),
            "images_per_sec": round(batch / dt, 1),
        }

    print(json.dumps({
        "metric": "train images/sec/chip",
        "results": results,
        "image_size": image_size, "dtype": dtype,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
