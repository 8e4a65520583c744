"""Training MFU accounting → benchmarks/train_mfu.json (VERDICT r3 item 6).

Answers "is training perf work done?" with a number: FLOPs per train step
(XLA's own HLO cost analysis of the jitted fwd+bwd+AMSGrad step, plus
sub-lowerings to attribute encoder-forward vs decoder-forward vs
backward+update), divided by the slope-measured step time, as a fraction of

  * v5e bf16 peak (197 TFLOP/s per chip, the datasheet MXU number), and
  * the GEMM roofline actually measured through this tunnel setup
    (75 TFLOP/s on 8192³ bf16 GEMMs — CLAUDE.md device reality; large-GEMM
    achievable, not datasheet).

Run (TPU):  timeout 3600 python scripts/train_mfu.py [--batch 128] [--k 2]
CPU smoke:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
                python scripts/train_mfu.py --tiny
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

V5E_PEAK_BF16 = 197e12  # per-chip datasheet MXU peak
MEASURED_GEMM_ROOFLINE = 75e12  # 8192^3 bf16 GEMM through this tunnel setup


def _flops(lowered) -> float | None:
    """XLA HLO cost analysis of a lowered (pre-optimization) computation."""
    try:
        ca = lowered.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])
    except Exception as e:  # noqa: BLE001 - analysis is best-effort per backend
        print(f"cost_analysis unavailable on lowered: {type(e).__name__}: {e}")
        return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--k", type=int, default=2, help="slope base rounds")
    ap.add_argument("--step_ms", type=float, default=None,
                    help="skip the on-chip slope and use this measured step time")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from fpn_mt_image_captioning_tpu.models.positional import create_masks
    from fpn_mt_image_captioning_tpu.models.transformer import Transformer
    from fpn_mt_image_captioning_tpu.train.pipeline import (
        TrainState,
        build_train_step_fn,
    )
    from fpn_mt_image_captioning_tpu.train.schedule import (
        custom_schedule,
        make_optimizer,
    )
    from fpn_mt_image_captioning_tpu.utils.profiling import train_step_slope

    if args.tiny:
        image_size, vocab, seq, dims, dtype = 128, 200, 16, (2, 64, 128, 4), "float32"
        args.batch, args.k = 2, 1
    else:
        image_size, vocab, seq, dims, dtype = 512, 2000, 64, (6, 512, 2048, 8), "bfloat16"
    num_layers, d_model, dff, num_heads = dims
    batch = args.batch

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

    # ---- FLOP accounting (trace + HLO cost analysis; no device execution) ----
    optimizer = make_optimizer(custom_schedule(dff, 4000))
    state = TrainState(
        variables["params"], variables.get("batch_stats", {}),
        optimizer.init(variables["params"]), jnp.int32(0),
    )
    step_fn = build_train_step_fn(model, optimizer, seed=0)
    img_s = jax.ShapeDtypeStruct((batch, image_size, image_size, 3), jnp.float32)
    cap_s = jax.ShapeDtypeStruct((batch, seq), jnp.int32)
    state_s = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype), state
    )
    print("lowering train step for cost analysis ...", flush=True)
    step_flops = _flops(jax.jit(step_fn).lower(state_s, img_s, cap_s))

    # attribution sub-lowerings: encoder fwd / full fwd (cheap to trace)
    def full_fwd(variables, img, cap):
        tar = cap[:, :-1]
        return model.apply(variables, img, tar, True, create_masks(tar),
                           rngs={"dropout": rng}, mutable=["batch_stats"])

    def enc_fwd(variables, img):
        return model.apply(variables, img, train=True, mutable=["batch_stats"],
                           rngs={"dropout": rng}, method=Transformer.encode)

    var_s = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        variables,
    )
    fwd_flops = _flops(jax.jit(full_fwd).lower(var_s, img_s, cap_s))
    enc_flops = _flops(jax.jit(enc_fwd).lower(var_s, img_s))

    # ---- measured step time (slope method; see CLAUDE.md measurement rules) --
    # The axon TPU backend returns no lowered cost analysis, but XLA:CPU does
    # and FLOP counts are backend-independent — standard split: measure the
    # step time on TPU (one run), then re-run under JAX_PLATFORMS=cpu with
    # --step_ms <measured> for the FLOP accounting (trace-only, no compile).
    if args.step_ms is not None:
        step_ms, throughput = args.step_ms, batch / (args.step_ms / 1000.0)
    else:
        r = train_step_slope(
            model, variables, batch=batch, seq_len=seq, image_size=image_size,
            vocab=vocab, k=args.k, schedule_dim=dff, seed=1,
        )
        step_ms, throughput = r["step_ms"], r["images_per_sec"]

    achieved = step_flops / (step_ms / 1000.0) if step_flops else None
    out = {
        "config": {"batch": batch, "image_size": image_size, "seq_len": seq,
                   "dims": dims, "vocab": vocab, "dtype": dtype,
                   "backend": jax.default_backend()},
        "flops_per_step": step_flops,
        "flops_breakdown": {
            "full_forward": fwd_flops,
            "encoder_forward": enc_flops,
            "decoder_forward": (fwd_flops - enc_flops)
            if fwd_flops and enc_flops else None,
            "backward_plus_update": (step_flops - fwd_flops)
            if step_flops and fwd_flops else None,
            "note": "XLA HLO cost analysis of the unoptimized lowering; "
                    "fusion changes bytes, not matmul/conv FLOPs",
        },
        "measured": {
            "step_ms": step_ms, "images_per_sec": round(throughput, 2),
            "step_time_source": "slope on this backend" if args.step_ms is None
            else "passed via --step_ms (slope-measured on TPU)",
        },
        "achieved_tflops": round(achieved / 1e12, 2) if achieved else None,
        "mfu_vs_v5e_peak_197T": round(achieved / V5E_PEAK_BF16, 4)
        if achieved else None,
        "mfu_vs_measured_gemm_75T": round(achieved / MEASURED_GEMM_ROOFLINE, 4)
        if achieved else None,
    }
    path = os.path.join(REPO, "benchmarks", "train_mfu.json")
    if args.tiny:
        path = "/tmp/train_mfu_tiny.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    print("wrote", path)


if __name__ == "__main__":
    main()
