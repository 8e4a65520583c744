"""Stage-by-stage encode timing on the real chip (batch 64, 512², bf16).

Measurement method: the host↔device tunnel adds ~30ms per device→host copy, so
single-run timings are dominated by it. Each stage is therefore run K and 2K
times inside ONE jit via ``lax.fori_loop`` (with a data dependency between
iterations so XLA cannot elide them) and the per-iteration cost is the slope
(t(2K) - t(K)) / K — tunnel latency and dispatch cancel.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH nohup python scripts/profile_encode.py > /tmp/prof_encode.log 2>&1 &
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from fpn_mt_image_captioning_tpu.decode.beam_search import cast_for_inference
from fpn_mt_image_captioning_tpu.models.transformer import Transformer

BATCH, SIZE, K = 64, 512, 8


def slope_time(make_looped, k=K):
    """make_looped(n) -> jitted fn(images) running the stage n times."""
    f1, f2 = make_looped(k), make_looped(2 * k)

    def run(f):
        np.asarray(f())  # warm
        t0 = time.perf_counter()
        for _ in range(3):
            np.asarray(f())
        return (time.perf_counter() - t0) / 3

    t1, t2 = run(f1), run(f2)
    return (t2 - t1) / k


def main():
    model = Transformer(
        num_layers=6, d_model=512, num_heads=8, dff=2048,
        input_vocab_size=(SIZE // 16) ** 2, target_vocab_size=2000,
        max_seq_len=60, dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    tar = jnp.ones((1, 4), jnp.int32)
    from fpn_mt_image_captioning_tpu.models.positional import create_masks

    variables = model.init({"params": rng, "dropout": rng}, img, tar, True, create_masks(tar))
    variables = cast_for_inference(variables)

    images = jnp.asarray(
        np.random.default_rng(0).standard_normal((BATCH, SIZE, SIZE, 3), np.float32) * 0.5
    )

    enc_bound = model.bind(variables)
    fe = enc_bound.encoder.feature_extractor

    def looped(stage_fn):
        """stage_fn(params, images) -> scalar. Returns make_looped for slope_time.
        Params are runtime args so weights don't get baked into the HLO as
        constants (the tunnel rejects >100MB programs with HTTP 413)."""
        def make(n):
            @jax.jit
            def run_inner(params):
                def body(_, carry):
                    img_i, acc = carry
                    s = stage_fn(params, img_i)
                    # dependency below f32 resolution — not constant-foldable,
                    # so XLA cannot hoist the stage out of the loop
                    return img_i + s.astype(img_i.dtype) * 1e-30, acc + s

                _, acc = jax.lax.fori_loop(0, n, body, (images, jnp.float32(0)))
                return acc

            return lambda: run_inner(variables)
        return make

    def _fe_params(params):
        return {
            "params": params["params"]["encoder"]["feature_extractor"],
            "batch_stats": params.get("batch_stats", {}).get("encoder", {}).get("feature_extractor", {}),
        }

    def run_backbone(params, imgs):
        def f(mdl, x):
            return mdl.backbone(x.astype(mdl.dtype), train=False)
        c3, c4, c5 = fe.apply(_fe_params(params), imgs, method=f)
        return (c3.sum() + c4.sum() + c5.sum()).astype(jnp.float32)

    def run_fpn(params, imgs):
        def f(mdl, x):
            c3, c4, c5 = mdl.backbone(x.astype(mdl.dtype), train=False)
            return mdl.fpn(c3, c4, c5)
        ps = fe.apply(_fe_params(params), imgs, method=f)
        return sum(p.sum() for p in ps).astype(jnp.float32)

    def run_fe(params, imgs):
        views = fe.apply(_fe_params(params), imgs, train=False)
        return sum(v.sum() for v in views).astype(jnp.float32)

    def run_encode(params, imgs):
        enc = model.apply(params, imgs, train=False, method=Transformer.encode)
        return enc.sum().astype(jnp.float32)

    from fpn_mt_image_captioning_tpu.ops.fused_backbone import (
        fused_encode,
        fused_mobilenet_backbone,
        pack_backbone_weights,
    )

    def run_fused_backbone(params, imgs):
        fe_p = params["params"]["encoder"]["feature_extractor"]
        fe_s = params["batch_stats"]["encoder"]["feature_extractor"]
        packed = pack_backbone_weights(fe_p["backbone"], fe_s["backbone"], dtype=model.dtype)
        c3, c4, c5 = fused_mobilenet_backbone(packed, imgs)
        return (c3.sum() + c4.sum() + c5.sum()).astype(jnp.float32)

    def run_fused_encode(params, imgs):
        enc = fused_encode(model, params, imgs)
        return enc.sum().astype(jnp.float32)

    results = {}
    for name, fn in [("backbone", run_backbone), ("fused_backbone", run_fused_backbone),
                     ("backbone+fpn", run_fpn),
                     ("feature_extractor", run_fe), ("full_encode", run_encode),
                     ("fused_encode", run_fused_encode)]:
        t = slope_time(looped(fn))
        results[name] = t * 1000
        print(f"{name:20s} {t*1000:8.2f} ms/batch  ({BATCH/t:7.1f} img/s)", flush=True)

    print("\nderived:", flush=True)
    print(f"  fpn            {results['backbone+fpn']-results['backbone']:8.2f} ms", flush=True)
    print(f"  heads+fuse     {results['feature_extractor']-results['backbone+fpn']:8.2f} ms", flush=True)
    print(f"  umv transformer{results['full_encode']-results['feature_extractor']:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
