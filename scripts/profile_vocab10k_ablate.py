"""VERDICT r3 #5: isolate the fused decoder's vocab-10000 cost structurally.

bench.py shows 682 img/s @ vocab 2000 vs 608 @ vocab 10000 (-10.8%). The only
vocab-dependent section is the final cell (vocab projection + in-kernel
top-k), so slope-measure the kernel at pos=30 in four variants:

    {full, ablate="final"} x {vocab 2000, vocab 10000}

If (full - -final) at vocab 10000 ~= the whole 2000->10000 bench delta, the
cost is the final cell's GEMM ((512 rows, 512) @ (512, vocab) -> 5x FLOPs +
5x weight streaming) -- i.e. the structural floor for a single-launch design,
and the remaining levers (split projection across grid cells with partial
top-k merge) trade that against extra launches/merges.

Writes benchmarks/vocab10k_ablation.json.

Run:  PYTHONPATH=/root/repo:/root/.axon_site nohup python scripts/profile_vocab10k_ablate.py > /tmp/vocab10k_ablate.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_vocab_ablate_cache")

import jax
import jax.numpy as jnp
import numpy as np

from fpn_mt_image_captioning_tpu.decode.beam_search import cast_for_inference
from fpn_mt_image_captioning_tpu.models.positional import create_masks
from fpn_mt_image_captioning_tpu.models.transformer import Transformer
from fpn_mt_image_captioning_tpu.ops.fused_decoder import (
    fused_decode_step,
    init_fused_cache,
    pack_decoder_weights,
)

BATCH, BEAM, SIZE, MAXLEN, K, POS = 64, 8, 512, 60, 256, 30
NL, D, DFF, H = 6, 512, 2048, 8
REPEATS = 3  # median-of-3: single K=64 slopes swing ±0.15 ms/step on noisy
             # tunnel days (observed 2026-08-19), far above the 30-120 µs
             # effects this probe sections; K=256 + median gets under ~10 µs


def slope(fn_of_n, k=K):
    def run(n):
        np.asarray(fn_of_n(jnp.int32(n)))
        t0 = time.perf_counter()
        for _ in range(3):
            np.asarray(fn_of_n(jnp.int32(n)))
        return (time.perf_counter() - t0) / 3

    samples = []
    for _ in range(REPEATS):
        t1, t2 = run(k), run(2 * k)
        samples.append((t2 - t1) / k)
    samples.sort()
    return samples[len(samples) // 2]


def build(vocab):
    model = Transformer(
        num_layers=NL, d_model=D, num_heads=H, dff=DFF,
        input_vocab_size=(SIZE // 16) ** 2, target_vocab_size=vocab,
        max_seq_len=MAXLEN, dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    tar = jnp.ones((1, 4), jnp.int32)
    variables = model.init({"params": rng, "dropout": rng}, img, tar, True, create_masks(tar))
    params = cast_for_inference(variables)["params"]

    bk = BATCH * BEAM
    enc = jnp.asarray(
        np.random.default_rng(0).standard_normal((BATCH, 16, D), np.float32) * 0.1,
        jnp.bfloat16,
    )
    packed = pack_decoder_weights(params, NL)
    cache0 = init_fused_cache(packed, enc, BEAM, MAXLEN)
    lpad = cache0["k_self"].shape[1]
    srcT = jnp.broadcast_to(
        (jnp.arange(bk, dtype=jnp.int32) % BEAM)[None, :], (lpad, bk)
    )
    x0 = jnp.asarray(
        np.random.default_rng(1).standard_normal((bk, D), np.float32) * 0.1, jnp.bfloat16
    )
    scores0 = jnp.zeros((bk, 1), jnp.float32)
    fin0 = jnp.zeros((bk, 1), jnp.float32)

    def kernel_loop(ablate):
        @jax.jit
        def f(n, x0, cache0, packed):
            def body(_, carry):
                x, cache, acc = carry
                top_s, top_i, cache = fused_decode_step(
                    packed, cache, x, srcT, jnp.int32(POS), scores0, fin0,
                    num_layers=NL, beam=BEAM, num_heads=H, ablate=ablate,
                )
                s = top_s[:, :BEAM].sum() + x.astype(jnp.float32).sum() * 1e-6
                return x + (s * 1e-30).astype(x.dtype), cache, acc + s

            _, _, acc = jax.lax.fori_loop(0, n, body, (x0, cache0, jnp.float32(0)))
            return acc

        return lambda n: f(n, x0, cache0, packed)

    return kernel_loop


def main():
    print(f"devices: {jax.devices()}", flush=True)
    out = {"pos": POS, "batch": BATCH, "beam": BEAM, "k": K, "variants": {}}
    for vocab in (2000, 10000):
        loop = build(vocab)
        for ablate in ("", "final"):
            t0 = time.time()
            t = slope(loop(ablate))
            name = f"vocab{vocab}" + ("_nofinal" if ablate else "_full")
            out["variants"][name] = t * 1000
            print(
                f"{name:22s} {t*1000:8.3f} ms/step  (wall {time.time()-t0:.0f}s)",
                flush=True,
            )
    v = out["variants"]
    fc2 = v["vocab2000_full"] - v["vocab2000_nofinal"]
    fc10 = v["vocab10000_full"] - v["vocab10000_nofinal"]
    out["final_cell_ms"] = {"vocab2000": fc2, "vocab10000": fc10}
    out["step_delta_ms"] = v["vocab10000_full"] - v["vocab2000_full"]
    out["final_cell_delta_ms"] = fc10 - fc2
    # Structural floor estimate for the final cell at vocab 10000: 512 rows
    # x (512, vocab) GEMM + streaming the (512, vocab) bf16 weight from HBM.
    rows = BATCH * BEAM
    flops = 2 * rows * D * 10000
    bytes_w = D * 10000 * 2
    out["floor_ms_vocab10000"] = max(flops / 75e12, bytes_w / 819e9) * 1000
    print(json.dumps(out, indent=2), flush=True)
    path = os.path.join(os.path.dirname(__file__), "..", "benchmarks", "vocab10k_ablation.json")
    with open(os.path.abspath(path), "w") as f:
        json.dump(out, f, indent=2)
    print("wrote benchmarks/vocab10k_ablation.json", flush=True)


if __name__ == "__main__":
    main()
