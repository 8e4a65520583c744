"""Validate the compiled serving artifact ON REAL TPU with the fused decoder.

The CPU test suite proves export→load→run bit-equality on the XLA decode path
(tests/test_export.py). This script proves the part only hardware can: the
Pallas mega-kernel's Mosaic custom call survives ``jax.export`` serialization
→ ``deserialize`` → execution on the chip, and the deserialized program's
sequences/lengths are exactly those of the in-process jitted function (same
weights, same device, same math — equality must be bitwise).

Flagship dims (d_model=512, 6 layers, dff=2048, vocab 2000, 512² input) at a
small batch so the two remote compiles (direct jit + deserialized call) stay
tunnel-friendly. Prints one JSON verdict line.

Run:  timeout 3600 python scripts/verify_export_on_tpu.py [--batch N] [--sample]

``--sample`` additionally validates the stochastic-serving export (the
nucleus-variant program with per-row temperature/top_p inputs) the same way —
XLA-only, so the risk surface is export fidelity rather than the custom call.
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
    from fpn_mt_image_captioning_tpu.decode.beam_search import cast_for_inference
    from fpn_mt_image_captioning_tpu.export import (
        build_serving_fn,
        export_with_fallback,
    )
    from jax import export as jax_export

    batch = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv else 8
    image_size, vocab, max_len, dims = 512, 2000, 60, (6, 512, 2048, 8)
    on_tpu = jax.default_backend() == "tpu"
    model, variables = build(image_size, vocab, max_len, dims, "bfloat16")
    variables = cast_for_inference(variables)

    serve = build_serving_fn(
        model, beam_n=8, max_len=max_len, start_token=1, end_token=vocab - 1,
        fused=on_tpu, pack_dtype=jnp.bfloat16,
    )
    var_spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), variables
    )
    img_spec = jax.ShapeDtypeStruct((batch, image_size, image_size, 3), jnp.float32)

    t0 = time.time()
    exported, disabled = export_with_fallback(serve, var_spec, img_spec)
    blob = exported.serialize()
    t_export = time.time() - t0

    restored = jax_export.deserialize(bytearray(blob))

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        rng.standard_normal((batch, image_size, image_size, 3), np.float32) * 0.5
    )

    t0 = time.time()
    s_direct, l_direct = jax.jit(serve)(variables, imgs)
    s_direct, l_direct = np.asarray(s_direct), np.asarray(l_direct)
    t_direct = time.time() - t0

    t0 = time.time()
    s_art, l_art = jax.jit(restored.call)(variables, imgs)
    s_art, l_art = np.asarray(s_art), np.asarray(l_art)
    t_art = time.time() - t0

    seq_eq = bool(np.array_equal(s_direct, s_art))
    len_eq = bool(np.array_equal(l_direct, l_art))
    print(json.dumps({
        "check": "jax.export artifact on-chip (fused decoder)",
        "backend": jax.default_backend(),
        "fused": on_tpu,
        "batch": batch,
        "blob_mb": round(len(blob) / 1e6, 2),
        "custom_call_check_disabled": disabled,
        "sequences_bitwise_equal": seq_eq,
        "lengths_bitwise_equal": len_eq,
        "export_s": round(t_export, 1),
        "direct_first_call_s": round(t_direct, 1),
        "artifact_first_call_s": round(t_art, 1),
        "ok": seq_eq and len_eq,
    }), flush=True)
    if not (seq_eq and len_eq):
        raise SystemExit(1)

    if "--sample" not in sys.argv:
        return
    from fpn_mt_image_captioning_tpu.export import build_sampling_fn

    fn = build_sampling_fn(
        model, max_len=max_len, start_token=1, end_token=vocab - 1, nucleus=True
    )
    seed_spec = jax.ShapeDtypeStruct((), jnp.int32)
    row_spec = jax.ShapeDtypeStruct((batch,), jnp.float32)

    t0 = time.time()
    exported_s, disabled_s = export_with_fallback(
        fn, var_spec, img_spec, seed_spec, row_spec, row_spec
    )
    blob_s = exported_s.serialize()
    t_export = time.time() - t0
    restored_s = jax_export.deserialize(bytearray(blob_s))

    temps = jnp.asarray(np.linspace(0.6, 1.2, batch), jnp.float32)
    tps = jnp.full((batch,), 0.92, jnp.float32)
    args = (variables, imgs, jnp.int32(13), temps, tps)

    t0 = time.time()
    s_direct, l_direct = (np.asarray(x) for x in jax.jit(fn)(*args))
    t_direct = time.time() - t0
    t0 = time.time()
    s_art, l_art = (np.asarray(x) for x in jax.jit(restored_s.call)(*args))
    t_art = time.time() - t0

    seq_eq = bool(np.array_equal(s_direct, s_art))
    len_eq = bool(np.array_equal(l_direct, l_art))
    print(json.dumps({
        "check": "jax.export sampling artifact on-chip (nucleus program)",
        "backend": jax.default_backend(),
        "batch": batch,
        "blob_mb": round(len(blob_s) / 1e6, 2),
        "custom_call_check_disabled": disabled_s,
        "sequences_bitwise_equal": seq_eq,
        "lengths_bitwise_equal": len_eq,
        "export_s": round(t_export, 1),
        "direct_first_call_s": round(t_direct, 1),
        "artifact_first_call_s": round(t_art, 1),
        "ok": seq_eq and len_eq,
    }), flush=True)
    if not (seq_eq and len_eq):
        raise SystemExit(1)


if __name__ == "__main__":
    main()
