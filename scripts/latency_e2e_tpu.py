"""End-to-end single-request latency on real TPU → benchmarks/latency_e2e.json.

VERDICT r3 item 7: pin the end-to-end single-request latency (host image load
→ device encode + beam decode → caption string) as a committed artifact, next
to bench.py's batch-1 *device* slope (which cancels host and dispatch time by
construction). Uses ``caption.measure_latency`` — the same code path a CLI
user runs — on a flagship-dims pipeline (512² input, d_model 512, 6+6 layers,
dff 2048, beam 8, ~2k-word tokenizer, bfloat16, random weights; weights don't
affect latency).

Since round 4 the live Pipeline ships raw uint8 to the device and normalizes
there (models/layers.py:normalize_images) — the measured request includes
that 4×-smaller transfer.

Run:  timeout 3600 python scripts/latency_e2e_tpu.py [--n 64] [--tiny]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--image_size", type=int, default=512)
    ap.add_argument("--n_files", type=int, default=8)
    ap.add_argument("--tiny", action="store_true", help="CPU smoke: micro model")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_latency_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from fixtures import make_synthetic_dataset
    from serve_load_tpu import flagship_tokenizer

    from caption import measure_latency
    from fpn_mt_image_captioning_tpu.config import Config
    from fpn_mt_image_captioning_tpu.train.pipeline import Pipeline

    if args.tiny:
        args.image_size, args.n = 256, 4

    ws = os.path.abspath(os.environ.get("LATENCY_WS", "/tmp/latency_ws"))
    if os.path.isdir(ws):
        shutil.rmtree(ws)
    os.makedirs(ws)
    datadir = make_synthetic_dataset(
        os.path.join(ws, "data"), n_train=2, n_val=1, image_size=args.image_size
    )
    tok_path = os.path.join(ws, "_tokenizer.json")
    flagship_tokenizer(tok_path)

    # distinct image files so host decode isn't a single hot page-cache entry
    from PIL import Image

    img_dir = os.path.join(ws, "imgs")
    os.makedirs(img_dir)
    rng = np.random.default_rng(0)
    files = []
    for i in range(args.n_files):
        p = os.path.join(img_dir, f"{i}.png")
        Image.fromarray(
            rng.integers(0, 255, (args.image_size, args.image_size), np.uint8),
            mode="L",
        ).convert("RGB").save(p)
        files.append(p)

    model_kw = (
        dict(num_layers=2, d_model=32, dff=64, num_heads=4, beam_search_n=2,
             compute_dtype="float32")
        if args.tiny
        else dict(beam_search_n=8, compute_dtype="bfloat16")
    )
    cfg = Config(
        datadir=datadir,
        image_input_size=args.image_size,
        tokenizer_filename=tok_path,
        additional_filename=os.path.join(ws, "_additional.json"),
        transformer_checkpoint_path=os.path.join(ws, "ckpt"),
        result_dir=os.path.join(ws, "results"),
        **model_kw,
    )
    t0 = time.perf_counter()
    pipeline = Pipeline(cfg.tokenizer_filename, cfg.transformer_checkpoint_path,
                        max_seq_len=12 if args.tiny else 60, config=cfg)
    print(f"pipeline ready in {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    res = measure_latency(pipeline, files, cfg.image_input_size, args.n)
    wall = time.perf_counter() - t0

    out = {
        **res,
        "backend": jax.default_backend(),
        "image_size": cfg.image_input_size,
        "beam": cfg.beam_search_n,
        "compute_dtype": cfg.compute_dtype,
        "uint8_feed": bool(getattr(pipeline, "accepts_uint8", False)),
        "measure_wall_s": round(wall, 1),
        "note": "full request path: PNG file load -> uint8 host->device -> "
                "on-device normalize + encode + fused beam decode -> "
                "detokenized string; includes tunnel round-trips (~30 ms/sync "
                "on this setup, see CLAUDE.md measurement rules)",
    }
    path = os.path.join(REPO, "benchmarks", "latency_e2e.json")
    if args.tiny:
        path = os.path.join(ws, "latency_e2e.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    print("wrote", path)
    pipeline.close()


if __name__ == "__main__":
    main()
