"""Host input-pipeline throughput: can the data layer feed the chip?

The device side sustains ~680 captioned img/s serving and ~420 img/s training
(bench.py, benchmarks/train_throughput.py). Those numbers only matter in
production if the HOST pipeline — decode + resize + normalize + batch +
prefetch — can deliver images at least that fast. The reference leans on
tf.data's C++ runtime for this (``/root/reference/dataset.py:89-92``); our
equivalent is the native C++ loader (``runtime/image_loader.cc``) behind
``data/dataset.py:load_image_batch`` with a thread-pool PIL fallback.

This benchmark builds a synthetic PNG corpus (smooth gradient + noise — an
X-ray-like compression profile; pure noise would overstate decode cost,
constant images would understate it) and measures:

  1. ``native``   — C++ decode_batch (zlib inflate + unfilter + half-pixel
                    bilinear resize + normalize, all threaded in native code)
  2. ``pil``      — the PIL ThreadPoolExecutor fallback path
  3. ``pipeline`` — end-to-end ``CocoCaptionDataset`` epoch iteration
                    (shuffle + batch + background prefetch), i.e. what train.py
                    actually consumes

Each prints one JSON line with images/sec and the ratio vs the device-side
serving rate (headroom > 1 means the host keeps the chip busy; the prefetch
thread overlaps host decode with device steps, so headroom is the right
metric, not latency).

Usage: python benchmarks/input_pipeline.py [--n 512] [--size 512]
       [--src-size 768] [--batch 64] [--workers 16] [--repeats 3]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEVICE_SERVING_IMG_S = 682.0  # bench.py headline, CLAUDE.md r3


def make_corpus(root: str, n: int, src_size: int) -> list[str]:
    """Write n synthetic PNGs with an X-ray-like luminance profile."""
    from PIL import Image

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:src_size, 0:src_size].astype(np.float32) / src_size
    paths = []
    for i in range(n):
        # smooth anatomy-scale structure + film grain, mostly mid-gray
        base = 90 + 70 * np.sin(3 * yy + i * 0.13) * np.cos(2 * xx - i * 0.07)
        grain = rng.normal(0, 12, (src_size, src_size)).astype(np.float32)
        gray = np.clip(base + grain, 0, 255).astype(np.uint8)
        img = np.stack([gray] * 3, axis=-1)
        p = os.path.join(root, f"xr_{i:05d}.png")
        Image.fromarray(img).save(p)
        paths.append(p)
    return paths


def bench_loader(paths, size, workers, repeats, use_native):
    from fpn_mt_image_captioning_tpu.data.dataset import load_image, load_image_batch
    from fpn_mt_image_captioning_tpu.runtime import native_loader
    from concurrent.futures import ThreadPoolExecutor

    def run_once():
        if use_native:
            out, ok = native_loader.decode_batch(paths, size, workers)
            assert ok.all(), "native decoder failed on PNG corpus"
            return out
        with ThreadPoolExecutor(max_workers=workers) as pool:
            return np.stack(
                list(pool.map(lambda p: load_image(p, None, size)[0], paths))
            )

    run_once()  # warm page cache / thread pools
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = run_once()
        best = min(best, time.perf_counter() - t0)
    assert out.shape == (len(paths), size, size, 3) and out.dtype == np.float32
    return len(paths) / best


def bench_pipeline(paths, size, batch, workers, repeats, cache_path=None):
    from fpn_mt_image_captioning_tpu.data.dataset import CocoCaptionDataset

    caps = np.ones((len(paths), 60), np.int32)
    ds = CocoCaptionDataset(
        paths, caps, batch_size=batch, image_size=size,
        drop_remainder=True, num_workers=workers, cache_path=cache_path,
    )
    best = float("inf")
    for _ in range(repeats + 1):  # first epoch warms caches
        t0 = time.perf_counter()
        n = 0
        for imgs, _ in ds:
            n += imgs.shape[0]
        dt = time.perf_counter() - t0
        best = min(best, dt)
    return n / best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--src-size", type=int, default=768,
                    help="on-disk resolution (IU X-ray PNGs are larger than 512)")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--workers", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--keep", action="store_true", help="keep the corpus dir")
    args = ap.parse_args()

    from fpn_mt_image_captioning_tpu.runtime import native_loader

    root = tempfile.mkdtemp(prefix="input_bench_")
    try:
        paths = make_corpus(root, args.n, args.src_size)
        disk_mb = sum(os.path.getsize(p) for p in paths) / 1e6

        args.batch = min(args.batch, args.n)  # drop_remainder needs >= 1 batch

        rows = []
        if native_loader.available():
            rows.append(("native", bench_loader(
                paths, args.size, args.workers, args.repeats, use_native=True)))
        rows.append(("pil", bench_loader(
            paths, args.size, args.workers, args.repeats, use_native=False)))
        rows.append(("pipeline", bench_pipeline(
            paths, args.size, args.batch, args.workers, args.repeats)))
        # the decoded-image cache (Config.dataset_cache): epoch 1 decodes once,
        # the measured epochs stream from the uint8 memmap
        rows.append(("pipeline+cache", bench_pipeline(
            paths, args.size, args.batch, args.workers, args.repeats,
            cache_path=os.path.join(root, "_decoded_cache"))))

        for name, rate in rows:
            print(json.dumps({
                "metric": f"input images/sec ({name})",
                "value": round(rate, 1), "unit": "img/s",
                "headroom_vs_device_serving": round(rate / DEVICE_SERVING_IMG_S, 2),
                "n": args.n, "src_size": args.src_size, "size": args.size,
                "workers": args.workers, "cpus": os.cpu_count(),
                "corpus_mb": round(disk_mb, 1),
            }), flush=True)
    finally:
        if args.keep:
            print("corpus kept at", root)
        else:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
