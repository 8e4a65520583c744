"""Batched serving CLI: caption a directory (or list) of images at full device
throughput — the user-facing surface for BASELINE.json's serving contract
(batch-N beam-K decode with the shared-KV-cache engine).

No reference counterpart (``/root/reference/test.py`` captions ONE image per
process run); this is the TPU-native framework's production path: images are
decoded/resized on host threads, the NEXT batch is prefetched while the device
captions the current one, and decode runs batch×beam-parallel through the
fused Pallas decoder (on TPU) or the XLA cached engine elsewhere.

    python caption.py --images=path/to/dir [--out=results/captions.json]
                      [--decode_batch=64] [--beam_search_n=8]
                      [--artifact=DIR]   # run a compiled export.py artifact

Writes a JSON list of {"file", "caption"} and prints throughput.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from fpn_mt_image_captioning_tpu.config import Config
from fpn_mt_image_captioning_tpu.data.dataset import (
    load_max_seq_len,
    load_image_batch,
)
from fpn_mt_image_captioning_tpu.train.pipeline import Pipeline

IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".ppm", ".bmp")


def list_images(path: str) -> list[str]:
    if not os.path.exists(path):
        raise SystemExit(f"no such file or directory: {path}")
    if os.path.isfile(path):
        return [path]
    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.lower().endswith(IMAGE_EXTS)
    )
    if not files:
        raise SystemExit(f"no images under {path}")
    return files


def measure_latency(pipeline, files, image_size: int, n: int) -> dict:
    """End-to-end single-request latency: host image load → device encode +
    beam decode → detokenized caption string. Unlike bench.py's batch-1 slope
    (pure device compute — dispatch and host time cancel by construction),
    this times the full request path a caller actually experiences, including
    host↔device transfer and any tunnel round-trip."""
    reps = [files[i % len(files)] for i in range(n)]
    u8 = bool(getattr(pipeline, "accepts_uint8", False))
    # warm-up: compiles the batch-1 encode + decode programs
    img = load_image_batch(reps[:1], image_size, as_uint8=u8)
    seqs, lengths = pipeline.predict_batch(img)
    pipeline.to_caption(seqs[0], lengths[0])

    times = []
    for f in reps:
        t0 = time.perf_counter()
        img = load_image_batch([f], image_size, as_uint8=u8)
        seqs, lengths = pipeline.predict_batch(img)
        pipeline.to_caption(seqs[0], lengths[0])
        times.append((time.perf_counter() - t0) * 1000)
    times.sort()
    return {
        "metric": "end-to-end single-request latency",
        "unit": "ms",
        "n": n,
        "p50_ms": round(times[max(math.ceil(0.5 * len(times)) - 1, 0)], 2),
        # nearest-rank percentile: index ceil(0.9n)-1 (int(0.9n) overstates
        # for small n — it reports the max of 10 samples as "p90")
        "p90_ms": round(times[max(math.ceil(0.9 * len(times)) - 1, 0)], 2),
        "min_ms": round(times[0], 2),
    }


def _write_results(results: list[dict], out_path: str | None, cfg: Config) -> str:
    if out_path is None:
        out_path = os.path.join(cfg.result_dir, "serving_captions_result.json")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out_path}")
    return out_path


def main(
    cfg: Config, images_path: str, out_path: str | None, latency_n: int = 0,
    pipeline=None,
) -> list[dict]:
    files = list_images(images_path)
    owns_pipeline = pipeline is None
    if owns_pipeline:
        max_seq_len = load_max_seq_len(cfg.additional_filename)
        pipeline = Pipeline(
            cfg.tokenizer_filename, cfg.transformer_checkpoint_path, max_seq_len, cfg
        )

    batch = max(cfg.decode_batch, 1)
    chunks = [files[i : i + batch] for i in range(0, len(files), batch)]
    results: list[dict] = []
    # live Pipelines and uint8-capable artifacts take raw uint8 (normalized
    # on-device, 4× smaller transfer); pre-uint8 artifacts keep float
    u8 = bool(getattr(pipeline, "accepts_uint8", False))
    # one dedicated prefetch thread; load_image_batch fans out its own decode
    # workers (native C++ loader when built, PIL fallback otherwise)
    prefetcher = ThreadPoolExecutor(max_workers=1)

    def submit(chunk):
        return prefetcher.submit(
            load_image_batch, chunk, cfg.image_input_size, as_uint8=u8
        )

    def captioned(chunk, imgs):
        if len(chunk) < batch:  # pad the tail so the compiled shape is reused
            imgs = np.concatenate(
                [imgs, np.zeros((batch - len(chunk), *imgs.shape[1:]), imgs.dtype)]
            )
        seqs, lengths = pipeline.predict_batch(imgs)
        return [
            {"file": f, "caption": pipeline.to_caption(seqs[i], lengths[i])}
            for i, f in enumerate(chunk)
        ]

    # an image-load or decode failure mid-run must not lose already-computed
    # captions or leak the prefetch executor / checkpoint-manager threads
    try:
        # warm-up outside the timed region: the first predict_batch jit-compiles
        # encode + the whole beam-search loop (minutes on a cold cache)
        pending = submit(chunks[0])
        first_imgs = pending.result()
        results.extend(captioned(chunks[0], first_imgs))

        # prefetch pipeline: host loads batch i+1 while the device captions batch i
        t0 = time.perf_counter()
        if len(chunks) > 1:
            pending = submit(chunks[1])
            for ci in range(1, len(chunks)):
                imgs = pending.result()
                if ci + 1 < len(chunks):
                    pending = submit(chunks[ci + 1])
                results.extend(captioned(chunks[ci], imgs))
        dt = time.perf_counter() - t0
        timed_images = len(files) - len(chunks[0])

        if timed_images:
            print(
                f"captioned {len(files)} images ({timed_images} post-warm-up in "
                f"{dt:.2f}s = {timed_images/dt:.1f} img/s end-to-end, "
                f"batch={batch}, beam={cfg.beam_search_n})"
            )
        else:
            print(
                f"captioned {len(files)} images (single batch incl. compile; "
                f"batch={batch}, beam={cfg.beam_search_n})"
            )

        if latency_n:
            print(json.dumps(
                measure_latency(pipeline, files, cfg.image_input_size, latency_n)
            ))

        # write INSIDE the try: a failure in the finally-block cleanup
        # (e.g. the checkpoint manager surfacing a background-thread error at
        # close) must not lose fully-computed results
        _write_results(results, out_path, cfg)
    except BaseException:
        if results:  # partial results are still worth persisting
            try:
                _write_results(results, out_path, cfg)
            except Exception as write_err:  # never mask the root cause
                print(f"failed to write partial results: {write_err}", file=sys.stderr)
        raise
    finally:
        prefetcher.shutdown(wait=False, cancel_futures=True)
        if owns_pipeline:  # never close a caller-provided pipeline
            pipeline.close()

    return results


if __name__ == "__main__":
    images, out, latency_n, artifact = None, None, 0, None
    passthrough = []
    for arg in sys.argv[1:]:
        if arg.startswith("--images="):
            images = arg.split("=", 1)[1]
        elif arg.startswith("--out="):
            out = arg.split("=", 1)[1]
        elif arg.startswith("--latency="):
            latency_n = int(arg.split("=", 1)[1])
        elif arg == "--latency":
            latency_n = 16
        elif arg.startswith("--artifact="):
            artifact = arg.split("=", 1)[1]
        else:
            passthrough.append(arg)
    if images is None:
        raise SystemExit(
            "usage: python caption.py --images=<dir-or-file> [--out=...] "
            "[--latency[=N]] [--artifact=DIR]"
        )
    cfg = Config.from_flags(passthrough)
    served = None
    if artifact:
        # serve from a compiled export.py artifact (no model construction)
        from fpn_mt_image_captioning_tpu.export import load_serving

        served = load_serving(artifact)
        cfg = served.apply_to_config(cfg)
    main(cfg, images, out, latency_n=latency_n, pipeline=served)
