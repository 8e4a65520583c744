"""End-to-end ONLINE serving throughput on real TPU: serve.py + HTTP load.

Starts the real ``CaptionServer`` (dynamic batching, fixed compiled batch —
serve.py) on a flagship-dims pipeline (512² input, d_model 512, 6+6 layers,
dff 2048, beam 8, ~2k-word tokenizer — the bench.py headline configuration,
random weights) and drives it over real HTTP with concurrent clients,
reporting client-side req/s + latency percentiles and the server's own
``/stats`` (batch-fill histogram, device-batch window).

What this measures that bench.py cannot: the FULL serving stack — HTTP
framing, per-request host-side PNG decode, the dynamic batcher's coalescing,
pad-to-shape, and detokenization — not just device compute. On a small-core
host the HOST is the expected bottleneck (each request decodes a 512² PNG
host-side; README §serving notes ~56 img/s/core for the native loader on
768² images), so the interesting output is the pair (client req/s, device
ms/batch from /stats): the gap is chip idle headroom a bigger host would
reclaim.

Run:  timeout 3600 python scripts/serve_load_tpu.py \
          [--n 512] [--concurrency 64] [--serve_batch 32] \
          [--max_delay_ms 50] [--decode beam|sample] [--artifact]

``--artifact`` freezes the pipeline into a compiled export.py artifact and
serves the loaded artifact instead — measuring the `serve.py --artifact=DIR`
deployment path (incl. its uint8-input twin programs).

Writes ``benchmarks/serving_http_<backend>_<decode>[_artifact].json``.
"""

from __future__ import annotations

import argparse
import io
import json
import math
import os
import shutil
import sys
import threading
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np


def flagship_tokenizer(path: str, vocab_words: int = 1997) -> None:
    """Fit + store a tokenizer whose index covers ~2000 words (IU X-ray's real
    vocabulary scale, the bench.py default) so the decode program's final
    projection and top-k run at representative width."""
    from fpn_mt_image_captioning_tpu.data.tokenizer import (
        REFERENCE_FILTERS,
        Tokenizer,
        store_tokenizer_to_path,
    )

    words = [f"w{i}" for i in range(vocab_words)]
    texts = [
        "<start> " + " ".join(words[j : j + 25]) + " <end>"
        for j in range(0, vocab_words, 25)
    ]
    tok = Tokenizer(num_words=2000, oov_token="unk", filters=REFERENCE_FILTERS)
    tok.fit_on_texts(texts)
    tok.add_padding_token()
    store_tokenizer_to_path(tok, path)


def synthetic_png(size: int) -> bytes:
    from PIL import Image

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (size, size), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr, mode="L").convert("RGB").save(buf, format="PNG")
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--concurrency", type=int, default=64)
    ap.add_argument("--serve_batch", type=int, default=32)
    ap.add_argument("--max_delay_ms", type=float, default=50.0)
    ap.add_argument("--decode", default="beam", choices=("beam", "sample"))
    ap.add_argument("--artifact", action="store_true",
                    help="export a compiled serving artifact from the "
                         "pipeline and serve THAT (the deployment path of "
                         "serve.py --artifact=DIR) instead of the live model")
    ap.add_argument("--image_size", type=int, default=512)
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke: micro model/corpus, n=8")
    args = ap.parse_args()
    if args.tiny:
        args.image_size, args.n, args.concurrency = 256, 8, 4
        args.serve_batch = 4

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_serve_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from fixtures import make_synthetic_dataset
    from fpn_mt_image_captioning_tpu.config import Config
    from fpn_mt_image_captioning_tpu.train.pipeline import Pipeline

    import serve

    ws = os.path.abspath(os.environ.get("SERVE_LOAD_WS", "/tmp/serve_load_ws"))
    if os.path.isdir(ws):
        shutil.rmtree(ws)
    os.makedirs(ws)
    # tiny synthetic COCO tree only for MetricEval's constructor; the tokenizer
    # is the flagship-vocab one built below, not the corpus'
    datadir = make_synthetic_dataset(
        os.path.join(ws, "data"), n_train=2, n_val=1, image_size=args.image_size
    )
    tok_path = os.path.join(ws, "_tokenizer.json")
    flagship_tokenizer(tok_path)

    model_kw = (
        dict(num_layers=2, d_model=32, dff=64, num_heads=4, beam_search_n=2,
             compute_dtype="float32")
        if args.tiny
        else dict(beam_search_n=8, compute_dtype="bfloat16")
    )
    cfg = Config(
        datadir=datadir,
        image_input_size=args.image_size,
        decode_batch=args.serve_batch,
        tokenizer_filename=tok_path,
        additional_filename=os.path.join(ws, "_additional.json"),
        transformer_checkpoint_path=os.path.join(ws, "ckpt"),
        result_dir=os.path.join(ws, "results"),
        **model_kw,
    )
    t0 = time.perf_counter()
    pipeline = Pipeline(cfg.tokenizer_filename, cfg.transformer_checkpoint_path,
                        max_seq_len=12 if args.tiny else 60, config=cfg)
    print(f"pipeline ready (init compile) in {time.perf_counter() - t0:.1f}s",
          flush=True)

    if args.artifact:
        # measure the DEPLOYED path: freeze the pipeline into a compiled
        # StableHLO artifact (uint8-input twin programs included) and serve
        # the loaded artifact — exactly what `serve.py --artifact=DIR` runs
        from fpn_mt_image_captioning_tpu.export import (
            export_serving,
            load_serving,
        )

        art_dir = os.path.join(ws, "artifact")
        t0 = time.perf_counter()
        export_serving(pipeline, art_dir, batch=args.serve_batch,
                       sample=args.decode == "sample")
        print(f"artifact exported in {time.perf_counter() - t0:.1f}s",
              flush=True)
        pipeline.close()
        pipeline = load_serving(art_dir)
        cfg = pipeline.apply_to_config(cfg)

    srv = serve.make_server(cfg, port=0, serve_batch=args.serve_batch,
                            max_delay_ms=args.max_delay_ms, pipeline=pipeline,
                            decode=args.decode)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    body = synthetic_png(args.image_size)

    shed = {"retries": 0, "failures": 0}
    shed_lock = threading.Lock()

    def one(_i: int) -> float | None:
        """One request → client latency in seconds. 503 (load shedding is a
        DESIGNED response above max_queue) retries after Retry-After; other
        failures are counted, not raised — one bad response must not abort a
        multi-minute TPU measurement (latency then includes the backoff, as a
        real client would experience it)."""
        t0 = time.perf_counter()
        url = base + "/caption" + (
            "?temperature=0.8&top_p=0.95" if args.decode == "sample" else ""
        )
        for _attempt in range(50):
            req = urllib.request.Request(url, data=body, method="POST")
            try:
                with urllib.request.urlopen(req, timeout=3600) as r:
                    json.loads(r.read())
                return time.perf_counter() - t0
            except urllib.error.HTTPError as e:
                if e.code != 503:
                    break
                with shed_lock:
                    shed["retries"] += 1
                time.sleep(float(e.headers.get("Retry-After", 1)))
            except Exception:
                break
        with shed_lock:
            shed["failures"] += 1
        return None

    t0 = time.perf_counter()
    if one(0) is None:  # first batch compiles encode + decode via the tunnel
        raise SystemExit("warm-up request failed — aborting the load run")
    print(f"warm-up request (compile) in {time.perf_counter() - t0:.1f}s",
          flush=True)
    # keep the compile batch out of the measured device-time percentiles
    urllib.request.urlopen(
        urllib.request.Request(base + "/stats/reset", method="POST"), timeout=60
    ).read()

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=args.concurrency) as pool:
        times = sorted(t for t in pool.map(one, range(args.n)) if t is not None)
    wall = time.perf_counter() - t0
    if not times:
        raise SystemExit("every request failed — no percentiles to report")

    def pct(p: float) -> float:
        return times[max(math.ceil(p * len(times)) - 1, 0)] * 1000

    with urllib.request.urlopen(base + "/stats", timeout=60) as r:
        stats = json.loads(r.read())

    result = {
        "metric": f"served requests/sec over HTTP ({args.decode} decode)",
        "value": round(len(times) / wall, 2),
        "unit": "req/s",
        "n": args.n,
        "completed": len(times),
        "client_503_retries": shed["retries"],
        "client_failures": shed["failures"],
        "concurrency": args.concurrency,
        "serve_batch": args.serve_batch,
        "image_size": args.image_size,
        "vocab": pipeline.target_vocab_size,
        "p50_ms": round(pct(0.5), 1),
        "p90_ms": round(pct(0.9), 1),
        "p99_ms": round(pct(0.99), 1),
        "host_cores": os.cpu_count(),
        "backend": jax.default_backend(),
        # each device batch ships B×S×S×3 host→device — uint8 (1 B/px) when
        # the live Pipeline normalizes on-device (round 4), f32 (4 B/px) for
        # exported artifacts. Through the remote-TPU tunnel of this
        # environment that transfer dominates the device-batch window
        # (colocated-host PCIe would make it negligible — compare bench.py's
        # on-device slope for the compute-only number)
        "served_from": "artifact" if args.artifact else "live_pipeline",
        "uint8_feed": srv.input_uint8,
        "batch_upload_mb": round(
            args.serve_batch * args.image_size**2 * 3
            * (1 if srv.input_uint8 else 4) / 1e6, 1
        ),
        "server_stats": stats,
    }
    print(json.dumps(result), flush=True)
    # --tiny is a smoke test: report, but don't overwrite committed evidence
    out_dir = os.path.join(REPO, "benchmarks") if not args.tiny else ws
    suffix = "_artifact" if args.artifact else ""
    out = os.path.join(
        out_dir,
        f"serving_http_{jax.default_backend()}_{args.decode}{suffix}.json",
    )
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", out, flush=True)
    srv.shutdown()
    srv.close()
    pipeline.close()


if __name__ == "__main__":
    main()
