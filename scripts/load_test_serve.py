"""Load-test client for serve.py: concurrent POSTs → throughput + latency.

Measures what the dynamic batcher actually delivers under load: N requests
from C concurrent clients against a running server, reporting client-side
throughput, latency percentiles, and the server's own /stats (batch-fill and
device-time window) afterwards.

    python serve.py --port=8500 &                    # start the server first
    python scripts/load_test_serve.py --url=http://localhost:8500 \
        --image=path/to/img.png --n=256 --concurrency=64

With no --image, a synthetic 512² PNG is generated in-memory.
"""

from __future__ import annotations

import argparse
import io
import json
import math
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def synthetic_png(size: int = 512) -> bytes:
    from PIL import Image

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (size, size), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr, mode="L").convert("RGB").save(buf, format="PNG")
    return buf.getvalue()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://127.0.0.1:8500")
    ap.add_argument("--image", default=None)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--concurrency", type=int, default=64)
    ap.add_argument("--timeout", type=float, default=600.0)
    args = ap.parse_args()

    body = (
        open(args.image, "rb").read() if args.image else synthetic_png()
    )

    def one(_i: int) -> float:
        t0 = time.perf_counter()
        req = urllib.request.Request(
            args.url + "/caption", data=body, method="POST"
        )
        with urllib.request.urlopen(req, timeout=args.timeout) as r:
            json.loads(r.read())
        return time.perf_counter() - t0

    one(0)  # warm-up request (first batch may compile)

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=args.concurrency) as pool:
        times = sorted(pool.map(one, range(args.n)))
    wall = time.perf_counter() - t0

    def pct(p: float) -> float:
        return times[max(math.ceil(p * len(times)) - 1, 0)] * 1000

    print(json.dumps({
        "metric": "served requests/sec",
        "value": round(args.n / wall, 2), "unit": "req/s",
        "n": args.n, "concurrency": args.concurrency,
        "p50_ms": round(pct(0.5), 1), "p90_ms": round(pct(0.9), 1),
        "p99_ms": round(pct(0.99), 1),
    }, ), flush=True)

    with urllib.request.urlopen(args.url + "/stats", timeout=30) as r:
        print("/stats:", r.read().decode())


if __name__ == "__main__":
    main()
