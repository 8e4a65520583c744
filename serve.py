"""HTTP serving endpoint with dynamic batching — the online-serving surface.

No reference counterpart (``/root/reference/test.py`` captions one image per
process run); this is the production companion to ``caption.py`` (offline
batch): a stdlib-only HTTP server that coalesces concurrent single-image
requests into fixed-size device batches so online traffic rides the same
batch-64 × beam-8 fused-decode program as offline serving.

Design (TPU-first):
  * ONE compiled program. Every device batch is padded to ``--serve_batch``
    (default ``Config.decode_batch``), so the server never triggers a
    recompile — arbitrary request arrival patterns reuse the warm executable
    (XLA retraces per shape; a naive variable-size batcher would compile B
    distinct programs and stall requests for minutes each).
  * Dynamic batching. The batcher thread takes the first queued request, then
    drains up to batch-1 more within ``--max_delay_ms`` (default 10) — at low
    traffic a request pays at most the delay window; at high traffic batches
    fill instantly and throughput approaches bench.py's batch-64 slope.
  * Host/device overlap. Image decode happens on the HTTP handler threads
    (ThreadingHTTPServer), tokenizer detokenization on the batcher thread;
    the device only sees ready (B, S, S, 3) arrays.

Endpoints:
  POST /caption            image bytes (PNG/JPEG/anything PIL reads) in the
                           body → {"caption": str, "tokens": int}. Under
                           --decode=sample, optional ?temperature=&top_p=
                           query params apply PER REQUEST (they are per-row
                           traced inputs — mixed settings share the one
                           compiled program)
  GET  /healthz            liveness + model/config info
  GET  /stats              request/batch counters, batch-fill histogram,
                           rolling latency percentiles
  POST /stats/reset        zero the counters/window (load tests call this
                           after warm-up so compile time stays out of the
                           measured percentiles)

Overload behavior: the request queue is bounded (``--max_queue``, default
8 × serve_batch); beyond it requests get 503 + Retry-After (load shedding)
instead of unbounded queueing. The listen backlog is 128 so concurrency
bursts don't RST at the TCP accept queue.

Usage:
  python serve.py [--port=8500] [--serve_batch=64] [--max_delay_ms=10]
                  [--beam_search_n=8] [--decode=beam|sample] [--sample_seed=N]
                  [--max_queue=N] [--request_timeout_s=1800]
                  [any Config --key=value override]
  python serve.py --artifact=DIR [...]   # serve a compiled export.py artifact
                                         # (no model code / checkpoint needed)

Load-test locally with e.g.:
  for i in $(seq 64); do curl -s -XPOST --data-binary @img.png \
      http://localhost:8500/caption & done; wait
"""

from __future__ import annotations

import io
import json
import os
import sys
import threading
import time
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from fpn_mt_image_captioning_tpu.config import Config
from fpn_mt_image_captioning_tpu.data.dataset import load_max_seq_len
from fpn_mt_image_captioning_tpu.train.pipeline import Pipeline
from fpn_mt_image_captioning_tpu.utils.profiling import StepTimer


def decode_image_bytes(data: bytes, image_size: int,
                       as_uint8: bool = False) -> np.ndarray:
    """Decode → RGB → bilinear resize → [-1, 1] float32 (HTTP-body variant of
    ``data/dataset.py:load_image``, which accepts the in-memory source
    directly — one implementation, not a parallel copy to keep in lockstep).

    ``as_uint8=True`` returns the resized uint8 pixels instead — the live
    Pipeline normalizes them on-device (``models.layers.normalize_images``),
    and the host→device batch transfer shrinks 4× (the measured serving
    bottleneck, benchmarks/serving_http_tpu_beam.json)."""
    from fpn_mt_image_captioning_tpu.data.dataset import load_image

    arr, _ = load_image(io.BytesIO(data), image_size=image_size,
                        as_uint8=as_uint8)
    return arr


class QueueFull(RuntimeError):
    """Raised by DynamicBatcher.submit when the queue is at max_queue; the
    HTTP layer maps it to 503 + Retry-After (load-shedding backpressure)."""


class DynamicBatcher:
    """Coalesces submitted images into fixed-size ``Pipeline.predict_batch``
    calls on a dedicated thread; callers get a Future of the caption string.

    ``decode="sample"`` switches the device call to ``Pipeline.sample_batch``:
    temperature/top_p are PER-ROW traced inputs there, so requests with
    different sampling settings still coalesce into the one compiled program.
    """

    def __init__(self, pipeline: Pipeline, batch: int, max_delay_ms: float,
                 decode: str = "beam",
                 sample_seed: int = 0, max_queue: int | None = None):
        self.pipeline = pipeline
        self.batch = batch
        self.max_delay_s = max_delay_ms / 1000.0
        self.decode = decode
        self.sample_seed = sample_seed
        # backpressure: beyond this many queued images, submit() raises
        # QueueFull and the handler replies 503 — bounding host memory and
        # tail latency instead of queueing unboundedly (default: 8 device
        # batches of headroom ≈ 8 × the device batch time worst-case wait)
        self.max_queue = 8 * batch if max_queue is None else max_queue
        self._queue: list[tuple[np.ndarray, float, float, Future]] = []
        self._lock = threading.Condition()
        self._closed = False
        self.stats = {
            "requests": 0, "batches": 0, "images_padded": 0, "errors": 0,
            "rejected": 0,
        }
        self.timer = StepTimer(window=512)  # device time per batch
        self._batch_seq = 0  # sampling-seed counter; survives reset_stats
        # bumped by reset_stats: a batch in flight across a reset must not
        # leak its counters/timing into the freshly zeroed window
        self._stats_gen = 0
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def reset_stats(self) -> None:
        """Zero the counters and the device-time window (POST /stats/reset):
        load tests call this after their warm-up request so compile time
        doesn't pollute the measured percentiles. The sampling-seed sequence
        is NOT reset — replayed seeds would replay captions."""
        with self._lock:
            for k in self.stats:
                self.stats[k] = 0
            self.timer = StepTimer(window=512)
            self._stats_gen += 1

    def submit(self, img: np.ndarray, temperature: float = 1.0,
               top_p: float = 1.0) -> Future:
        fut: Future = Future()
        with self._lock:
            if self._closed:
                raise RuntimeError("batcher is closed")
            if len(self._queue) >= self.max_queue:
                self.stats["rejected"] += 1
                raise QueueFull(
                    f"{len(self._queue)} images already queued "
                    f"(max_queue={self.max_queue}); retry later"
                )
            self._queue.append((img, temperature, top_p, fut))
            self.stats["requests"] += 1
            self._lock.notify()
        return fut

    def _take_batch(self):
        """Block for the first request, then fill until the batch is full or
        ``max_delay_s`` has elapsed since the first arrival."""
        with self._lock:
            while not self._queue and not self._closed:
                self._lock.wait(timeout=0.2)
            if not self._queue:
                return None  # closed and drained
            deadline = time.monotonic() + self.max_delay_s
            while len(self._queue) < self.batch and not self._closed:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                self._lock.wait(timeout=remaining)
            items, self._queue = self._queue[: self.batch], self._queue[self.batch:]
            return items

    def _worker(self):
        while True:
            items = self._take_batch()
            if items is None:
                return
            with self._lock:
                # snapshot: if reset_stats lands mid-batch, this batch's
                # timing/counters go to the OLD generation's timer/stats and
                # never pollute the freshly zeroed window
                gen, timer = self._stats_gen, self.timer
            pad = self.batch - len(items)
            failed = False
            try:
                # batch assembly INSIDE the try: an allocation failure here
                # (e.g. MemoryError under burst load on a small host) must
                # fail these futures, not kill the only batcher thread and
                # zombify the server
                imgs = np.stack([im for im, _, _, _ in items])
                if pad:  # fixed compiled shape: pad tail, decode rows dropped
                    imgs = np.concatenate(
                        [imgs, np.zeros((pad, *imgs.shape[1:]), imgs.dtype)]
                    )
                timer.start()
                if self.decode == "sample":
                    temps = np.ones(self.batch, np.float32)
                    tps = np.ones(self.batch, np.float32)
                    for i, (_, temp, tp, _) in enumerate(items):
                        temps[i], tps[i] = temp, tp
                    seqs, lengths = self.pipeline.sample_batch(
                        imgs, temperature=temps,
                        # top_p=None is a trace-time off switch (skips the
                        # per-step vocab sort); batches where no request asked
                        # for nucleus use the cheaper program
                        top_p=None if (tps >= 1.0).all() else tps,
                        # per-batch seed: concurrent identical requests sample
                        # independently across batches, reproducibly per server
                        seed=self.sample_seed + self._batch_seq,
                    )
                else:
                    # beam width comes from the pipeline's own config
                    # (--beam_search_n); exported artifacts pin it at trace
                    # time and reject overrides
                    seqs, lengths = self.pipeline.predict_batch(imgs)
                timer.stop()
                for i, (_, _, _, fut) in enumerate(items):
                    if not fut.done():  # close() may have failed it already
                        fut.set_result((
                            self.pipeline.to_caption(seqs[i], lengths[i]),
                            int(lengths[i]),
                        ))
            except BaseException as e:  # noqa: BLE001 - all callers must unblock
                failed = True
                for *_, fut in items:
                    if not fut.done():
                        fut.set_exception(e)
            with self._lock:
                self._batch_seq += 1
                if gen == self._stats_gen:
                    self.stats["batches"] += 1
                    self.stats["images_padded"] += pad
                    if failed:
                        self.stats["errors"] += 1

    def close(self):
        with self._lock:
            self._closed = True
            self._lock.notify_all()
        self._thread.join(timeout=30)
        # unblock any requests that raced the close — swap the queue out under
        # the lock so a still-running worker can't concurrently slice it
        with self._lock:
            leftovers, self._queue = self._queue, []
        for *_, fut in leftovers:
            if not fut.done():
                fut.set_exception(RuntimeError("server shutting down"))


class CaptionServer(ThreadingHTTPServer):
    daemon_threads = True
    # listen backlog: socketserver's default of 5 RSTs connections when a
    # concurrency burst (e.g. 64 clients connecting at once) overflows the
    # accept queue — measured 29/512 resets on loopback before raising this
    request_queue_size = 128

    def __init__(self, addr, pipeline: Pipeline, cfg: Config, batch: int,
                 max_delay_ms: float, request_timeout_s: float = 600.0,
                 decode: str = "beam", sample_seed: int = 0,
                 max_queue: int | None = None):
        self.pipeline = pipeline
        self.cfg = cfg
        # live Pipelines and uint8-capable artifacts normalize uint8
        # on-device (4× smaller host→device transfer); pre-uint8 artifacts
        # keep the float feed
        self.input_uint8 = bool(getattr(pipeline, "accepts_uint8", False))
        self.batcher = DynamicBatcher(pipeline, batch, max_delay_ms,
                                      decode=decode, sample_seed=sample_seed,
                                      max_queue=max_queue)
        self.request_timeout_s = request_timeout_s
        super().__init__(addr, _Handler)

    def close(self):
        self.batcher.close()
        self.pipeline.close()
        self.server_close()  # release the listening socket (shutdown() doesn't)


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    server: CaptionServer

    def _reply(self, code: int, payload: dict,
               extra_headers: dict[str, str] | None = None):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        for k, v in (extra_headers or {}).items():
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *args):  # quiet: stats live at /stats
        pass

    def do_GET(self):
        srv = self.server
        if self.path == "/healthz":
            import jax

            self._reply(200, {
                "status": "ok",
                "backend": jax.default_backend(),
                "serve_batch": srv.batcher.batch,
                "decode": srv.batcher.decode,
                "beam": srv.cfg.beam_search_n,
                "image_size": srv.cfg.image_input_size,
            })
        elif self.path == "/stats":
            st = dict(srv.batcher.stats)
            done = st["batches"] * srv.batcher.batch - st["images_padded"]
            st["mean_batch_fill"] = round(
                done / st["batches"], 2) if st["batches"] else 0.0
            # live queue depth vs capacity: the autoscaling/backpressure signal
            st["queue_depth"] = len(srv.batcher._queue)
            st["max_queue"] = srv.batcher.max_queue
            st["device_batch_ms"] = {
                k: round(v, 2) for k, v in srv.batcher.timer.summary().items()
            }
            self._reply(200, st)
        else:
            self._reply(404, {"error": f"no such path {self.path}"})

    def do_POST(self):
        from urllib.parse import parse_qs, urlsplit

        parts = urlsplit(self.path)
        length = int(self.headers.get("Content-Length", 0))

        def drain():  # unread bodies corrupt HTTP/1.1 keep-alive framing:
            if length:  # the NEXT request on the connection would be parsed
                self.rfile.read(length)  # starting at the leftover bytes

        if parts.path == "/stats/reset":
            drain()
            self.server.batcher.reset_stats()
            self._reply(200, {"status": "reset"})
            return
        if parts.path != "/caption":
            drain()
            self._reply(404, {"error": f"no such path {self.path}"})
            return
        srv = self.server
        query = parse_qs(parts.query)

        def reject(msg):
            drain()
            self._reply(400, {"error": msg})

        try:
            import math

            temperature = float(query.get("temperature", ["1.0"])[0])
            top_p = float(query.get("top_p", ["1.0"])[0])
            # NaN slips through plain comparisons (nan < 0 is False) and would
            # poison that row's logits — require finite explicitly
            if not math.isfinite(temperature) or temperature < 0 \
                    or not (0 < top_p <= 1):
                raise ValueError("finite temperature >= 0 and 0 < top_p <= 1 "
                                 "required")
        except ValueError as e:
            reject(f"bad sampling params: {e}")
            return
        if srv.batcher.decode != "sample" and (
            "temperature" in query or "top_p" in query
        ):
            reject("sampling params require the server to run with "
                   "--decode=sample (this one decodes beam search)")
            return
        try:
            if not length:
                self._reply(400, {"error": "empty body; POST raw image bytes"})
                return
            data = self.rfile.read(length)
            img = decode_image_bytes(data, srv.cfg.image_input_size,
                                     as_uint8=srv.input_uint8)
        except Exception as e:
            self._reply(400, {"error": f"undecodable image: {e}"})
            return
        try:
            t0 = time.perf_counter()
            caption, ntok = srv.batcher.submit(img, temperature, top_p).result(
                timeout=srv.request_timeout_s
            )
            self._reply(200, {
                "caption": caption, "tokens": ntok,
                "latency_ms": round((time.perf_counter() - t0) * 1000, 1),
            })
        except QueueFull as e:
            # load shedding: the queue is max_queue deep — tell the client to
            # back off for roughly one device-batch time rather than queueing
            ms = srv.batcher.timer.summary().get("p50_ms", 100.0)
            self._reply(503, {"error": f"overloaded: {e}"},
                        extra_headers={"Retry-After": str(max(1, round(ms / 1000)))})
        except Exception as e:
            self._reply(500, {"error": f"{type(e).__name__}: {e}"})


def make_server(cfg: Config, host: str = "127.0.0.1", port: int = 8500,
                serve_batch: int | None = None, max_delay_ms: float = 10.0,
                pipeline: Pipeline | None = None, decode: str = "beam",
                sample_seed: int = 0, max_queue: int | None = None,
                request_timeout_s: float = 600.0) -> CaptionServer:
    """Build (but don't run) the server; tests use port=0 + serve_forever in a
    thread. ``pipeline=None`` loads tokenizer + latest checkpoint per Config.
    ``decode="sample"`` serves stochastic captions (per-request ?temperature=
    &top_p= query params ride the one compiled program as per-row inputs)."""
    if decode not in ("beam", "sample"):
        raise ValueError(f"decode must be 'beam' or 'sample', got {decode!r}")
    if decode == "sample" and pipeline is not None and not getattr(
        pipeline, "supports_sampling", hasattr(pipeline, "sample_batch")
    ):
        raise ValueError("--decode=sample needs a live Pipeline or an artifact "
                         "exported with `export.py --sample` (this artifact "
                         "carries only the beam-search program)")
    if pipeline is None:
        max_seq_len = load_max_seq_len(cfg.additional_filename)
        pipeline = Pipeline(
            cfg.tokenizer_filename, cfg.transformer_checkpoint_path,
            max_seq_len, cfg,
        )
    batch = serve_batch or max(cfg.decode_batch, 1)
    return CaptionServer((host, port), pipeline, cfg, batch, max_delay_ms,
                         request_timeout_s=request_timeout_s,
                         decode=decode, sample_seed=sample_seed,
                         max_queue=max_queue)


def main(argv: list[str]) -> None:
    host, port, serve_batch, max_delay_ms = "0.0.0.0", 8500, None, 10.0
    artifact, decode, sample_seed = None, "beam", 0
    max_queue = None
    # server-side cap on how long a request may wait for its batch result;
    # must cover a cold compile through the tunnel (846 s observed once)
    request_timeout_s = 1800.0
    passthrough = []
    for arg in argv:
        if arg.startswith("--max_queue="):
            max_queue = int(arg.split("=", 1)[1])
        elif arg.startswith("--request_timeout_s="):
            request_timeout_s = float(arg.split("=", 1)[1])
        elif arg.startswith("--port="):
            port = int(arg.split("=", 1)[1])
        elif arg.startswith("--host="):
            host = arg.split("=", 1)[1]
        elif arg.startswith("--serve_batch="):
            serve_batch = int(arg.split("=", 1)[1])
        elif arg.startswith("--max_delay_ms="):
            max_delay_ms = float(arg.split("=", 1)[1])
        elif arg.startswith("--artifact="):
            artifact = arg.split("=", 1)[1]
        elif arg.startswith("--decode="):
            decode = arg.split("=", 1)[1]
        elif arg.startswith("--sample_seed="):
            sample_seed = int(arg.split("=", 1)[1])
        else:
            passthrough.append(arg)
    cfg = Config.from_flags(passthrough)
    pipeline = None
    if artifact:
        # serve a compiled export.py artifact: no model construction, no
        # checkpoint machinery — the program, weights and tokenizer only
        from fpn_mt_image_captioning_tpu.export import load_serving

        pipeline = load_serving(artifact)
        cfg = pipeline.apply_to_config(cfg)
    server = make_server(cfg, host, port, serve_batch, max_delay_ms,
                         pipeline=pipeline, decode=decode,
                         sample_seed=sample_seed, max_queue=max_queue,
                         request_timeout_s=request_timeout_s)

    # warm-up: compile the fixed-shape encode + decode programs before
    # accepting traffic (a cold compile through the TPU tunnel takes minutes —
    # better spent before the first request than inside it)
    warm = np.zeros(
        (server.batcher.batch, cfg.image_input_size, cfg.image_input_size, 3),
        np.uint8 if server.input_uint8 else np.float32,
    )
    t0 = time.perf_counter()
    if decode == "sample":
        # compile BOTH sampling programs: top_p=None (temperature-only) and
        # the nucleus variant are distinct trace-time programs — without the
        # second call the first top_p<1 request would stall on a cold compile
        server.pipeline.sample_batch(warm)
        server.pipeline.sample_batch(
            warm, top_p=np.full(warm.shape[0], 0.9, np.float32)
        )
    else:
        server.pipeline.predict_batch(warm)
    print(f"warm-up compile done in {time.perf_counter() - t0:.1f}s")

    # graceful SIGTERM (the standard orchestrator stop signal): finish
    # in-flight batches, refuse new work, release the device
    import signal

    signal.signal(
        signal.SIGTERM,
        lambda *_: threading.Thread(target=server.shutdown, daemon=True).start(),
    )

    print(f"serving on http://{host}:{port}  "
          f"(batch={server.batcher.batch}, beam={cfg.beam_search_n}, "
          f"delay={max_delay_ms}ms)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.close()


if __name__ == "__main__":
    main(sys.argv[1:])
