"""HTTP serving front-end over :class:`ocrfa_tpu.serving.ServingPipeline`.

A production-style streaming server for the device-resident page path
(stdlib-only, no framework dependency):

* ``POST /ocr`` — request body is an image (PNG/JPEG via PIL, or raw
  greyscale uint8 with ``X-Height``/``X-Width`` headers).  Responds JSON
  ``{"results": [{"box": [[x, y] x4], "text": str, "confidence": float}]}``.
* ``GET /healthz`` — liveness + queue depth.
* ``GET /metrics`` — Prometheus text exposition: page/batch/error counters
  and queue-to-result latency quantiles over the last 1024 pages.

Requests from concurrent connections are funneled through a single
dispatcher thread that keeps ``depth`` pages in flight on the device
(detection for page k+1 overlaps recognition collection for page k), the
same pipelining discipline as ``ServingPipeline.process``.  The reference
has no serving layer (library only, ocr.py); this is new TPU-side surface.
"""

from __future__ import annotations

import collections
import io
import json
import math
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class _Job:
    __slots__ = ("page", "event", "result", "error", "t_submit")

    def __init__(self, page):
        self.page = page
        self.event = threading.Event()
        self.result = None
        self.error = None
        self.t_submit = time.perf_counter()


class PipelineDispatcher:
    """Single consumer thread: page queue -> ServingPipeline, depth-pipelined.

    Queued pages of the same shape are opportunistically grouped into one
    ``submit_page_batch`` dispatch (dynamic batching): a batched detector
    forward is ~30% cheaper per page than singles at v5e page shapes and
    dodges the per-dispatch RTT floor.  Batching is natural — whatever has
    accumulated while the device was busy goes out together; an idle
    server still dispatches single pages immediately (no added latency).
    """

    def __init__(self, pipeline, depth: int = 2, max_queue: int = 64,
                 max_batch: int = 16):
        self.pipeline = pipeline
        self.depth = depth
        self.max_batch = max_batch
        self.jobs: queue.Queue = queue.Queue(maxsize=max_queue)
        self.stats = {"pages": 0, "batches": 0, "batched_pages": 0,
                      "errors": 0}
        # queue-to-result wall time of the last 1024 pages, for the
        # /metrics latency quantiles (bounded: old samples age out).
        # Appends happen on the dispatcher thread while /metrics snapshots
        # on handler threads — CPython raises "deque mutated during
        # iteration" without the lock.
        self._latencies: collections.deque = collections.deque(maxlen=1024)
        self._lat_lock = threading.Lock()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def submit(self, page: np.ndarray, timeout: float | None = 300.0):
        # generous default: the first page of a new canvas shape pays a
        # 20-60s XLA compile on TPU; steady-state latency is ~ms
        job = _Job(page)
        self.jobs.put(job, timeout=1.0)
        if not job.event.wait(timeout):
            raise TimeoutError("OCR request timed out")
        if job.error is not None:
            raise job.error
        return job.result

    def qsize(self) -> int:
        return self.jobs.qsize()

    def _finish(self, job, result=None, error=None):
        job.result = result
        job.error = error
        if error is not None:
            self.stats["errors"] += 1
        else:
            with self._lat_lock:
                self._latencies.append(time.perf_counter() - job.t_submit)
        job.event.set()

    def metrics(self) -> dict:
        """Snapshot counters + latency quantiles for the /metrics endpoint."""
        with self._lat_lock:
            lat = sorted(self._latencies)

        def q(p):
            # nearest-rank: ceil(p*n)-1 (int(p*n) returns the max sample
            # for p95/p99 at small n)
            if not lat:
                return 0.0
            rank = math.ceil(p * len(lat)) - 1
            return lat[min(len(lat) - 1, max(0, rank))]

        return {**self.stats, "queued": self.qsize(),
                "latency_samples": len(lat),
                "latency_p50_s": q(0.50), "latency_p95_s": q(0.95),
                "latency_p99_s": q(0.99)}

    def close(self):
        self._stop.set()
        self._thread.join(timeout=5.0)

    def _drain(self):
        """Blocking-get one job, then greedily take whatever else is queued
        (up to ``max_batch``) — the natural-batching window."""
        try:
            jobs = [self.jobs.get(timeout=0.05)]
        except queue.Empty:
            return []
        while len(jobs) < self.max_batch:
            try:
                jobs.append(self.jobs.get_nowait())
            except queue.Empty:
                break
        return jobs

    def _dispatch(self, jobs):
        """Submit jobs, grouping same-shape runs into batch dispatches."""
        out = []
        i = 0
        while i < len(jobs):
            group = [jobs[i]]
            shape = getattr(jobs[i].page, "shape", None)
            while (len(jobs) > i + len(group)
                   and getattr(jobs[i + len(group)].page, "shape", ()) == shape):
                group.append(jobs[i + len(group)])
            i += len(group)
            batchable = hasattr(self.pipeline, "submit_page_batch")
            if len(group) == 1 or not batchable:
                # per-job submits fail individually — one bad page must
                # not error jobs whose dispatch already succeeded
                for j in group:
                    try:
                        out.append((j, self.pipeline.submit_page(j.page)))
                        self.stats["pages"] += 1
                    except Exception as exc:  # malformed page, OOM, ...
                        self._finish(j, error=exc)
            else:
                try:
                    handles = self.pipeline.submit_page_batch(
                        [j.page for j in group])
                    self.stats["batches"] += 1
                    self.stats["batched_pages"] += len(group)
                    self.stats["pages"] += len(group)
                    out.extend(zip(group, handles))
                except Exception as exc:  # whole batch dispatch failed
                    for j in group:
                        self._finish(j, error=exc)
        return out

    def _run(self):
        inflight: list[tuple[_Job, object]] = []
        while not self._stop.is_set():
            jobs = self._drain()
            inflight.extend(self._dispatch(jobs))
            while inflight and (len(inflight) >= self.depth
                                or (not jobs and self.jobs.empty())):
                j, handle = inflight.pop(0)
                try:
                    self._finish(j, result=self.pipeline.finish_page(handle))
                except Exception as exc:
                    self._finish(j, error=exc)
        for j, handle in inflight:
            try:
                self._finish(j, result=self.pipeline.finish_page(handle))
            except Exception as exc:
                self._finish(j, error=exc)


def _decode_body(handler) -> np.ndarray:
    length = int(handler.headers.get("Content-Length", 0))
    body = handler.rfile.read(length)
    if bool(handler.headers.get("X-Height")) != bool(handler.headers.get("X-Width")):
        raise ValueError("set both X-Height and X-Width for raw greyscale "
                         "bodies (or neither for an encoded image)")
    if handler.headers.get("X-Height") and handler.headers.get("X-Width"):
        h = int(handler.headers["X-Height"])
        w = int(handler.headers["X-Width"])
        if h * w != len(body):
            raise ValueError(f"raw body is {len(body)} bytes, expected {h * w}")
        return np.frombuffer(body, dtype=np.uint8).reshape(h, w)
    from PIL import Image

    img = Image.open(io.BytesIO(body)).convert("L")
    return np.asarray(img)


def make_handler(dispatcher: PipelineDispatcher, auth=None):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet by default
            pass

        def _authorize(self) -> bool:
            """Apply the AuthPolicy; /healthz stays open (liveness probes
            don't carry credentials)."""
            if auth is None:
                return True
            token = auth.bearer(self.headers.get("Authorization")
                                or self.headers.get("X-API-Key"))
            verdict = auth.check(token, caller=self.client_address[0])
            if verdict == "unauthenticated":
                self._reply(401, {"error": "invalid or missing API key"})
                return False
            if verdict == "rate_limited":
                self._reply(429, {"error": "rate limit exceeded"})
                return False
            return True

        def _reply(self, code: int, payload: dict):
            data = json.dumps(payload, ensure_ascii=False).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json; charset=utf-8")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"ok": True, "queued": dispatcher.qsize(),
                                  "stats": dict(dispatcher.stats)})
            elif self.path == "/metrics":
                # Prometheus text exposition (stays open like /healthz:
                # scrapers don't carry API keys)
                m = dispatcher.metrics()
                lines = []
                # counters carry the conventional _total suffix (promtool
                # lint + rate() recording-rule conventions)
                for key, kind in (("pages", "counter"),
                                  ("batches", "counter"),
                                  ("batched_pages", "counter"),
                                  ("errors", "counter"),
                                  ("queued", "gauge"),
                                  ("latency_samples", "gauge"),
                                  ("latency_p50_s", "gauge"),
                                  ("latency_p95_s", "gauge"),
                                  ("latency_p99_s", "gauge")):
                    name = f"ocrfa_{key}_total" if kind == "counter" else f"ocrfa_{key}"
                    lines.append(f"# TYPE {name} {kind}")
                    lines.append(f"{name} {m[key]}")
                data = ("\n".join(lines) + "\n").encode("utf-8")
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/plain; version=0.0.4; charset=utf-8")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
            else:
                self._reply(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/ocr":
                self._reply(404, {"error": "not found"})
                return
            if not self._authorize():
                return
            try:
                page = _decode_body(self)
            except Exception as exc:
                self._reply(400, {"error": str(exc)})
                return
            try:
                results = dispatcher.submit(page)
            except TimeoutError as exc:
                self._reply(503, {"error": str(exc)})
                return
            except queue.Full:
                self._reply(503, {"error": "server overloaded (queue full)"})
                return
            except Exception as exc:
                self._reply(400, {"error": str(exc)})
                return
            self._reply(200, {"results": [
                {"box": [[int(x), int(y)] for x, y in box],
                 "text": text, "confidence": float(conf)}
                for box, text, conf in results
            ]})

    return Handler


class OCRServer:
    """Threaded HTTP server wrapper; use as a context manager or call
    ``serve_forever``/``shutdown`` explicitly."""

    def __init__(self, pipeline, host: str = "127.0.0.1", port: int = 0,
                 depth: int = 2, auth=None):
        """``auth``: optional :class:`ocrfa_tpu.utils.ratelimit.AuthPolicy`
        (API keys + per-caller rate limit) applied to ``POST /ocr``."""
        self.dispatcher = PipelineDispatcher(pipeline, depth=depth)
        self.httpd = ThreadingHTTPServer(
            (host, port), make_handler(self.dispatcher, auth=auth))
        self.port = self.httpd.server_address[1]
        self._thread: threading.Thread | None = None

    def start(self):
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.shutdown()

    def serve_forever(self):
        self.httpd.serve_forever()

    def shutdown(self):
        self.httpd.shutdown()
        self.httpd.server_close()
        self.dispatcher.close()
        if self._thread is not None:
            self._thread.join(timeout=5.0)


def build_pipeline_from_args(args):
    """Shared by the HTTP and gRPC entry points: a ``ServingPipeline`` from
    CLI flags.  Trained weights come from the pickle blobs the training
    scripts emit (``--recognizer-pickle``/``--detector-pickle``); without
    them the models are random-init (zoo downloads need egress)."""
    import jax

    from ocrfa_tpu.checkpoints import load_detector_blob, load_recognizer_blob
    from ocrfa_tpu.decode import CTCLabelConverter
    from ocrfa_tpu.models.craft import init_craft
    from ocrfa_tpu.models.crnn import init_crnn_gen1
    from ocrfa_tpu.pipeline import Recognizer
    from ocrfa_tpu.registry import RECOGNITION_MODELS
    from ocrfa_tpu.serving import ServingPipeline

    chars = RECOGNITION_MODELS["gen1"]["arabic_g1"]["characters"]
    rec_params, rec_meta = None, {}
    if getattr(args, "recognizer_pickle", None):
        rec_params, chars, rec_meta = load_recognizer_blob(
            args.recognizer_pickle, default_charset=chars)
    if rec_meta.get("family") == "trocr":
        # ServingPipeline's ribbon/page fusion is CRNN-specific; route
        # transformer blobs through the CLI read path instead
        raise SystemExit(
            "trocr recognizer blobs are not servable through the ribbon "
            "pipeline; use `ocrfa-tpu read --recognizer-pickle ...`")
    conv = CTCLabelConverter(chars)
    if rec_params is None:
        rec_params = init_crnn_gen1(jax.random.PRNGKey(0),
                                    num_class=conv.num_classes)
    rec_variant = rec_meta.get("variant", "gen1")
    quantize = getattr(args, "quantize", "none") or "none"
    if quantize == "static":
        # the serving fast path (bench.py numerics): activation scales from,
        # in preference order, a previously persisted amax tree (blob
        # meta["act_amax"]), the blob's own training-time calibration
        # batches, or synthetic charset renders as a last resort
        amax = rec_meta.get("act_amax")
        batches = None
        if amax is None and getattr(args, "recognizer_pickle", None):
            from ocrfa_tpu.checkpoints import load_recognizer_calibration

            batches = load_recognizer_calibration(args.recognizer_pickle)
        if amax is None and not batches:
            from ocrfa_tpu.data import SyntheticFarsiLines

            if getattr(args, "recognizer_pickle", None):
                # synthetic glyph renders differ substantially from the
                # realfont distribution a trained blob saw, so amax scales
                # calibrated on them can clip/underscale silently — the
                # int8 path may NOT match the trained model's accuracy
                import logging

                logging.getLogger("ocrfa_tpu.server").warning(
                    "quantize=static: blob %s has no calibration batches "
                    "or meta['act_amax']; falling back to SYNTHETIC render "
                    "calibration. int8 activation scales may not match the "
                    "trained distribution — re-save the blob with "
                    "calibration data (eval_farsi --save-params) for "
                    "production use.", args.recognizer_pickle)
            ds = SyntheticFarsiLines(chars, batch_size=64, width=256)
            batches = [ds.batch()[0] for _ in range(2)]
        recognizer = Recognizer(rec_params, conv, variant=rec_variant,
                                quantized="static", act_amax=amax,
                                calibration_batches=batches)
    elif quantize == "dynamic":
        recognizer = Recognizer(rec_params, conv, variant=rec_variant,
                                quantized="dynamic")
    else:
        recognizer = Recognizer(rec_params, conv, variant=rec_variant)

    det_params, det_kind = None, "craft"
    if getattr(args, "detector_pickle", None):
        det_kind, det_params, _meta = load_detector_blob(args.detector_pickle)
    if det_params is None:
        det_params = init_craft(jax.random.PRNGKey(1))
    return ServingPipeline(
        det_params, recognizer, canvas_size=args.canvas_size,
        detector_family="dbnet" if det_kind == "dbnet18" else "craft")


def add_serving_args(ap, port):
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=port)
    ap.add_argument("--canvas-size", type=int, default=1280)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--recognizer-pickle", default=None,
                    help="trained blob from scripts/eval_farsi.py --save-params")
    ap.add_argument("--detector-pickle", default=None,
                    help="trained blob from scripts/eval_selftrained.py --save-craft")
    ap.add_argument("--quantize", choices=("none", "dynamic", "static"),
                    default="none",
                    help="recognizer tower numerics: 'static' is the "
                         "calibrated int8 serving fast path (~2x f32; "
                         "scales from the blob's calibration batches), "
                         "'none' the f32 parity path")
    ap.add_argument("--api-keys", default=None,
                    help="comma-separated accepted bearer keys (enables auth)")
    ap.add_argument("--rate", type=float, default=None,
                    help="per-caller requests/sec token-bucket limit")


def auth_from_args(args):
    if args.api_keys is None and args.rate is None:
        return None
    from ocrfa_tpu.utils.ratelimit import AuthPolicy

    keys = args.api_keys.split(",") if args.api_keys else None
    return AuthPolicy(api_keys=keys, rate=args.rate)


def main(argv=None):  # pragma: no cover - manual entry point
    import argparse

    ap = argparse.ArgumentParser(prog="ocrfa-tpu serve")
    add_serving_args(ap, port=8080)
    args = ap.parse_args(argv)

    pipeline = build_pipeline_from_args(args)
    server = OCRServer(pipeline, host=args.host, port=args.port,
                       depth=args.depth, auth=auth_from_args(args))
    print(f"serving on http://{args.host}:{server.port}")
    server.serve_forever()


if __name__ == "__main__":  # pragma: no cover
    main()
