"""Serving HTTP transport: endpoint handler, /metrics, graceful drain.

The thin HTTP layer over ecgmm_tpu/serve/pipeline.py's ServingPipeline —
request parsing/validation to HTTP codes, the Prometheus text exposition
endpoint, the landing page, and SIGTERM/SIGINT drain semantics (stop
accepting, finish in-flight requests, then exit — mirroring the train
engine's preemption save). Endpoint contract:
`Groove/components/SubmitButton.tsx:35-48` /
`Groove/app/(tabs)/ResultScreen.tsx:26-56`.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ecgmm_tpu.serve import digitize as digitize_mod
from ecgmm_tpu.serve.pipeline import ServingPipeline
from ecgmm_tpu.serve.wire import ENDPOINT, BadRequest, parse_multipart


# Upper bound on accepted request bodies (the app uploads one phone photo
# — a few MB; anything near this size is abuse or a client bug) so a bogus
# Content-Length can't make the server allocate unbounded memory.
MAX_REQUEST_BYTES = 32 * 1024 * 1024


def make_handler(pipeline: ServingPipeline):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            pass

        def _send_json(self, obj, code: int = 200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send_json({"status": "ok"})
                return
            if self.path == "/stats":
                self._send_json(pipeline.stats())
                return
            if self.path == "/metrics":
                body = pipeline.metrics().encode()
                self.send_response(200)
                self.send_header(
                    "Content-Type",
                    "text/plain; version=0.0.4; charset=utf-8",
                )
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if self.path not in ("/", "/index.html"):
                self.send_error(404)
                return
            from ecgmm_tpu.serve.client import PAGE

            body = PAGE.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if self.path != ENDPOINT:
                self.send_error(404)
                return
            try:
                try:
                    length = int(self.headers.get("Content-Length", 0))
                except (TypeError, ValueError):
                    raise BadRequest("invalid Content-Length header")
                if length <= 0:
                    raise BadRequest("empty request body")
                if length > MAX_REQUEST_BYTES:
                    pipeline.record_error()
                    self._send_json(
                        {"error": "request body exceeds "
                                  f"{MAX_REQUEST_BYTES} bytes"},
                        code=413,
                    )
                    return
                body = self.rfile.read(length)
                try:
                    fields = parse_multipart(
                        body, self.headers.get("Content-Type", "")
                    )
                except ValueError as e:
                    raise BadRequest(str(e))
                if "file" not in fields:
                    raise BadRequest("missing multipart field 'file'")
                from PIL import Image, ImageOps

                try:
                    # exif_transpose first: phone cameras store portrait/
                    # rotated shots as landscape pixels + an EXIF
                    # Orientation tag; without applying it the digitizer
                    # would see the strip sideways or upside-down
                    img = np.asarray(
                        ImageOps.exif_transpose(
                            Image.open(io.BytesIO(fields["file"]))
                        ).convert("RGB")
                    )
                except Exception:
                    raise BadRequest("'file' is not a decodable image")
                try:
                    questionnaire = json.loads(
                        fields.get("questionnaire", b"{}").decode()
                    )
                except (UnicodeDecodeError, json.JSONDecodeError):
                    raise BadRequest("questionnaire is not valid JSON")
                if not isinstance(questionnaire, dict):
                    raise BadRequest("questionnaire must be a JSON object")
                try:
                    fmt = fields.get("heatmap_format", b"png").decode()
                except UnicodeDecodeError:
                    raise BadRequest("heatmap_format is not valid UTF-8")
                if fmt not in ("png", "jpeg", "cam"):
                    # Reject rather than coerce: a typo like "jpg" silently
                    # falling back to the expensive PNG path would look
                    # like the opt-in works when it doesn't.
                    raise BadRequest(
                        f"unknown heatmap_format {fmt!r}; "
                        "expected png, jpeg or cam"
                    )
                try:
                    result = pipeline.predict(img, questionnaire,
                                              heatmap_format=fmt)
                except digitize_mod.NoTraceError as e:
                    # a decodable image with no ECG in it is a client
                    # problem, not a server fault
                    raise BadRequest(str(e))
                self._send_json(result)
            except BadRequest as e:
                pipeline.record_error()
                self._send_json({"error": str(e)}, code=400)
            except Exception as e:  # pragma: no cover - defensive
                pipeline.record_error()
                self._send_json({"error": str(e)}, code=500)

    return Handler


class GracefulHTTPServer(ThreadingHTTPServer):
    """ThreadingHTTPServer that DRAINS on close: handler threads are
    non-daemon and joined by server_close(), so a shutdown() lets every
    in-flight request finish and send its response before the process
    exits. ThreadingHTTPServer's default daemon threads would be killed
    mid-reply at interpreter teardown. A peer that never reads its
    response can stall the drain; SIGKILL stays the supervisor's
    escalation path, exactly as with the train engine's SIGTERM grace
    (train/engine.py)."""

    daemon_threads = False
    block_on_close = True


def install_graceful_shutdown(httpd, pipeline: ServingPipeline):
    """SIGTERM/SIGINT → stop accepting, let in-flight requests complete,
    then return from serve_forever. Mirrors the train engine's
    preemption handling (orbax save on SIGTERM); for serving the state
    to protect is the in-flight responses. Main-thread only (CPython
    signal.signal restriction); returns the handler so tests can invoke
    the drain without a real signal."""
    import signal as _signal

    def _drain(signum=None, frame=None):
        # shutdown() blocks until the accept loop exits — call it from a
        # helper thread: blocking inside the signal handler would
        # deadlock the loop we are waiting on
        threading.Thread(target=httpd.shutdown, daemon=True).start()

    _signal.signal(_signal.SIGTERM, _drain)
    _signal.signal(_signal.SIGINT, _drain)
    return _drain


def install_max_requests_recycle(httpd, pipeline: ServingPipeline,
                                 max_requests: int) -> None:
    """Graceful worker recycling: once `max_requests` predictions have
    been served, stop accepting, drain in-flight requests, and let the
    process exit 0 so a supervisor (systemd/k8s) restarts it — the
    standard gunicorn `max_requests` pattern.

    Why it exists here: the round-5 sustained soak (8,781 requests /
    10 min / 0 errors) found the serving process's host RSS growing
    ~338 KB per request while device buffers stayed flat, and isolation
    runs attributed it 1:1 to bytes UPLOADED through the experimental
    axon relay backend (100 × 1 MB uploads → +100 MB RSS, gc-immune;
    the identical request loop on the CPU backend is flat — BASELINE
    "Serving soak"). The leak is in the backend plugin, not this
    server; recycling bounds its damage in production until the plugin
    is fixed."""
    checked = threading.Event()

    def maybe_recycle():
        if checked.is_set():
            return
        if pipeline.stats()["requests"] >= max_requests:
            checked.set()
            print(f"[serve] {max_requests} requests served — graceful "
                  "recycle (drain + exit; supervisor restarts)",
                  flush=True)
            threading.Thread(target=httpd.shutdown, daemon=True).start()

    pipeline.on_request_done = maybe_recycle


def serve(pipeline: ServingPipeline, port: int = 8080,
          background: bool = False,
          graceful: bool = False,
          max_requests: int = 0) -> ThreadingHTTPServer:
    httpd = GracefulHTTPServer(("0.0.0.0", port), make_handler(pipeline))
    if max_requests > 0:
        install_max_requests_recycle(httpd, pipeline, max_requests)
    if background:
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        return httpd
    if graceful:
        install_graceful_shutdown(httpd, pipeline)
    httpd.serve_forever()
    httpd.server_close()  # joins in-flight handler threads (drain)
    pipeline.close_batching()  # after the join: no submitter can race it
    return httpd


def main(argv=None):
    import argparse

    from ecgmm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    p = argparse.ArgumentParser()
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--synthetic", action="store_true",
                   help="demo pipeline (shipped PTB-XL encoder, random heads)")
    p.add_argument("--bundle", default=None,
                   help="serve an AOT deployment bundle (serve/export.py) "
                        "instead of building the pipeline from model code")
    p.add_argument("--no-warmup", action="store_true")
    p.add_argument("--batch-window-ms", type=float, default=0.0,
                   help="coalesce concurrent requests for this many ms "
                        "into one bucketed device dispatch (0 = off)")
    p.add_argument("--max-batch", type=int, default=8,
                   help="largest batch bucket to serve; rounded DOWN to "
                        "the nearest available bucket (powers of two for "
                        "live pipelines, the exported set for bundles)")
    p.add_argument("--max-requests", type=int, default=0,
                   help="gracefully drain and exit 0 after serving this "
                        "many predictions (worker recycling; 0 = never). "
                        "Bounds the axon relay client's measured "
                        "~340 KB/request host-RSS growth in production — "
                        "see BASELINE 'Serving soak'")
    p.add_argument("--n-data", type=int, default=1,
                   help="shard each batched dispatch's batch axis over "
                        "the first N visible devices (data-parallel "
                        "serving; needs --batch-window-ms > 0 and a live "
                        "model, not a --bundle)")
    args = p.parse_args(argv)
    from ecgmm_tpu.utils.cache import with_cache_recovery

    # flag-combination errors must fire BEFORE the pipeline builds:
    # demo() trains a model and from_exported() compiles — 30–250 s on
    # the relayed TPU — and an invalid invocation should fail instantly
    if args.n_data > 1 and args.batch_window_ms <= 0:
        p.error("--n-data > 1 needs --batch-window-ms > 0 (mesh serving "
                "shards the BATCHED dispatches)")
    if args.n_data > 1 and args.bundle:
        p.error("--n-data > 1 needs a live model — an AOT bundle is a "
                "fixed single-device program")
    pipeline = (
        ServingPipeline.from_exported(args.bundle)
        if args.bundle else ServingPipeline.demo()
    )
    if args.batch_window_ms > 0:
        if args.bundle and pipeline._exported_buckets is None:
            p.error(
                "bundle was exported without batch_buckets; re-export "
                "with --batch-buckets to serve batched"
            )
        if args.n_data > 1:
            available = tuple(args.n_data * b for b in (1, 2, 4, 8, 16))
        else:
            available = pipeline._exported_buckets or (1, 2, 4, 8, 16)
        buckets = tuple(b for b in available if b <= args.max_batch)
        if not buckets:
            p.error(
                f"--max-batch {args.max_batch} admits none of the "
                f"available batch buckets {available}"
            )
        pipeline.enable_batching(
            args.batch_window_ms, max_batch=max(buckets), buckets=buckets,
            n_data=args.n_data,
        )
    if not args.no_warmup:
        print("warming up (compiling the request path)…")
        with_cache_recovery(pipeline.warmup)
        with_cache_recovery(pipeline.warmup_batched)
    print(f"serving on :{args.port}{ENDPOINT}")
    serve(pipeline, args.port, graceful=True,
          max_requests=args.max_requests)
    print("drained in-flight requests; bye")


if __name__ == "__main__":
    main()
