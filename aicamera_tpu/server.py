"""HTTP serving front-end for the tracking service (deployment surface).

A stdlib ``ThreadingHTTPServer`` over :class:`~aicamera_tpu.serving.
TrackingService`: clients POST encoded frames and receive per-frame track
JSON. One device-owning worker batches concurrent requests into fused
chunks (serving.py); the HTTP layer is just transport. No analog exists in
the reference (single-process CLI only, ``src/aicamera_tracker.py``).

Endpoints:
    GET  /v1/healthz   -> {"status": "ok", "backend": ..., "device": ...}
    GET  /v1/stats     -> {"frames": N, "wall_s": S, "fps": F}
    POST /v1/track     -> body: JPEG/PNG bytes (Content-Type image/*) or a
                          raw (H, W, 3) uint8 buffer with headers
                          X-Frame-Height/X-Frame-Width. Response:
                          {"frame_index": i, "tracks": [
                              [x1, y1, x2, y2, track_id, class_name, conf],
                              ...]}
    POST /v1/reset     -> fresh tracker state (ids restart at 1)

Frames on one connection form one stream; tracking state is shared across
all clients (single-tenant). For many independent tenant streams use
:class:`~aicamera_tpu.serving.MultiTenantTrackingService` in-process.

Usage:
    python -m aicamera_tpu.server --port 8321 [--device cpu] [--chunk 8]
"""

from __future__ import annotations

import argparse
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class TrackingHTTPServer:
    """Owns a TrackingService and a ThreadingHTTPServer around it."""

    def __init__(self, host: str = "127.0.0.1", port: int = 8321,
                 service=None, **service_kwargs):
        if service is None:
            from .serving import TrackingService
            service = TrackingService(**service_kwargs)
        self.service = service
        self._frames = 0
        self._t0 = time.perf_counter()
        self._lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            # quiet request logging (stdout noise at 1000s of fps)
            def log_message(self, *args):
                pass

            def _json(self, code: int, obj):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/v1/healthz":
                    import jax
                    dev = jax.devices()[0]
                    self._json(200, {"status": "ok",
                                     "backend": jax.default_backend(),
                                     "device": str(dev)})
                elif self.path == "/v1/stats":
                    with outer._lock:
                        n = outer._frames
                        dt = time.perf_counter() - outer._t0
                    self._json(200, {"frames": n, "wall_s": round(dt, 3),
                                     "fps": round(n / dt, 2) if dt else 0.0})
                else:
                    self._json(404, {"error": f"unknown path {self.path}"})

            def do_POST(self):
                if self.path == "/v1/reset":
                    outer.service.pipeline.reset()
                    with outer._lock:
                        outer._frames = 0
                        outer._t0 = time.perf_counter()
                    self._json(200, {"status": "reset"})
                    return
                if self.path != "/v1/track":
                    self._json(404, {"error": f"unknown path {self.path}"})
                    return
                length = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(length)
                frame = outer._decode_frame(raw, self.headers)
                if frame is None:
                    self._json(400, {"error": "could not decode frame; send "
                                     "JPEG/PNG bytes or raw uint8 with "
                                     "X-Frame-Height/X-Frame-Width"})
                    return
                try:
                    result = outer.service.submit(frame).result(timeout=30.0)
                except Exception as e:
                    self._json(503, {"error": str(e)})
                    return
                with outer._lock:
                    outer._frames += 1
                self._json(200, {
                    "frame_index": result.frame_index,
                    "tracks": [[int(x1), int(y1), int(x2), int(y2),
                                int(tid), cls, round(float(conf), 4)]
                               for (x1, y1, x2, y2, tid, cls, conf)
                               in result.tracks],
                })

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self.httpd.server_address[:2]
        self._thread = threading.Thread(target=self.httpd.serve_forever,
                                        daemon=True)

    @staticmethod
    def _decode_frame(raw: bytes, headers) -> np.ndarray | None:
        h = headers.get("X-Frame-Height")
        w = headers.get("X-Frame-Width")
        if h and w:  # raw uint8 BGR buffer
            h, w = int(h), int(w)
            if len(raw) != h * w * 3:
                return None
            return np.frombuffer(raw, np.uint8).reshape(h, w, 3)
        try:
            import cv2
            frame = cv2.imdecode(np.frombuffer(raw, np.uint8),
                                 cv2.IMREAD_COLOR)
            return frame  # None on decode failure
        except Exception:
            return None

    def start(self):
        self._thread.start()
        return self

    def shutdown(self):
        """Stop accepting requests, drain the device worker. Idempotent."""
        self.httpd.shutdown()
        self.httpd.server_close()
        self.service.shutdown()


def main(argv=None):
    ap = argparse.ArgumentParser(description="AICamera-TPU tracking server")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8321)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--max_latency_ms", type=float, default=30.0)
    ap.add_argument("--device", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--tracker", default="deepsort",
                    choices=("deepsort", "bytetrack", "ocsort"),
                    help="tracker core behind the service")
    args = ap.parse_args(argv)

    if args.device == "cpu":
        import jax
        # env var alone is overridden by the axon TPU plugin (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")

    server = TrackingHTTPServer(host=args.host, port=args.port,
                                chunk_size=args.chunk,
                                max_latency_ms=args.max_latency_ms,
                                tracker=args.tracker)
    print(f"AICamera-TPU tracking server on http://{server.host}:"
          f"{server.port} (chunk={args.chunk}, "
          f"latency window={args.max_latency_ms}ms)")
    server.start()
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        print("shutting down...")
        server.shutdown()


if __name__ == "__main__":
    main()
