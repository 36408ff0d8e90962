"""Micro-batching serving loop + HTTP front-end.

The reference ships no serving path at all (its only entry point is the
training demo, reference demo.py:202); `inference.Separator` gives this
framework the jitted, shape-bucketed forward.  This module adds the piece
a production deployment puts in front of it: a REQUEST SCHEDULER that
coalesces concurrent single-utterance requests into device-efficient
batches, plus a dependency-free HTTP server speaking npz.

Design (TPU-shaped):
  - One dispatch thread owns the device.  Requests enqueue (arrays +
    Future); the scheduler drains the queue, groups by feature shape
    (F, T, N, H, W — different shapes cannot share a program), stacks up
    to ``max_batch`` requests, and runs ONE bucketed forward.  Under load
    the loop naturally runs back-to-back full batches (continuous
    batching); when idle it dispatches the lone request after at most
    ``max_delay_ms`` — the knob trades tail latency for MXU utilization.
  - Responses fan back out through per-request futures; a request that
    fails (bad shapes) resolves its own future with the error instead of
    poisoning the batch.
  - `ServerStats` counts requests/batches/mean-occupancy so the
    batching win is observable (tests assert coalescing actually
    happened).

HTTP front-end (stdlib only, zero new dependencies): POST /separate with
an .npz body holding `mixed_spec` (F, T) and `lip_frames` (N, H, W) —
single utterance per request, batching happens server-side across
clients.  Response is an .npz with `separated` (S, F, T) and `masks`.
GET /stats returns the counters as JSON.  `avsep serve` (cli.py) wires a
checkpoint to this server.
"""

from __future__ import annotations

import io
import json
import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from av_separation_tpu.inference import Separator


@dataclass
class ServerStats:
    requests: int = 0
    batches: int = 0
    errors: int = 0
    max_batch_seen: int = 0
    total_batched: int = 0
    latency_ms: List[float] = field(default_factory=list)

    def snapshot(self) -> Dict[str, Any]:
        lat = sorted(self.latency_ms[-1000:])
        pct = (lambda p: round(lat[min(len(lat) - 1,
                                       int(p * len(lat)))], 2)) \
            if lat else (lambda p: None)
        return {
            "requests": self.requests,
            "batches": self.batches,
            "errors": self.errors,
            "mean_batch": round(self.total_batched
                                / max(1, self.batches), 2),
            "max_batch": self.max_batch_seen,
            "latency_ms_p50": pct(0.50),
            "latency_ms_p95": pct(0.95),
        }


class _Request:
    __slots__ = ("mixed_spec", "lip_frames", "future", "t0")

    def __init__(self, mixed_spec, lip_frames):
        self.mixed_spec = mixed_spec
        self.lip_frames = lip_frames
        self.future: "queue.Queue[Tuple[str, Any]]" = queue.Queue(1)
        self.t0 = time.perf_counter()

    def resolve(self, ok: bool, payload):
        self.future.put(("ok" if ok else "err", payload))

    def result(self, timeout: Optional[float] = None):
        kind, payload = self.future.get(timeout=timeout)
        if kind == "err":
            raise payload
        return payload


class BatchingSeparatorServer:
    """Coalesces concurrent separate() requests into batched forwards.

    Parameters
    ----------
    separator : the jitted `inference.Separator` to dispatch on.
    max_batch : largest batch one dispatch may carry (bounded by HBM).
    max_delay_ms : how long a lone request may wait for companions.
    """

    def __init__(self, separator: Separator, max_batch: int = 32,
                 max_delay_ms: float = 5.0):
        self.separator = separator
        self.max_batch = int(max_batch)
        self.max_delay = max_delay_ms / 1e3
        self.stats = ServerStats()
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="avsep-batcher")
        self._thread.start()

    # -- client side -------------------------------------------------
    def submit(self, mixed_spec: np.ndarray, lip_frames: np.ndarray
               ) -> _Request:
        """Enqueue one utterance ((F, T), (N, H, W)); returns a handle
        whose .result() blocks for (separated (S, F, T), masks)."""
        req = _Request(np.asarray(mixed_spec), np.asarray(lip_frames))
        self._queue.put(req)
        return req

    def separate(self, mixed_spec: np.ndarray, lip_frames: np.ndarray,
                 timeout: Optional[float] = 60.0):
        return self.submit(mixed_spec, lip_frames).result(timeout=timeout)

    def close(self):
        self._stop.set()
        self._thread.join(timeout=5.0)

    # -- scheduler side ----------------------------------------------
    def _take_batch(self) -> List[_Request]:
        """Drain up to max_batch same-shape requests; a lone request waits
        at most max_delay for companions."""
        try:
            first = self._queue.get(timeout=0.05)
        except queue.Empty:
            return []
        reqs = [first]
        sig = (first.mixed_spec.shape, first.lip_frames.shape)
        deadline = time.perf_counter() + self.max_delay
        leftovers: List[_Request] = []
        while len(reqs) < self.max_batch:
            remain = deadline - time.perf_counter()
            if remain <= 0:
                break
            try:
                nxt = self._queue.get(timeout=remain)
            except queue.Empty:
                break
            if (nxt.mixed_spec.shape, nxt.lip_frames.shape) == sig:
                reqs.append(nxt)
            else:
                leftovers.append(nxt)
        for r in leftovers:  # different shape: requeue for the next batch
            self._queue.put(r)
        return reqs

    def _loop(self):
        while not self._stop.is_set():
            reqs = self._take_batch()
            if not reqs:
                continue
            try:
                mixed = np.stack([r.mixed_spec for r in reqs])
                lips = np.stack([r.lip_frames for r in reqs])
                separated, masks = self.separator.separate(mixed, lips)
            except Exception as e:  # noqa: BLE001 — resolve, don't die
                self.stats.errors += len(reqs)
                for r in reqs:
                    r.resolve(False, e)
                continue
            now = time.perf_counter()
            self.stats.batches += 1
            self.stats.requests += len(reqs)
            self.stats.total_batched += len(reqs)
            self.stats.max_batch_seen = max(self.stats.max_batch_seen,
                                            len(reqs))
            for i, r in enumerate(reqs):
                self.stats.latency_ms.append((now - r.t0) * 1e3)
                r.resolve(True, (separated[i], masks[i]))


# ---------------------------------------------------------------------------
# stdlib HTTP front-end
# ---------------------------------------------------------------------------

def make_http_server(server: BatchingSeparatorServer, host: str = "0.0.0.0",
                     port: int = 8571):
    """ThreadingHTTPServer speaking npz: POST /separate, GET /stats.

    Each handler thread blocks on its request's future while the batcher
    thread coalesces across connections — concurrency IS the batch
    source."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet; stats carry observability
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path != "/stats":
                self._send(404, b"{}", "application/json")
                return
            body = json.dumps(server.stats.snapshot()).encode()
            self._send(200, body, "application/json")

        def do_POST(self):
            if self.path != "/separate":
                self._send(404, b"{}", "application/json")
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                with np.load(io.BytesIO(self.rfile.read(n))) as z:
                    mixed = z["mixed_spec"]
                    lips = z["lip_frames"]
                separated, masks = server.separate(mixed, lips)
                buf = io.BytesIO()
                np.savez(buf, separated=separated, masks=masks)
                self._send(200, buf.getvalue(), "application/npz")
            except Exception as e:  # noqa: BLE001 — HTTP error, keep serving
                body = json.dumps({"error": str(e)}).encode()
                self._send(400, body, "application/json")

    return ThreadingHTTPServer((host, port), Handler)


def serve_forever(separator: Separator, host: str = "0.0.0.0",
                  port: int = 8571, max_batch: int = 32,
                  max_delay_ms: float = 5.0):
    """Blocking entry used by `avsep serve`."""
    batcher = BatchingSeparatorServer(separator, max_batch=max_batch,
                                      max_delay_ms=max_delay_ms)
    httpd = make_http_server(batcher, host, port)
    print(f"avsep serving on {host}:{port} "
          f"(max_batch={max_batch}, max_delay_ms={max_delay_ms})",
          flush=True)
    try:
        httpd.serve_forever()
    finally:
        batcher.close()
