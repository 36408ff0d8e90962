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
POST /separate_waveform takes `mixed_audio` (N_audio,) + `lip_frames`
and returns per-speaker `waveforms` (S, N_audio) — the raw-audio path
(on-device STFT -> model -> iSTFT) batched by the same scheduler.
GET /stats returns the counters as JSON; GET /healthz is an ungated
liveness probe.  Hardening: optional bearer-token auth, a request-size
ceiling enforced before the body is read, optional TLS, and multi-shape
warmup so the first request never pays XLA compilation.  `avsep serve`
(cli.py) wires a checkpoint to this server.
"""

from __future__ import annotations

import io
import json
import queue
import threading
import time
from collections import deque
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from av_separation_tpu.inference import Separator


@dataclass
class ServerStats:
    requests: int = 0
    batches: int = 0
    errors: int = 0
    shed: int = 0
    max_batch_seen: int = 0
    total_batched: int = 0
    # Bounded: a long-running server must not grow host memory with its
    # request count; percentiles are over the most recent window anyway.
    latency_ms: "deque[float]" = field(
        default_factory=lambda: deque(maxlen=4096))

    def snapshot(self) -> Dict[str, Any]:
        lat = sorted(list(self.latency_ms)[-1000:])
        pct = (lambda p: round(lat[min(len(lat) - 1,
                                       int(p * len(lat)))], 2)) \
            if lat else (lambda p: None)
        return {
            "requests": self.requests,
            "batches": self.batches,
            "errors": self.errors,
            "shed": self.shed,
            "mean_batch": round(self.total_batched
                                / max(1, self.batches), 2),
            "max_batch": self.max_batch_seen,
            "latency_ms_p50": pct(0.50),
            "latency_ms_p95": pct(0.95),
        }


class ServerOverloaded(RuntimeError):
    """Raised at submit when the pending queue is full (load shedding);
    the HTTP layer maps it to 503 so clients back off and retry."""


class _Request:
    __slots__ = ("kind", "mixed", "lip_frames", "future", "t0")

    def __init__(self, kind: str, mixed, lip_frames):
        self.kind = kind  # "spec" (magnitude in) | "wave" (raw audio in)
        self.mixed = mixed
        self.lip_frames = lip_frames
        self.future: "queue.Queue[Tuple[str, Any]]" = queue.Queue(1)
        self.t0 = time.perf_counter()

    @property
    def signature(self):
        return (self.kind, self.mixed.shape, self.lip_frames.shape)

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
                 max_delay_ms: float = 5.0, max_pending: int = 1024):
        self.separator = separator
        self.max_batch = int(max_batch)
        self.max_delay = max_delay_ms / 1e3
        self.stats = ServerStats()
        # Bounded queue = explicit load shedding: when the device cannot
        # keep up, enqueue raises (503 at the HTTP layer) instead of
        # buffering requests without limit and timing every client out.
        self._queue: "queue.Queue[_Request]" = queue.Queue(int(max_pending))
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="avsep-batcher")
        self._thread.start()

    # -- client side -------------------------------------------------
    def submit(self, mixed_spec: np.ndarray, lip_frames: np.ndarray
               ) -> _Request:
        """Enqueue one utterance ((F, T), (N, H, W)); returns a handle
        whose .result() blocks for (separated (S, F, T), masks)."""
        mixed_spec = np.asarray(mixed_spec, np.float32)
        lip_frames = np.asarray(lip_frames, np.float32)
        # Fail fast at the door: a rank error would otherwise ride into a
        # batch and resolve asynchronously (shape MISMATCHES at the right
        # rank are isolated by signature grouping, so they stay allowed).
        if mixed_spec.ndim != 2 or lip_frames.ndim != 3:
            raise ValueError(
                f"expected mixed_spec (F, T) and lip_frames (N, H, W); got "
                f"{mixed_spec.shape} and {lip_frames.shape}")
        return self._enqueue(_Request("spec", mixed_spec, lip_frames))

    def submit_waveform(self, mixed_audio: np.ndarray,
                        lip_frames: np.ndarray) -> _Request:
        """Enqueue one raw-audio utterance ((N_audio,), (N, H, W)); the
        batcher coalesces waveform requests exactly like spectrogram ones
        (grouped by signature, so the two APIs never share a dispatch).
        .result() blocks for (waveforms (S, N_audio), masks)."""
        if self.separator.data_cfg is None:
            raise ValueError("waveform serving requires the Separator to "
                             "carry data_cfg (STFT geometry)")
        mixed_audio = np.asarray(mixed_audio, np.float32)
        lip_frames = np.asarray(lip_frames, np.float32)
        if mixed_audio.ndim != 1 or lip_frames.ndim != 3:
            raise ValueError(
                f"expected mixed_audio (N_audio,) and lip_frames (N, H, W); "
                f"got {mixed_audio.shape} and {lip_frames.shape}")
        return self._enqueue(_Request("wave", mixed_audio, lip_frames))

    def _enqueue(self, req: _Request) -> _Request:
        try:
            self._queue.put_nowait(req)
        except queue.Full:
            self.stats.shed += 1
            raise ServerOverloaded(
                f"pending queue full ({self._queue.maxsize} requests); "
                f"retry later") from None
        return req

    def separate(self, mixed_spec: np.ndarray, lip_frames: np.ndarray,
                 timeout: Optional[float] = 60.0):
        return self.submit(mixed_spec, lip_frames).result(timeout=timeout)

    def separate_waveform(self, mixed_audio: np.ndarray,
                          lip_frames: np.ndarray,
                          timeout: Optional[float] = 60.0):
        return self.submit_waveform(mixed_audio,
                                    lip_frames).result(timeout=timeout)

    def warmup(self, batch_sizes: Tuple[int, ...] = (1,),
               wave: bool = False) -> int:
        """Pre-compile the serving executables for the deployment's native
        shapes so the first real request does not pay XLA compilation
        (~20-40 s cold).  Uses the Separator's configs to derive the
        feature shapes; each requested batch size warms its power-of-two
        bucket for the spectrogram API and, when ``wave`` is set, the
        waveform API too.  Returns the number of programs exercised."""
        sep, cfg, d = self.separator, self.separator.cfg, \
            self.separator.data_cfg
        if d is None:
            raise ValueError("warmup requires the Separator to carry "
                             "data_cfg (feature geometry)")
        n = 0
        lips = np.zeros((1, d.total_lip_frames, d.frame_h, d.frame_w),
                        np.float32)
        spec = np.zeros((1, cfg.freq_bins, d.num_stft_frames), np.float32)
        audio = np.zeros((1, d.num_samples_audio), np.float32)
        seen = set()
        for b in batch_sizes:
            bucket = sep._bucket(int(b))
            if bucket in seen:
                continue
            seen.add(bucket)
            reps = (bucket, 1, 1)
            sep.separate(np.tile(spec, reps), np.tile(lips, (bucket, 1, 1,
                                                             1)))
            n += 1
            if wave:
                sep.separate_waveform(np.tile(audio, (bucket, 1)),
                                      np.tile(lips, (bucket, 1, 1, 1)))
                n += 1
        return n

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
        sig = first.signature
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
            if nxt.signature == sig:
                reqs.append(nxt)
            else:
                leftovers.append(nxt)
        for r in leftovers:  # different shape: requeue for the next batch
            try:
                self._queue.put_nowait(r)
            except queue.Full:  # shed rather than deadlock the scheduler
                self.stats.shed += 1
                r.resolve(False, ServerOverloaded(
                    "pending queue full while regrouping; retry later"))
        return reqs

    def _loop(self):
        while not self._stop.is_set():
            reqs = self._take_batch()
            if not reqs:
                continue
            try:
                mixed = np.stack([r.mixed for r in reqs])
                lips = np.stack([r.lip_frames for r in reqs])
                if reqs[0].kind == "wave":
                    out = self.separator.separate_waveform(mixed, lips)
                    payloads = [(out["waveforms"][i], out["masks"][i])
                                for i in range(len(reqs))]
                else:
                    separated, masks = self.separator.separate(mixed, lips)
                    payloads = [(separated[i], masks[i])
                                for i in range(len(reqs))]
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
            for r, payload in zip(reqs, payloads):
                self.stats.latency_ms.append((now - r.t0) * 1e3)
                r.resolve(True, payload)


# ---------------------------------------------------------------------------
# stdlib HTTP front-end
# ---------------------------------------------------------------------------

def make_http_server(server: BatchingSeparatorServer, host: str = "0.0.0.0",
                     port: int = 8571, auth_token: Optional[str] = None,
                     max_request_bytes: int = 64 * 1024 * 1024,
                     certfile: Optional[str] = None,
                     keyfile: Optional[str] = None):
    """ThreadingHTTPServer speaking npz: POST /separate,
    POST /separate_waveform, GET /stats, GET /healthz.

    Each handler thread blocks on its request's future while the batcher
    thread coalesces across connections — concurrency IS the batch
    source.

    Hardening knobs:
      auth_token        : when set, every endpoint except /healthz requires
                          ``Authorization: Bearer <token>`` (401 otherwise).
      max_request_bytes : bodies above this are rejected with 413 WITHOUT
                          reading them (411 when Content-Length is absent),
                          so an oversized upload cannot balloon host RAM.
      certfile/keyfile  : when given, the listening socket is wrapped in
                          TLS (stdlib ssl; supply a PEM cert + key).
    """
    import hmac
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

        def _send_err(self, code: int, msg: str):
            self._send(code, json.dumps({"error": msg}).encode(),
                       "application/json")

        def _authorized(self) -> bool:
            if auth_token is None:
                return True
            got = self.headers.get("Authorization", "")
            ok = got.startswith("Bearer ") and hmac.compare_digest(
                got[len("Bearer "):], auth_token)
            if not ok:
                self._send_err(401, "missing or invalid bearer token")
            return ok

        def do_GET(self):
            if self.path == "/healthz":  # liveness probe: never gated
                self._send(200, b'{"status": "ok"}', "application/json")
                return
            if not self._authorized():
                return
            if self.path != "/stats":
                self._send_err(404, "unknown endpoint")
                return
            body = json.dumps(server.stats.snapshot()).encode()
            self._send(200, body, "application/json")

        def _read_body(self) -> Optional[bytes]:
            length = self.headers.get("Content-Length")
            if length is None:
                self._send_err(411, "Content-Length required")
                return None
            n = int(length)
            if n > max_request_bytes:
                # Drain the refused body in discarded chunks (bounded — a
                # tarpit client gets cut off) so the client sees the 413
                # instead of a broken pipe mid-upload; RAM stays O(chunk).
                remaining = min(n, 8 * max_request_bytes)
                while remaining > 0:
                    chunk = self.rfile.read(min(remaining, 1 << 20))
                    if not chunk:
                        break
                    remaining -= len(chunk)
                self.close_connection = True
                self._send_err(413, f"request body {n} bytes exceeds limit "
                                    f"{max_request_bytes}")
                return None
            return self.rfile.read(n)

        def do_POST(self):
            if not self._authorized():
                return
            if self.path not in ("/separate", "/separate_waveform"):
                self._send_err(404, "unknown endpoint")
                return
            body = self._read_body()
            if body is None:
                return
            try:
                if self.path == "/separate":
                    with np.load(io.BytesIO(body)) as z:
                        mixed = z["mixed_spec"]
                        lips = z["lip_frames"]
                    separated, masks = server.separate(mixed, lips)
                    buf = io.BytesIO()
                    np.savez(buf, separated=separated, masks=masks)
                else:
                    with np.load(io.BytesIO(body)) as z:
                        audio = z["mixed_audio"]
                        lips = z["lip_frames"]
                    waves, masks = server.separate_waveform(audio, lips)
                    buf = io.BytesIO()
                    np.savez(buf, waveforms=waves, masks=masks)
                self._send(200, buf.getvalue(), "application/npz")
            except ServerOverloaded as e:
                body = json.dumps({"error": str(e)}).encode()
                self.send_response(503)
                self.send_header("Retry-After", "1")
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except Exception as e:  # noqa: BLE001 — HTTP error, keep serving
                self._send_err(400, str(e))

    httpd = ThreadingHTTPServer((host, port), Handler)
    if certfile:
        import ssl
        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        ctx.load_cert_chain(certfile, keyfile)
        httpd.socket = ctx.wrap_socket(httpd.socket, server_side=True)
    return httpd


def serve_forever(separator: Separator, host: str = "0.0.0.0",
                  port: int = 8571, max_batch: int = 32,
                  max_delay_ms: float = 5.0,
                  auth_token: Optional[str] = None,
                  max_request_bytes: int = 64 * 1024 * 1024,
                  certfile: Optional[str] = None,
                  keyfile: Optional[str] = None,
                  warmup_batches: Tuple[int, ...] = (),
                  max_pending: int = 1024):
    """Blocking entry used by `avsep serve`."""
    batcher = BatchingSeparatorServer(separator, max_batch=max_batch,
                                      max_delay_ms=max_delay_ms,
                                      max_pending=max_pending)
    if warmup_batches:
        t0 = time.perf_counter()
        n = batcher.warmup(warmup_batches,
                           wave=separator.data_cfg is not None)
        print(f"avsep warmup: {n} programs compiled in "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
    httpd = make_http_server(batcher, host, port, auth_token=auth_token,
                             max_request_bytes=max_request_bytes,
                             certfile=certfile, keyfile=keyfile)
    scheme = "https" if certfile else "http"
    print(f"avsep serving on {scheme}://{host}:{port} "
          f"(max_batch={max_batch}, max_delay_ms={max_delay_ms}, "
          f"auth={'on' if auth_token else 'off'})",
          flush=True)
    try:
        httpd.serve_forever()
    finally:
        batcher.close()
