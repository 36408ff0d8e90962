"""Profiling/observability helpers — the tracing tier the reference lacks
(its only instrumentation is a loss print every 20 steps, reference
demo.py:108-109; SURVEY.md §5).

- `trace()` context manager wraps `jax.profiler` and writes an XProf/
  Perfetto-compatible trace directory.
- `Timer` gives block_until_ready-bracketed wall timings.
- `step_metrics_line` emits structured JSONL metrics to stdout.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Any, Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in XProf/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall timer that blocks on device results for honest bracketing."""

    def __init__(self):
        self.start = time.perf_counter()

    def elapsed(self, *block_on) -> float:
        if block_on:
            jax.block_until_ready(block_on)
        return time.perf_counter() - self.start


def step_metrics_line(step: int, metrics: Dict[str, Any],
                      extra: Optional[Dict[str, Any]] = None) -> str:
    """One JSONL metrics record (loss, grad_norm, throughput, ...)."""
    rec = {"step": step}
    for k, v in metrics.items():
        try:
            rec[k] = float(v)
        except (TypeError, ValueError):
            rec[k] = v
    if extra:
        rec.update(extra)
    return json.dumps(rec)


def live_memory_bytes() -> Optional[int]:
    """Total live device memory, when the backend exposes stats."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        return int(stats.get("bytes_in_use", 0)) if stats else None
    except Exception:
        return None
