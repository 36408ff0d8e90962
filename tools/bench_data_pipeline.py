"""Data-pipeline benchmark: native C++ engine vs the NumPy host generator.

Commits the number behind data/native_loader.py's "order of magnitude"
claim (VERDICT r2 #9): samples/s for (a) the bit-parity NumPy generator
(data/synthetic.py — the reference's dataset.py:70-151 semantics), (b) the
C++ xoshiro engine single-threaded, and (c) the C++ engine with the full
thread pool.  Appends one JSON line per path to
bench_results/data_pipeline.jsonl and prints a summary.

Context for "when does this matter": the fused train path generates data
ON DEVICE (data/device_synthetic.py) and needs no host pipeline at all;
`--data native` matters for the per-step host-fed path and for writing
file corpora (tools in data/files.py).

Usage: python tools/bench_data_pipeline.py [--config demo] [--count 512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def bench(fn, count: int, repeats: int = 3) -> float:
    fn()  # warm (native: build + first-touch pages; numpy: cache warm)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return count / best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="demo")
    ap.add_argument("--count", type=int, default=512)
    ap.add_argument("--out", default=os.path.join(REPO, "bench_results",
                                                  "data_pipeline.jsonl"))
    args = ap.parse_args()

    from av_separation_tpu import get_config
    from av_separation_tpu.data.native_loader import generate_range
    from av_separation_tpu.data.synthetic import SyntheticAVDataset

    cfg = get_config(args.config).data
    n = args.count
    rows = []

    ds = SyntheticAVDataset(cfg)
    rows.append({
        "path": "numpy_host", "threads": 1,
        "samples_per_s": round(bench(
            lambda: [ds[i] for i in range(n)], n), 1)})

    buf = {}

    def native(threads):
        def run():
            buf["out"] = generate_range(cfg, 0, n, num_threads=threads,
                                        out=buf.get("out"))
        return run

    rows.append({
        "path": "native_cpp", "threads": 1,
        "samples_per_s": round(bench(native(1), n), 1)})
    nthreads = os.cpu_count() or 1
    rows.append({
        "path": "native_cpp", "threads": nthreads,
        "samples_per_s": round(bench(native(0), n), 1)})

    base = rows[0]["samples_per_s"]
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "a") as f:
        for r in rows:
            r.update(config=args.config, count=n,
                     speedup_vs_numpy=round(r["samples_per_s"] / base, 1))
            f.write(json.dumps(r) + "\n")
            print(json.dumps(r), flush=True)
    print(f"wrote {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
