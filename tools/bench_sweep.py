"""Benchmark sweep: run bench.py across configs x impls x dtypes on the chip
and collect the JSON lines into bench_results/sweep.jsonl + a markdown table.

Each run is a fresh subprocess (clean XLA state, honest compile separation);
the persistent compilation cache keeps repeat compiles cheap.

Usage: python tools/bench_sweep.py [--steps 50] [--quick]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (config, impl, dtype, batch) — batch sized per config to fit HBM with the
# fused pipeline's activation footprint (lrs2's 96x96 stem is the fattest).
# Every production config keeps an explicit xla-vs-pallas pair so the
# measured crossovers in ops/policy.py stay evidence-backed ('auto' rows
# show what ships; the pair shows why).
RUNS = [
    ("demo", "auto", "bfloat16", 128),
    ("demo", "xla", "bfloat16", 128),
    ("demo", "pallas", "bfloat16", 128),
    ("demo", "xla", "float32", 128),
    ("scaled", "auto", "bfloat16", 32),
    ("scaled", "xla", "bfloat16", 32),
    ("scaled", "pallas", "bfloat16", 32),
    ("three_speaker", "auto", "bfloat16", 64),
    ("three_speaker", "xla", "bfloat16", 64),
    ("lrs2", "auto", "bfloat16", 16),
    ("lrs2", "xla", "bfloat16", 16),
    ("multihost", "auto", "bfloat16", 16),
    ("multihost", "xla", "bfloat16", 16),
]

QUICK_RUNS = [
    ("demo", "xla", "bfloat16", 128),
    ("scaled", "xla", "bfloat16", 32),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    # Default matches the driver's bench.py invocation (250 steps -> 50-step
    # fused segments) so sweep rows and BENCH_r*.json are directly
    # comparable; per-step roofline fields are k-independent now anyway
    # (marginal-bytes accounting in bench.py).
    ap.add_argument("--steps", type=int, default=250)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO, "bench_results"))
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    jsonl = os.path.join(args.out, "sweep.jsonl")
    if os.path.exists(jsonl) and not args.quick:
        os.remove(jsonl)  # stale evidence is worse than no evidence
    results = []
    runs = QUICK_RUNS if args.quick else RUNS
    for config, impl, dtype, batch in runs:
        cmd = [sys.executable, os.path.join(REPO, "bench.py"),
               "--config", config, "--impl", impl, "--dtype", dtype,
               "--batch", str(batch), "--steps", str(args.steps)]
        print(f"--- {config} impl={impl} dtype={dtype} batch={batch}",
              flush=True)
        # The tunneled TPU backend needs a cooldown after a client exits
        # before the next can claim the chip; a run that lands in the stale
        # window hangs.  Bound each attempt and retry once after a pause.
        rec = None
        for attempt in range(2):
            t0 = time.time()
            try:
                proc = subprocess.run(cmd, capture_output=True, text=True,
                                      timeout=1800, cwd=REPO)
                line = proc.stdout.strip().splitlines()[-1] \
                    if proc.stdout.strip() else ""
                rec = json.loads(line)
                rec["wall_s"] = round(time.time() - t0, 1)
                break
            except subprocess.TimeoutExpired:
                rec = {"error": "timeout", "wall_s": round(time.time() - t0)}
            except (json.JSONDecodeError, IndexError):
                rec = {"error": (proc.stderr or "no output")[-2000:],
                       "rc": proc.returncode,
                       "wall_s": round(time.time() - t0, 1)}
            print(f"    attempt {attempt} failed "
                  f"({str(rec.get('error'))[:100]}); cooling down",
                  flush=True)
            time.sleep(75)
        rec.update(config=config, impl=impl, dtype=dtype, batch=batch)
        results.append(rec)
        with open(jsonl, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
        time.sleep(10)  # post-exit cooldown before the next claim

    # Markdown table for docs.
    md = os.path.join(args.out, "sweep.md")
    with open(md, "w") as f:
        f.write("| config | impl | dtype | batch | audio-s/s/chip | "
                "vs torch-CPU ref | % peak FLOPs | bound | % roofline |\n"
                "|---|---|---|---|---|---|---|---|---|\n")
        for r in results:
            f.write(f"| {r['config']} | {r['impl']} | {r['dtype']} | "
                    f"{r['batch']} | {r.get('value', 'ERR')} | "
                    f"{r.get('vs_baseline', '-')} | "
                    f"{r.get('pct_peak_flops', '-')} | "
                    f"{r.get('bound', '-')} | "
                    f"{r.get('pct_roofline', '-')} |\n")
    print(f"wrote {jsonl} and {md}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
