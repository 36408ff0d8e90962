"""Benchmark-harness tests (SURVEY §6: committed throughput numbers are a
first-class deliverable, so the tools that produce them get CI coverage).

These spawn real bench.py subprocesses on the CPU backend — slow-marked.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
class TestScalingHarness:
    def test_scaling_sweep_cpu(self, tmp_path):
        """bench_scaling produces per-device-count rows with
        efficiency_vs_linear on the virtual-CPU proxy (BASELINE.md's >=85%
        gate measurement, runnable wherever hardware permits)."""
        out = tmp_path / "scaling.jsonl"
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "bench_scaling.py"),
             "--config", "demo", "--batch", "2", "--steps", "4",
             "--impl", "xla", "--devices", "1,2", "--out", str(out)],
            capture_output=True, text=True, timeout=900, cwd=REPO)
        assert proc.returncode == 0, proc.stderr[-2000:]
        rows = [json.loads(line) for line in out.read_text().splitlines()]
        assert [r["n_devices"] for r in rows] == [1, 2]
        assert all(r.get("value", 0) > 0 for r in rows), rows
        # Weak scaling: global batch doubles with the device count.
        assert rows[1]["global_batch"] == 2 * rows[0]["global_batch"]
        assert "efficiency_vs_linear" in rows[1], rows[1]


@pytest.mark.slow
class TestBenchMeshFlag:
    def test_bench_mesh_data_axis(self):
        """bench.py --mesh-data N runs the sharded train path and reports
        per-chip throughput normalized by the mesh size."""
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"),
             "--config", "demo", "--batch", "4", "--steps", "4",
             "--impl", "xla", "--dtype", "float32", "--mesh-data", "2",
             "--cpu"],
            capture_output=True, text=True, timeout=900, cwd=REPO, env=env)
        assert proc.returncode == 0, proc.stderr[-2000:]
        rec = json.loads(proc.stdout.strip().splitlines()[-1])
        assert rec["value"] > 0
        assert rec["mesh"] == "data=2 fsdp=1 seq=1 model=1"
