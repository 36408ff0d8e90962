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


class TestRooflineTerms:
    """Three-term roofline (VERDICT r4 weak #3): VPU transcendental work is
    a floor term, and a step far above its floor is labeled op-overhead
    rather than 'compute'."""

    def test_vpu_bound_labeled(self):
        from av_separation_tpu.utils.roofline import roofline
        # 1e12 transcendentals at 0.96e12/s dominates tiny FLOP/byte terms.
        rl = roofline(flops=1e12, bytes_accessed=1e9, dt=1.1,
                      dtype="bfloat16", device_kind="TPU v5 lite",
                      transcendentals=1e12)
        assert rl["bound"] == "vpu"
        assert rl["pct_vpu_transcendental"] > 90

    def test_op_overhead_labeled_when_floor_small(self):
        from av_separation_tpu.utils.roofline import roofline
        # Floor explains ~12% of dt -> not roofline-bound at all.
        rl = roofline(flops=0.12 * 197e12, bytes_accessed=27e9, dt=1.0,
                      dtype="bfloat16", device_kind="TPU v5 lite",
                      transcendentals=2.7e6)
        assert rl["bound"].startswith("op-overhead")
        assert "compute" in rl["bound"]
        assert rl["pct_roofline"] < 50

    def test_true_compute_bound_unchanged(self):
        from av_separation_tpu.utils.roofline import roofline
        rl = roofline(flops=0.9 * 197e12, bytes_accessed=27e9, dt=1.0,
                      dtype="bfloat16", device_kind="TPU v5 lite")
        assert rl["bound"] == "compute"
        assert rl["pct_roofline"] > 80


class TestCollectiveAccounting:
    """Ring wire factors + replica-group parsing (ADVICE r4 medium: raw
    payload bytes understated per-chip wire traffic ~2x)."""

    def _mod(self):
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "collective_accounting",
            os.path.join(REPO, "tools", "collective_accounting.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_explicit_groups_and_ring_factor(self):
        mod = self._mod()
        hlo = ("%ar = f32[1000]{0} all-reduce(%x), "
               "replica_groups={{0,1,2,3},{4,5,6,7}}, to_apply=%sum")
        stats = mod.collective_stats(hlo, 8, devices_per_host=4)
        rec = stats["all-reduce"]
        assert rec["group_size"] == 4
        # 2*(4-1)/4 * 4000 bytes = 6000, all ICI (groups within hosts).
        assert abs(rec["wire_bytes_ici"] - 6000.0) < 1e-6
        assert rec["wire_bytes_dcn"] == 0.0

    def test_cross_host_groups_classified_dcn(self):
        mod = self._mod()
        hlo = ("%ar = f32[1000]{0} all-reduce(%x), "
               "replica_groups={{0,4},{1,5},{2,6},{3,7}}, to_apply=%sum")
        stats = mod.collective_stats(hlo, 8, devices_per_host=4)
        rec = stats["all-reduce"]
        assert rec["wire_bytes_dcn"] > 0
        assert rec["wire_bytes_ici"] == 0.0

    def test_iota_groups(self):
        mod = self._mod()
        groups = mod._parse_replica_groups(
            "replica_groups=[2,4]<=[8]")
        assert groups == [[0, 1, 2, 3], [4, 5, 6, 7]]
        groups_t = mod._parse_replica_groups(
            "replica_groups=[4,2]<=[4,2]T(1,0)")
        assert groups_t == [[0, 2], [4, 6], [1, 3], [5, 7]]

    def test_async_start_detection(self):
        mod = self._mod()
        hlo = ("%ars = (f32[8], f32[8]) all-reduce-start(%x), "
               "replica_groups={{0,1}}\n"
               "%ard = f32[8] all-reduce-done(%ars)")
        assert mod.count_async_starts(hlo) == 1
        assert mod.count_async_starts("%ar = f32[8] all-reduce(%x)") == 0
