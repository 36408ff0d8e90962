"""Multi-PROCESS distributed tests: 2 real OS processes joined through
`jax.distributed.initialize` over a localhost coordinator, CPU backend with
gloo collectives — the tier between single-process virtual-device tests and
real multi-host TPU jobs (SURVEY.md §5 failure-detection row).

Covers:
  - a data-parallel train step executing across processes with host-sharded
    input (each process feeds only its local rows);
  - fault injection: one worker is killed after an initial sync, and the
    survivor's `barrier()` must detect the loss (timeout or runtime error)
    instead of hanging forever.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn(role: str, coord: str, pid: int, nproc: int = 2):
    env = dict(os.environ)
    # 2 virtual CPU devices per process -> 4 global devices over 2 procs.
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.Popen(
        [sys.executable, WORKER, role, coord, str(pid), str(nproc)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        cwd=REPO)


@pytest.mark.slow
class TestMultiProcess:
    def test_two_process_dp_train_step(self):
        coord = f"localhost:{_free_port()}"
        procs = [_spawn("train", coord, i) for i in range(2)]
        outs = []
        for p in procs:
            out, err = p.communicate(timeout=600)
            assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
            outs.append(out)
        losses = [line.split()[1] for out in outs
                  for line in out.splitlines() if line.startswith("LOSS")]
        assert len(losses) == 2, outs
        # The loss is a global reduction — every process must agree.
        assert losses[0] == losses[1], losses

    def test_two_process_cli_train(self):
        """The PRODUCTION entry point (`avsep train`) launched as a real
        2-process job over a localhost coordinator: both processes must
        join, build the global DP mesh, feed host-local rows, and agree on
        the final loss (VERDICT r2 #4: multi-host reachable from the CLI)."""
        import json

        coord = f"localhost:{_free_port()}"
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["JAX_PLATFORMS"] = "cpu"
        procs = [subprocess.Popen(
            [sys.executable, "-m", "av_separation_tpu.cli", "train",
             "--config", "demo", "--steps", "2", "--batch", "4",
             "--dtype", "float32", "--cpu",
             "--coordinator", coord, "--num-processes", "2",
             "--process-id", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=REPO) for i in range(2)]
        outs = []
        for p in procs:
            out, err = p.communicate(timeout=600)
            assert p.returncode == 0, f"avsep train failed:\n{err[-3000:]}"
            outs.append(out)
        losses = []
        for out in outs:
            for line in out.splitlines():
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "final_step" in rec:
                    losses.append(rec["loss"])
        assert len(losses) == 2, outs
        assert losses[0] == losses[1], losses

    def test_killed_worker_detected_by_barrier(self):
        """The survivor must DETECT the dead peer rather than hang.  Two
        legitimate detection paths race: our barrier()'s wall-clock timeout
        (prints FAILURE_DETECTED), and JAX's coordination-service heartbeat
        monitor, which fatal-terminates the process with a diagnostic.
        Either way the job surfaces the fault within the deadline."""
        coord = f"localhost:{_free_port()}"
        survivor = _spawn("survivor", coord, 0)
        dier = _spawn("die", coord, 1)
        dier.communicate(timeout=300)
        out, err = survivor.communicate(timeout=300)  # no hang = detection
        barrier_detected = "FAILURE_DETECTED" in out
        heartbeat_detected = ("heartbeat timeout" in err
                              or "detected fatal errors" in err)
        assert barrier_detected or heartbeat_detected, (
            survivor.returncode, out, err[-2000:])
