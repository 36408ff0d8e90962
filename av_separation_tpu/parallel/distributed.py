"""Multi-host bring-up and failure handling (SURVEY.md §5: absent from the
reference — no torch.distributed anywhere).

- `initialize()` wraps `jax.distributed.initialize` with environment
  auto-detection (TPU pod metadata / explicit coordinator) and is a no-op on
  a single host.
- `global_mesh()` lays a ('data','model') mesh over all hosts' devices with
  the model axis packed within a host (ICI) and data spanning hosts (DCN) —
  the ordering `jax.devices()` already provides on pod slices.
- `barrier()` / `check_alive()` give a cheap liveness probe: a tiny psum
  across all devices with a wall-clock timeout in a side thread; a hung
  collective (lost host) surfaces as a clear TimeoutError so the driver can
  restart from the latest Orbax checkpoint — crash-consistent recovery
  rather than in-job elasticity, the standard TPU pattern.
"""

from __future__ import annotations

import os
import threading
from typing import Optional

import jax
import numpy as np

from av_separation_tpu.config import MeshConfig
from av_separation_tpu.parallel.mesh import make_mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed across hosts; no-op for single-process.

    Resolution order: explicit args -> JAX_COORDINATOR_ADDRESS env ->
    TPU pod auto-detection (args all None)."""
    if num_processes is None and coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    hostnames = [h for h in os.environ.get("TPU_WORKER_HOSTNAMES",
                                           "").split(",") if h]
    multi_host_env = len(hostnames) > 1
    if coordinator_address is None and num_processes is None:
        if not multi_host_env:
            return  # single host
        from jax._src import xla_bridge
        if xla_bridge.backends_are_initialized():
            # Auto-detect would be too late; caller already touched devices
            # in a single-process run — treat as single host.
            return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def global_mesh(cfg: MeshConfig):
    """Mesh over every device in the job.  The 'model' axis is packed into
    contiguous (same-host, ICI-linked) devices; 'data' spans hosts so its
    gradient psum is the only DCN-crossing collective."""
    return make_mesh(cfg, devices=jax.devices())


def host_local_batch_to_global(local_batch, mesh):
    """Assemble per-process host arrays into global jax.Arrays sharded over
    the mesh's data axes.

    Each process passes ONLY its local rows (global_batch / process_count);
    `jax.make_array_from_process_local_data` stitches them into one global
    array without any cross-host transfer — the standard multi-host input
    pipeline (each host feeds the shard its own devices own).  Works
    unchanged in single-process mode.
    """
    from jax.sharding import NamedSharding

    from av_separation_tpu.parallel.mesh import BATCH_SPEC

    sharding = NamedSharding(mesh, BATCH_SPEC)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        local_batch)


def barrier(timeout_s: float = 60.0) -> None:
    """All-device barrier with timeout: a lost/hung host raises instead of
    deadlocking the job forever.

    Implemented as a jitted psum over a 1-axis mesh spanning every device in
    the job (GSPMD inserts the cross-host all-reduce); the collective runs in
    a side thread so a lost host surfaces as TimeoutError instead of a hang.
    """
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    result = {}

    def run():
        # No-input shard_map: each device contributes ones(()) and the psum
        # is the only collective — safe in multi-process mode (no host array
        # needs placing on non-addressable devices).
        mesh = Mesh(np.asarray(jax.devices()), ("all",))
        f = jax.jit(shard_map(
            lambda: jax.lax.psum(jnp.ones(()), "all"),
            mesh=mesh, in_specs=(), out_specs=P()))
        result["sum"] = float(f())

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        raise TimeoutError(
            f"collective barrier did not complete within {timeout_s}s — "
            "a host is unreachable; restart from the latest checkpoint")
    expected = float(jax.device_count())
    if abs(result.get("sum", 0.0) - expected) > 0.5:
        raise RuntimeError(
            f"barrier psum mismatch: {result.get('sum')} != {expected}")


def check_alive(timeout_s: float = 60.0) -> bool:
    try:
        barrier(timeout_s)
        return True
    except (TimeoutError, RuntimeError):
        return False
