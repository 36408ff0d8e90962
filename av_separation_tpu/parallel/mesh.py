"""Device mesh construction and parameter partition rules.

The reference has zero distributed code (SURVEY.md §2.4) — this layer is
green-field TPU design.  Axes:

  'data'  — utterance batches (DP).  Batch tensors are sharded on their
            leading axis; gradient reduction is the psum XLA inserts for the
            data-parallel jit.
  'model' — tensor parallelism over d_model-derived weight matrices (TP).
            Attention q/k/v projections shard output columns (head-parallel),
            out-projections shard input rows, FFN up/down shard the 4*d hidden
            dim — so each transformer block needs only one all-reduce per
            sublayer, riding ICI.

Partition specs are assigned by regex rules over the flattened parameter
path (the pattern used throughout public JAX LLM codebases); anything not
matched is replicated.  With GSPMD, `jit` with these NamedShardings makes
XLA insert all collectives automatically.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from av_separation_tpu.config import MeshConfig

# (path regex, PartitionSpec) — first match wins.  Paths are '/'-joined.
# 'model' is the TP axis; 'fsdp' (ZeRO) shards the complementary dim of each
# weight matrix so params + Adam moments scale down with the fsdp axis size.
# When either axis has size 1 (or a dim isn't divisible), param_shardings
# drops that dim's annotation — the same rule table serves 1-chip, pure-DP,
# pure-FSDP and combined meshes.
PARAM_RULES: Sequence[Tuple[str, P]] = (
    # Attention: q/k/v kernels (d, d) shard heads over columns; out_proj
    # (d, d) shards rows so the block ends in one psum.
    (r".*(q_proj|k_proj|v_proj)/kernel$", P("fsdp", "model")),
    (r".*(q_proj|k_proj|v_proj)/bias$", P("model")),
    (r".*out_proj/kernel$", P("model", "fsdp")),
    # Transformer FFN (d, 4d) up / (4d, d) down.
    (r".*(linear1|ff1|fc1)/kernel$", P("fsdp", "model")),
    (r".*(linear1|ff1|fc1)/bias$", P("model")),
    (r".*(linear2|ff2|fc2)/kernel$", P("model", "fsdp")),
    # Audio conv projections (k, C_in, d_model): shard output channels over
    # TP, input channels over fsdp (conv1's C_in=freq_bins=257 is odd, so
    # the per-dim guard drops fsdp there automatically).
    (r"audio_encoder/conv\d/kernel$", P(None, "fsdp", "model")),
    (r"audio_encoder/conv\d/bias$", P("model")),
    # The decoder MLP is fc1/fc2 and is covered by the FFN rules above
    # ((d,2d) -> P('fsdp','model'); (2d,F*S) -> P('model','fsdp') with fsdp
    # auto-dropped on the odd F*S dim).
    # Everything else (visual conv stem, norms, biases, frame_proj):
    # replicated — these are tiny.
)

# Batches shard over both data axes: 'fsdp' acts as extra DP for activations.
BATCH_SPEC = P(("data", "fsdp"))


def make_mesh(cfg: MeshConfig, devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'fsdp', 'seq', 'model') mesh from the first
    data*fsdp*seq*model devices.  Axis order puts 'model' innermost
    (contiguous devices -> ICI-adjacent on real slices), 'seq' next (its
    per-layer KV all-gathers also ride ICI) and 'data' outermost (its psum
    is the only collective that may cross DCN on multi-host jobs)."""
    if devices is None:
        devices = jax.devices()
    n = cfg.num_devices
    if len(devices) < n:
        raise ValueError(
            f"mesh {cfg.data}x{cfg.fsdp}x{cfg.seq}x{cfg.model} needs {n} "
            f"devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(cfg.data, cfg.fsdp, cfg.seq,
                                          cfg.model)
    return Mesh(arr, ("data", "fsdp", "seq", "model"))


def single_device_mesh() -> Mesh:
    return make_mesh(MeshConfig(data=1, model=1))


def spec_for_path(path: str) -> P:
    for pattern, spec in PARAM_RULES:
        if re.fullmatch(pattern, path):
            return spec
    return P()


def _path_str(key_path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                    for k in key_path)


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """Pytree of NamedShardings for a parameter pytree, via PARAM_RULES.

    When the mesh has a trivial 'model' axis (size 1) the specs still apply —
    GSPMD treats the single-element axis as replication, so the same code
    path serves 1-chip and multi-chip runs.
    """
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))

    def assign(key_path, leaf):
        spec = spec_for_path(_path_str(key_path))
        # Per-dim guard: drop an annotation when the mesh lacks the axis or
        # the axis size doesn't divide the dim — the remaining dims keep
        # their sharding (e.g. conv1 (3, 257, d) keeps 'model' on d even
        # though 257 can't take 'fsdp').
        dims = np.shape(leaf)
        kept = []
        for d, axis in enumerate(spec):
            if d >= len(dims):
                break  # spec longer than rank: ignore the excess dims
            if axis is None:
                kept.append(None)
                continue
            names = axis if isinstance(axis, tuple) else (axis,)
            total = int(np.prod([axis_sizes.get(a, 0) for a in names]))
            kept.append(axis if total and dims[d] % total == 0 else None)
        return NamedSharding(mesh, P(*kept))

    return jax.tree_util.tree_map_with_path(assign, params)


def replicated(mesh: Mesh, tree: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P()), tree)


def batch_shardings(mesh: Mesh, batch: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, BATCH_SPEC), batch)
