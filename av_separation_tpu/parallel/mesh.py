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
PARAM_RULES: Sequence[Tuple[str, P]] = (
    # Attention: q/k/v kernels (d, d) shard heads over columns; out_proj
    # (d, d) shards rows so the block ends in one psum.
    (r".*(q_proj|k_proj|v_proj)/kernel$", P(None, "model")),
    (r".*(q_proj|k_proj|v_proj)/bias$", P("model")),
    (r".*out_proj/kernel$", P("model", None)),
    # Transformer FFN (d, 4d) up / (4d, d) down.
    (r".*(linear1|ff1|fc1)/kernel$", P(None, "model")),
    (r".*(linear1|ff1|fc1)/bias$", P("model")),
    (r".*(linear2|ff2|fc2)/kernel$", P("model", None)),
    # Audio conv projections (k, C_in, d_model): shard output channels.
    (r"audio_encoder/conv\d/kernel$", P(None, None, "model")),
    (r"audio_encoder/conv\d/bias$", P("model")),
    # Everything else (visual conv stem, norms, biases, frame_proj):
    # replicated — these are tiny.
)

BATCH_SPEC = P("data")


def make_mesh(cfg: MeshConfig, devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'model') mesh from the first data*model devices."""
    if devices is None:
        devices = jax.devices()
    n = cfg.data * cfg.model
    if len(devices) < n:
        raise ValueError(
            f"mesh {cfg.data}x{cfg.model} needs {n} devices, "
            f"have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(cfg.data, cfg.model)
    return Mesh(arr, ("data", "model"))


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
    def assign(key_path, leaf):
        spec = spec_for_path(_path_str(key_path))
        # Guard: axis must divide the dim; fall back to replication if not.
        axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
        dims = np.shape(leaf)
        for d, axis in enumerate(spec):
            if axis is None:
                continue
            names = axis if isinstance(axis, tuple) else (axis,)
            total = int(np.prod([axis_sizes[a] for a in names]))
            if d >= len(dims) or dims[d] % total != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(assign, params)


def replicated(mesh: Mesh, tree: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P()), tree)


def batch_shardings(mesh: Mesh, batch: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, BATCH_SPEC), batch)
