"""Kernel-implementation policy: the single source of truth for 'auto'.

Every measured crossover that decides between the XLA lowering and a fused
Pallas kernel lives HERE, with a pointer to the bench artifact that set it.
Both consumers — `ops/attention.py` (flash attention) and `models/model.py`
(fused audio projection / mask decoder) — resolve through this module, so
the thresholds cannot drift apart.

The reference has no notion of kernel selection (it is eager PyTorch,
reference model.py:22-301); this layer exists because the TPU build ships
two lowerings per hot op and picks by measured shape crossover.

Platform resolution
-------------------
'auto' must know whether the program is being lowered for TPU (where the
Mosaic kernels compile) or CPU/GPU (where they don't).  By default this is
`jax.default_backend()`, which is correct for every in-process path this
framework ships (jit on the process backend).  KNOWN LIMITATION: AOT
lowering for a *different* platform than the process default (e.g.
`jax.jit(...).lower()` targeting TPU from a CPU host, or
`jax.default_device` pointing at a non-default backend) would resolve
against the wrong platform.  For those flows, pin the platform explicitly:

    with policy.target_platform("tpu"):
        lowered = jax.jit(step).lower(...)

Mesh awareness
--------------
`pallas_call` is a custom call that GSPMD cannot partition: inside a
sharded jit it would be replicated (all-gather of Q/K/V, then a full dense
kernel per device) — silently catastrophic.  Train-step builders therefore
wrap tracing in `policy.use_mesh(mesh)`; the attention layer consults
`policy.active_mesh()` and routes the flash kernel through `jax.shard_map`
(batch over the data axes, heads over the model axis) so every device runs
the kernel on exactly its own shard.  When the mesh cannot divide the
batch/head axes the resolver falls back to 'xla', which GSPMD partitions
natively.
"""

from __future__ import annotations

import logging
import threading
from contextlib import contextmanager
from typing import Optional

import jax

_logger = logging.getLogger(__name__)

# Minimum Tq*Tk for 'auto' attention to pick the flash kernel.  At/above
# this the XLA path's materialized probability residuals + dropout masks
# dominate the backward; below it the dense path's better small-shape
# pipelining wins.  Provenance: v5e bench sweep, scaled config T=501
# (flash 115.6 -> 79.1 ms/step win) vs demo T=63 (flash ~5% loss) —
# bench_results/sweep.jsonl rows {config: scaled, impl: auto vs xla} and
# {config: demo, impl: auto vs xla}.
AUTO_MIN_SCORE_ELEMS = 256 * 256

# When the head dim is a full lane multiple the packed-LAYOUT flash path
# (no split_heads relayout, one fused backward kernel) wins at a much
# SMALLER score matrix than the glue-heavy (B, H, T, dh) path the original
# crossover was measured against.  Interleaved official-bench A/B on v5e
# (3 rounds each, <0.1% spread):
#   scaled with the T=100 visual self-attention + (501, 100) fusion
#   cross-attention flipped to packed flash: 2567 vs 2431 audio-s/s (+5.6%)
#   three_speaker, T=63 audio self-attention flipped: 3763 vs 3960 (-5%)
# So packed flash wins at Tq*Tk >= 100*100 and loses at 63*63; the
# crossover is pinned at the measured winning bracket.  The
# dh % 128 != 0 case (demo: dh=32) has no packed path and keeps the
# original AUTO_MIN_SCORE_ELEMS crossover.
PACKED_LANE_MULTIPLE = 128
PACKED_MIN_SCORE_ELEMS = 100 * 100

# Minimum sequence length for 'auto' to pick the fused Pallas audio
# projection / mask decoder kernels.  Provenance: v5e sweep — scaled-config
# step 70.4 -> 68.3 ms with the fused VMEM passes at T=501; at demo T=63
# the dense XLA path measured faster (bench_results/sweep.jsonl).
FUSED_MIN_SEQ = 256


_state = threading.local()


def _get(name: str, default=None):
    return getattr(_state, name, default)


@contextmanager
def target_platform(platform: str):
    """Pin the lowering-target platform for 'auto' resolution (see module
    docstring: needed only for cross-platform AOT lowering)."""
    prev = _get("platform")
    _state.platform = platform
    try:
        yield
    finally:
        _state.platform = prev


def resolved_platform() -> str:
    return _get("platform") or jax.default_backend()


@contextmanager
def use_mesh(mesh):
    """Declare the mesh a jitted program is being traced under.  Train-step
    builders wrap the traced body in this so trace-time resolution can route
    Pallas kernels through shard_map (or fall back to XLA) instead of
    letting GSPMD replicate an unpartitionable custom call."""
    prev = _get("mesh")
    _state.mesh = mesh
    try:
        yield
    finally:
        _state.mesh = prev


def active_mesh():
    """The mesh declared by the innermost `use_mesh`, or None."""
    return _get("mesh")


def mesh_axis_size(mesh, *names: str) -> int:
    """Product of the sizes of `names` axes present on `mesh`."""
    if mesh is None:
        return 1
    n = 1
    for name in names:
        n *= int(mesh.shape.get(name, 1))
    return n


def resolve_attention(impl: str, tq: int, tk: int,
                      d_head: Optional[int] = None) -> str:
    """Trace-time resolution of the attention impl selector.

    'auto' -> 'pallas' when lowering for TPU and EITHER the score matrix
    has at least AUTO_MIN_SCORE_ELEMS elements, OR the head dim is a full
    lane multiple (the packed-layout path wins at any T then — see
    PACKED_LANE_MULTIPLE provenance); 'xla' otherwise.  Explicit selectors
    pass through unchanged.  (Sharded-mesh routing happens in
    `ops.attention.multi_head_attention`, which consults `active_mesh()`.)
    """
    if impl != "auto":
        return impl
    if resolved_platform() != "tpu":
        return "xla"
    if d_head is not None and d_head % PACKED_LANE_MULTIPLE == 0 \
            and tq * tk >= PACKED_MIN_SCORE_ELEMS:
        return "pallas"
    return "pallas" if tq * tk >= AUTO_MIN_SCORE_ELEMS else "xla"


def resolve_stem(impl: str, frame_h: int, frame_w: int) -> str:
    """Trace-time resolution for the visual conv stem implementation.

    'auto' resolves to 'xla' EVERYWHERE — a closed question after three
    measured alternatives (the stem is 37%/36% of the demo/lrs2 steps,
    bench_results/profile_{demo,lrs2}_auto.jsonl, so each was worth
    building):

      - Pallas v1 (r4): fused conv+BN+ReLU kernels with in-kernel parity
        restructuring — 12x/26x slower than the XLA stem (per-program
        sublane-shuffle chains).  Deleted.
      - Pallas v2 (r4): XLA-side plane pre-split + strictly-2D flat-halo
        kernels — still 7.5x slower (per-program cost floor + multi-ms
        XLA gather glue).  Deleted.
      - s2d (r5, kept as explicit opt-in): exact space-to-depth
        restructure to stride-1 2x2 convs (ops/s2d_stem.py) — pure XLA,
        MXU-deep contractions, dense backward, but the 16/9 FLOP
        expansion + S2D relayout traffic lose to the conv emitter:
        fwd+bwd 3.44 vs 2.30 ms at demo shapes, 15.8 vs 9.7 ms at lrs2
        (bench_results/stem_ab.jsonl, barrier-scan methodology).

    Conclusion recorded in docs/kernels.md: XLA's conv emitter is the
    measured winner at every shipped frame geometry; 'auto' must not
    regress the step.  's2d' requires even frame dims (the S2D reshape).
    """
    if impl == "pallas":
        raise ValueError(
            "stem_impl='pallas' was removed in r5: both fused-kernel "
            "designs measured 7.5-26x slower than the XLA stem on v5e "
            "(see docs/kernels.md).  Use 'auto', 'xla', or 's2d'.")
    if impl != "auto":
        return impl
    return "xla"


def resolve_fused(impl: str, seq_len: int) -> str:
    """Trace-time resolution for the fused projection/decoder kernels:
    'auto' -> 'pallas' on TPU at seq_len >= FUSED_MIN_SEQ, else 'xla'.

    Under a sharded mesh 'auto' falls back to 'xla' for these kernels: the
    sequence axis is not a sharded dim (batch is), but GSPMD cannot
    partition the pallas_call over the batch axis either — XLA's native
    lowering partitions for free and the fused kernels' margin (~3%) does
    not justify a shard_map wrapper yet.
    """
    if impl != "auto":
        return impl
    if resolved_platform() != "tpu" or seq_len < FUSED_MIN_SEQ:
        return "xla"
    if mesh_axis_size(active_mesh(), "data", "fsdp", "model") > 1:
        _logger.warning(
            "fused projection/decoder kernels demoted to XLA under sharded "
            "mesh %s (GSPMD cannot partition a pallas_call; the ~3%% fused "
            "margin is lost for this program)",
            dict(active_mesh().shape))
        return "xla"
    return "pallas"
