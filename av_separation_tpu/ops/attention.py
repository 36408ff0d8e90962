"""Multi-head scaled-dot-product attention — XLA path + Pallas dispatch.

The reference uses `nn.MultiheadAttention` for both the transformer encoders
and the cross-modal fusion (reference model.py:48-52, 155, 166-170).  Here
attention is a pure function over already-projected Q/K/V; the QKV/out
projections live in the model layer so the same op serves self-attention
(audio/visual encoders) and cross-attention (audio-query over visual-KV).

Three implementations, selected by `impl`:
  - 'xla': einsum + softmax.  XLA fuses the softmax chain; for short
    sequences this is at or near roofline already, but its BACKWARD
    materializes the (B*H, Tq, Tk) probabilities (f32) plus a same-shaped
    dropout mask in HBM — measured at 42 ms of a 116 ms scaled-config
    training step (bench_results/profile_scaled_b32_bf16.md).
  - 'pallas': blockwise flash-attention kernel (ops/pallas/attention.py) with
    online softmax and in-kernel regenerable dropout — O(block) memory, the
    backward recomputes probabilities in VMEM instead of re-reading them.
    Gated on allclose vs the 'xla' path in tests/test_kernels.py.
  - 'auto' (default): 'pallas' when tracing for TPU and the score matrix is
    large enough that residual traffic dominates; 'xla' otherwise
    (including CPU/GPU backends, where the Mosaic kernel doesn't compile).
    The measured crossover constants live in ops/policy.py — the single
    source of truth — with pointers to the sweep rows that set them.

Sharded-mesh routing (ops/policy.py `use_mesh` declares the mesh at trace
time):
  - data/fsdp/model axes: the flash kernel runs through `jax.shard_map`
    (`_flash_sharded`) — GSPMD cannot partition a pallas_call, so without
    this the kernel would be replicated behind an all-gather of Q/K/V.
  - 'seq' axis (sequence parallelism): `_attn_seq_sharded` keeps Q sharded
    along time and all-gathers K/V over ICI before a local attention with
    per-shard decorrelated dropout.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp

from av_separation_tpu.ops import policy

_logger = logging.getLogger(__name__)
from av_separation_tpu.ops.policy import AUTO_MIN_SCORE_ELEMS  # noqa: F401 (re-export)


def split_heads(x: jnp.ndarray, nhead: int) -> jnp.ndarray:
    """(B, T, d) -> (B, H, T, dh)"""
    b, t, d = x.shape
    return x.reshape(b, t, nhead, d // nhead).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, T, dh) -> (B, T, d)"""
    b, h, t, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dh)


def attention_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  dropout_rate: float = 0.0,
                  dropout_rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """(B, H, Tq, dh) x (B, H, Tk, dh) -> (B, H, Tq, dh).

    Softmax statistics accumulate in float32 regardless of compute dtype.
    Dropout is applied to the attention probabilities, matching torch MHA
    training semantics (the probability row no longer sums to 1).
    """
    dh = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    probs = probs.astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def resolve_attn_impl(impl: str, tq: int, tk: int,
                      d_head: Optional[int] = None) -> str:
    """Resolve an attention impl selector at trace time (see ops/policy.py,
    the single owner of the measured crossovers)."""
    return policy.resolve_attention(impl, tq, tk, d_head)


def _flash_sharded(qh, kh, vh, mesh, dropout_rate: float,
                   seed: Optional[jnp.ndarray]):
    """Run the flash kernel under a sharded mesh via shard_map.

    GSPMD cannot partition a pallas_call — inside a sharded jit the kernel
    would be replicated behind an all-gather of Q/K/V.  shard_map instead
    hands each device exactly its (batch-shard, head-shard) block: batch
    over the ('data','fsdp') axes, heads over the TP 'model' axis (the q/k/v
    projections are column-sharded by PARAM_RULES, so heads already live on
    the model axis and no resharding is inserted).  Returns None when the
    mesh cannot divide the batch/head axes — caller falls back to XLA.
    """
    from jax.sharding import PartitionSpec as P

    from av_separation_tpu.ops.pallas.attention import flash_attention

    b, h = qh.shape[0], qh.shape[1]
    data_axes = tuple(a for a in ("data", "fsdp")
                      if policy.mesh_axis_size(mesh, a) > 1)
    model_sz = policy.mesh_axis_size(mesh, "model")
    if b % max(policy.mesh_axis_size(mesh, *data_axes), 1) != 0:
        return None
    if model_sz > 1 and h % model_sz != 0:
        return None
    batch_spec = data_axes if data_axes else None
    head_spec = "model" if model_sz > 1 else None
    spec = P(batch_spec, head_spec, None, None)
    rate = float(dropout_rate)

    def local(q_blk, k_blk, v_blk, seed_blk):
        if rate > 0.0:
            # Decorrelate the in-kernel PRNG stream across shards: local
            # (b, h) tile coordinates restart at 0 on every device, so fold
            # the device's mesh position into the seed.
            pos = jnp.zeros((), jnp.int32)
            for ax in (*data_axes, *(("model",) if model_sz > 1 else ())):
                pos = pos * jnp.int32(mesh.shape[ax]) \
                    + jax.lax.axis_index(ax)
            # 0x9E3779B1 as a wrapped int32 (golden-ratio multiplier).
            seed_local = seed_blk + pos * jnp.int32(0x9E3779B1 - (1 << 32))
            return flash_attention(q_blk, k_blk, v_blk, dropout_rate=rate,
                                   dropout_seed=seed_local)
        return flash_attention(q_blk, k_blk, v_blk)

    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    return jax.shard_map(local, mesh=mesh,
                         in_specs=(spec, spec, spec, P()),
                         out_specs=spec,
                         check_vma=False)(qh, kh, vh, seed)


def _flash_sharded_packed(q, k, v, nhead: int, mesh, dropout_rate: float,
                          seed: Optional[jnp.ndarray]):
    """Packed-LAYOUT flash under a sharded mesh: q/k/v stay (B, T, H*dh).

    TP shards the LAST axis — heads are contiguous 128-lane column blocks,
    so a 'model'-axis shard of H*dh columns is exactly H/model whole heads
    and each device runs the packed kernel on its local head group with no
    relayout.  Batch shards over ('data','fsdp') as in `_flash_sharded`.
    Returns None when the mesh cannot divide batch/heads or the shapes
    need the (B, H, T, dh) grid kernel — caller falls back.
    """
    from jax.sharding import PartitionSpec as P

    from av_separation_tpu.ops.pallas.attention import (
        DEFAULT_BLOCK_K, DEFAULT_BLOCK_Q, _cdiv, flash_attention_packed_qkv)

    b, tq, dm = q.shape
    tk = k.shape[1]
    if dm % nhead or (dm // nhead) % 128:
        return None
    if _cdiv(tq, 16) * 16 > DEFAULT_BLOCK_Q \
            or _cdiv(tk, 128) * 128 > DEFAULT_BLOCK_K:
        return None  # multi-block sequence: use the grid kernel path
    data_axes = tuple(a for a in ("data", "fsdp")
                      if policy.mesh_axis_size(mesh, a) > 1)
    model_sz = policy.mesh_axis_size(mesh, "model")
    if b % max(policy.mesh_axis_size(mesh, *data_axes), 1) != 0:
        return None
    if model_sz > 1 and nhead % model_sz != 0:
        return None
    spec = P(data_axes if data_axes else None, None,
             "model" if model_sz > 1 else None)
    rate = float(dropout_rate)
    nh_local = nhead // max(model_sz, 1)

    def local(q_blk, k_blk, v_blk, seed_blk):
        if rate > 0.0:
            pos = jnp.zeros((), jnp.int32)
            for ax in (*data_axes, *(("model",) if model_sz > 1 else ())):
                pos = pos * jnp.int32(mesh.shape[ax]) \
                    + jax.lax.axis_index(ax)
            seed_local = seed_blk + pos * jnp.int32(0x9E3779B1 - (1 << 32))
        else:
            seed_local = seed_blk
        return flash_attention_packed_qkv(q_blk, k_blk, v_blk, nh_local,
                                          dropout_rate=rate,
                                          dropout_seed=seed_local)

    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    return jax.shard_map(local, mesh=mesh,
                         in_specs=(spec, spec, spec, P()),
                         out_specs=spec,
                         check_vma=False)(q, k, v, seed)


def _attn_seq_sharded(qh, kh, vh, mesh, impl: str, dropout_rate: float,
                      dropout_rng, seed):
    """Sequence-parallel attention over the 'seq' mesh axis via shard_map.

    Q stays sharded along its time axis; K/V are all-gathered over ICI
    before a local attention (Ulysses/all-gather-KV style — SURVEY §2.4 SP
    row: at this model's T the gathered KV is small next to the O(T^2)
    score work that stays sharded).  Local attention uses the resolved impl
    (flash kernel or dense XLA); dropout streams are decorrelated per shard
    by folding the seq-axis index into the rng/seed.  Returns None when the
    time axes don't divide the axis — caller falls back to GSPMD.
    """
    from jax.sharding import PartitionSpec as P

    n_seq = policy.mesh_axis_size(mesh, "seq")
    if qh.shape[2] % n_seq or kh.shape[2] % n_seq:
        return None
    b, h = qh.shape[0], qh.shape[1]
    data_axes = tuple(a for a in ("data", "fsdp")
                      if policy.mesh_axis_size(mesh, a) > 1)
    model_sz = policy.mesh_axis_size(mesh, "model")
    if b % max(policy.mesh_axis_size(mesh, *data_axes), 1) != 0:
        return None
    if model_sz > 1 and h % model_sz != 0:
        return None
    head_spec = "model" if model_sz > 1 else None
    spec = P(data_axes if data_axes else None, head_spec, "seq", None)
    rate = float(dropout_rate)

    def local(q_blk, k_blk, v_blk, rng_blk, seed_blk):
        k_full = jax.lax.all_gather(k_blk, "seq", axis=2, tiled=True)
        v_full = jax.lax.all_gather(v_blk, "seq", axis=2, tiled=True)
        # Decorrelate dropout across ALL sharded axes, not just 'seq':
        # devices holding different batch/head shards must not replay the
        # same mask stream (their local (b, h) tile coordinates restart at
        # 0).  Same pos-packing scheme as _flash_sharded, with 'seq' packed
        # in as the innermost axis.
        pos = jnp.zeros((), jnp.int32)
        for ax in (*data_axes, *(("model",) if model_sz > 1 else ()),
                   "seq"):
            pos = pos * jnp.int32(mesh.shape[ax]) + jax.lax.axis_index(ax)
        if impl == "pallas":
            from av_separation_tpu.ops.pallas.attention import (
                flash_attention)
            if rate > 0.0:
                seed_local = seed_blk + (pos + 1) \
                    * jnp.int32(0x9E3779B1 - (1 << 32))
                return flash_attention(q_blk, k_full, v_full,
                                       dropout_rate=rate,
                                       dropout_seed=seed_local)
            return flash_attention(q_blk, k_full, v_full)
        rng_local = jax.random.fold_in(rng_blk, pos) \
            if rate > 0.0 else None
        return attention_xla(q_blk, k_full, v_full, rate, rng_local)

    if dropout_rng is None:
        dropout_rng = jax.random.key(0)
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    return jax.shard_map(local, mesh=mesh,
                         in_specs=(spec, spec, spec, P(), P()),
                         out_specs=spec,
                         check_vma=False)(qh, kh, vh, dropout_rng, seed)


def multi_head_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         nhead: int, *, impl: str = "xla",
                         dropout_rate: float = 0.0,
                         dropout_rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """Projected-QKV multi-head attention on (B, T, d) tensors."""
    impl = policy.resolve_attention(impl, q.shape[1], k.shape[1],
                                    q.shape[-1] // nhead)
    mesh_packed = policy.active_mesh()
    if impl == "pallas" and (
            mesh_packed is None
            or policy.mesh_axis_size(mesh_packed, "seq") == 1):
        # Packed-layout fast path: the kernel reads (B, T, H*dh) head
        # slices directly — no split_heads/merge_heads relayout in either
        # direction (measured 1.8 ms/step of concatenates on the scaled
        # config).  Under a data/fsdp/model mesh the same layout runs
        # through shard_map with the TP axis sharding whole head groups
        # along the packed last dim.  Returns None when dh isn't a lane
        # multiple or the sequence needs the multi-block grid kernel.
        seed = None
        rate = dropout_rate
        if rate > 0.0 and dropout_rng is not None:
            seed = jax.random.bits(dropout_rng, (1,), "uint32") \
                .astype(jnp.int32)
        else:
            rate = 0.0
        if mesh_packed is not None and policy.mesh_axis_size(
                mesh_packed, "data", "fsdp", "model") > 1:
            out_packed = _flash_sharded_packed(q, k, v, nhead, mesh_packed,
                                               rate, seed)
        else:
            from av_separation_tpu.ops.pallas.attention import (
                flash_attention_packed_qkv)
            out_packed = flash_attention_packed_qkv(q, k, v, nhead,
                                                    dropout_rate=rate,
                                                    dropout_seed=seed)
        if out_packed is not None:
            return out_packed
    qh, kh, vh = (split_heads(x, nhead) for x in (q, k, v))
    mesh_for_seq = policy.active_mesh()
    if (mesh_for_seq is not None
            and policy.mesh_axis_size(mesh_for_seq, "seq") > 1):
        seed = None
        if impl == "pallas" and dropout_rate > 0.0 \
                and dropout_rng is not None:
            seed = jax.random.bits(dropout_rng, (1,), "uint32") \
                .astype(jnp.int32)
        if dropout_rng is None:
            dropout_rate = 0.0
        out = _attn_seq_sharded(qh, kh, vh, mesh_for_seq, impl,
                                dropout_rate, dropout_rng, seed)
        if out is not None:
            return merge_heads(out)
        if impl == "pallas":
            # Indivisible time axis: the only safe lowering under a sharded
            # mesh is the GSPMD-partitionable XLA path.
            _logger.warning(
                "flash attention demoted to XLA dense: 'seq' axis (%d) does "
                "not divide time axes Tq=%d/Tk=%d — the measured flash win "
                "is lost for this program",
                policy.mesh_axis_size(mesh_for_seq, "seq"),
                qh.shape[2], kh.shape[2])
            impl = "xla"
    if impl == "pallas":
        from av_separation_tpu.ops.pallas.attention import flash_attention
        seed = None
        if dropout_rate > 0.0 and dropout_rng is not None:
            # In-kernel probability dropout: the mask is regenerated per
            # tile in fwd and bwd, so the T x T mask never materializes.
            # The kernel's stream is seeded from the step's dropout key
            # (distribution-equivalent to XLA-path dropout; no bit-parity
            # requirement between impls).
            seed = jax.random.bits(dropout_rng, (1,), "uint32") \
                .astype(jnp.int32)
        else:
            dropout_rate = 0.0
        mesh = policy.active_mesh()
        if mesh is not None and policy.mesh_axis_size(
                mesh, "data", "fsdp", "model") > 1:
            out = _flash_sharded(qh, kh, vh, mesh, dropout_rate, seed)
            if out is None:  # mesh can't divide batch/heads — GSPMD path
                _logger.warning(
                    "flash attention demoted to XLA dense: mesh %s cannot "
                    "divide batch=%d/heads=%d — the measured flash win is "
                    "lost for this program",
                    dict(mesh.shape), qh.shape[0], qh.shape[1])
                out = attention_xla(qh, kh, vh, dropout_rate, dropout_rng)
        elif dropout_rate > 0.0:
            out = flash_attention(qh, kh, vh, dropout_rate=dropout_rate,
                                  dropout_seed=seed)
        else:
            out = flash_attention(qh, kh, vh)
    else:
        out = attention_xla(qh, kh, vh, dropout_rate, dropout_rng)
    return merge_heads(out)
