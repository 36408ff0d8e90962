"""Sequence parallelism for long utterances (SURVEY.md §5 long-context tier).

The reference materializes full dense T x T attention through torch MHA and
caps sequences at its PE table's max_len=5000 (reference model.py:48-52,286).
Here long sequences shard the *time* axis across the mesh:

- `sequence_parallel_attention`: each shard holds a T/n block of queries and
  all-gathers K/V over ICI before a local (blockwise-capable) attention.
  For the fusion stack's cross-attention this is the cheap direction the
  survey calls out: KV comes from the *visual* stream (N frames << T), so
  the gathered KV is tiny while the audio-length activations stay sharded.
- `ring_attention`: K/V blocks rotate around the ring via
  `jax.lax.ppermute` with online-softmax accumulation — O(T/n) memory per
  chip for self-attention when even gathered KV would blow HBM.

Both are shard_map programs over an existing mesh axis and compose with the
DP axis; outputs stay sharded like the queries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from av_separation_tpu.ops.attention import merge_heads, split_heads


def sequence_parallel_attention(q: jnp.ndarray, k: jnp.ndarray,
                                v: jnp.ndarray, nhead: int, mesh: Mesh,
                                axis: str = "model",
                                impl: str = "xla") -> jnp.ndarray:
    """All-gather-KV sequence parallelism on (B, T, d) tensors.

    Queries stay sharded over `axis` along T; K/V are gathered once over ICI.
    Equivalent to dense attention (gated in tests/test_sequence.py).
    """
    from av_separation_tpu.ops.attention import multi_head_attention

    def local(q_blk, k_blk, v_blk):
        k_full = jax.lax.all_gather(k_blk, axis, axis=1, tiled=True)
        v_full = jax.lax.all_gather(v_blk, axis, axis=1, tiled=True)
        return multi_head_attention(q_blk, k_full, v_full, nhead, impl=impl)

    spec = P(None, axis, None)
    return jax.shard_map(local, mesh=mesh,
                         in_specs=(spec, spec, spec), out_specs=spec)(q, k, v)


def make_sp_forward(model, mesh: Mesh, axis: str = "model"):
    """Sequence-parallel full-model inference via GSPMD: jit the forward with
    the spectrogram's time axis sharded over `axis` and let XLA partition
    every downstream op (conv halos, attention, the visual->audio
    interpolation gather) and insert the ICI collectives.

    This is the idiomatic alternative to hand-written shard_map for the
    end-to-end path; the explicit all-gather/ring kernels above remain for
    when the collective schedule must be controlled manually.

    Returns fn(variables, mixed_spec (B,F,T), lip_frames) -> (sep, masks)
    with outputs sharded over T.
    """
    in_sh = (None,
             NamedSharding(mesh, P(None, None, axis)),     # (B, F, T)
             NamedSharding(mesh, P()))                      # lip frames
    out_sh = NamedSharding(mesh, P(None, None, None, axis))  # (B, S, F, T)

    def fwd(variables, mixed_spec, lip_frames):
        return model.apply(variables, mixed_spec, lip_frames,
                           deterministic=True)

    return jax.jit(fwd, in_shardings=in_sh, out_shardings=(out_sh, out_sh))


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   nhead: int, mesh: Mesh, axis: str = "model"
                   ) -> jnp.ndarray:
    """Ring self/cross attention: K/V blocks rotate via ppermute; each hop
    overlaps the collective with the local block's attention math.  Online
    softmax (running max/denominator) keeps exact equivalence with dense
    attention at O(T/n) activation memory per chip."""
    n_shards = mesh.shape[axis]

    def local(q_blk, k_blk, v_blk):
        qh = split_heads(q_blk, nhead)      # (B, H, Tq/n, dh)
        kh = split_heads(k_blk, nhead)      # (B, H, Tk/n, dh)
        vh = split_heads(v_blk, nhead)
        dh = qh.shape[-1]
        scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32))

        def hop(carry, _):
            kh_cur, vh_cur, m, l, acc = carry
            s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh_cur,
                           preferred_element_type=jnp.float32) * scale
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m, m_cur)
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m - m_new)
            l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
            acc_new = acc * alpha + jnp.einsum(
                "bhqk,bhkd->bhqd", p.astype(vh_cur.dtype), vh_cur,
                preferred_element_type=jnp.float32)
            perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
            kh_nxt = jax.lax.ppermute(kh_cur, axis, perm)
            vh_nxt = jax.lax.ppermute(vh_cur, axis, perm)
            return (kh_nxt, vh_nxt, m_new, l_new, acc_new), None

        # Derive the initial accumulators from qh so they carry the same
        # varying-over-`axis` type as the loop outputs (a plain jnp.zeros
        # would be device-invariant and fail scan's carry type check).
        m0 = qh[..., :1].astype(jnp.float32) * 0.0 - 1e30
        l0 = qh[..., :1].astype(jnp.float32) * 0.0
        acc0 = qh.astype(jnp.float32) * 0.0
        (kh, vh, m, l, acc), _ = jax.lax.scan(
            hop, (kh, vh, m0, l0, acc0), None, length=n_shards)
        out = (acc / l).astype(q_blk.dtype)
        return merge_heads(out)

    spec = P(None, axis, None)
    return jax.shard_map(local, mesh=mesh,
                         in_specs=(spec, spec, spec), out_specs=spec)(q, k, v)
