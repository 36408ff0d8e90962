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
    large enough that residual traffic dominates (Tq*Tk >= 256^2, the
    measured crossover: flash wins 115.6 -> 79.1 ms/step at scaled T=501
    but loses ~5% at demo T=63); 'xla' otherwise (including CPU/GPU
    backends, where the Mosaic kernel doesn't compile).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


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


# Minimum Tq*Tk for 'auto' to pick the flash kernel: at/above this the
# XLA path's materialized probability residuals + dropout masks dominate
# the backward (measured on v5e, see module docstring); below it the dense
# path's better small-shape pipelining wins.
AUTO_MIN_SCORE_ELEMS = 256 * 256


def resolve_attn_impl(impl: str, tq: int, tk: int) -> str:
    """Resolve an attention impl selector at trace time.

    'auto' -> 'pallas' on the TPU backend when the score matrix has at least
    AUTO_MIN_SCORE_ELEMS elements, else 'xla'.  Explicit selectors pass
    through unchanged.
    """
    if impl != "auto":
        return impl
    if jax.default_backend() != "tpu":
        return "xla"
    return "pallas" if tq * tk >= AUTO_MIN_SCORE_ELEMS else "xla"


def multi_head_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         nhead: int, *, impl: str = "xla",
                         dropout_rate: float = 0.0,
                         dropout_rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """Projected-QKV multi-head attention on (B, T, d) tensors."""
    impl = resolve_attn_impl(impl, q.shape[1], k.shape[1])
    qh, kh, vh = (split_heads(x, nhead) for x in (q, k, v))
    if impl == "pallas":
        from av_separation_tpu.ops.pallas.attention import flash_attention
        if dropout_rate > 0.0 and dropout_rng is not None:
            # In-kernel probability dropout: the hardware PRNG regenerates
            # the mask per tile in fwd and bwd, so the T x T mask never
            # materializes.  The kernel's stream is seeded from the step's
            # dropout key (distribution-equivalent to XLA-path dropout; no
            # bit-parity requirement between impls).
            seed = jax.random.bits(dropout_rng, (1,), "uint32") \
                .astype(jnp.int32)
            out = flash_attention(qh, kh, vh, dropout_rate=dropout_rate,
                                  dropout_seed=seed)
        else:
            out = flash_attention(qh, kh, vh)
    else:
        out = attention_xla(qh, kh, vh, dropout_rate, dropout_rng)
    return merge_heads(out)
