"""Shared building blocks: positional encoding, torch-semantics BatchNorm,
multi-head attention module, and the pre-norm transformer encoder stack.

These reproduce the reference's *behavioral contract* (so that reference torch
weights transplant into this model bit-for-bit at eval time) while being
implemented as idiomatic JAX/flax modules:

- Sinusoidal PE computed on the fly at trace time (no `max_len=5000` table cap
  as in reference model.py:286 — any sequence length works).
- BatchNorm with torch `nn.BatchNorm2d` training/eval semantics (reference
  model.py:83-90): biased variance for normalization, unbiased for the running
  estimate, torch-style momentum 0.1.
- TransformerEncoderLayer with `norm_first=True` and the torch default ReLU
  activation (reference model.py:48-52).
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from av_separation_tpu.ops.activations import relu as relu_saveout
from av_separation_tpu.ops.activations import relu_dropout
from av_separation_tpu.ops.attention import multi_head_attention
from av_separation_tpu.ops.dropout import Dropout as FastDropout


# ---------------------------------------------------------------------------
# Initializers matching torch defaults (keeps training dynamics comparable)
# ---------------------------------------------------------------------------

def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)).

    flax Dense kernels are (fan_in, fan_out); conv kernels are
    (*spatial, fan_in_ch, fan_out) — fan_in = prod(shape[:-1]).
    """
    fan_in = int(np.prod(shape[:-1]))
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def dense(features: int, fan_in: int, name: str, dtype=None) -> nn.Dense:
    return nn.Dense(features, name=name, dtype=dtype,
                    kernel_init=torch_linear_kernel_init,
                    bias_init=torch_bias_init(fan_in))


# ---------------------------------------------------------------------------
# Positional encoding
# ---------------------------------------------------------------------------

def sinusoidal_pe(seq_len: int, d_model: int, dtype=jnp.float32) -> jnp.ndarray:
    """Standard interleaved sin/cos PE table (seq_len, d_model).

    Matches reference model.py:290-298 numerically, but is computed on demand —
    there is no max_len cap; long-utterance configs get exact PEs for free.
    """
    position = np.arange(seq_len, dtype=np.float64)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float64)
                      * (-math.log(10000.0) / d_model))
    pe = np.zeros((seq_len, d_model), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return jnp.asarray(pe, dtype=dtype)


class PositionalEncoding(nn.Module):
    """Add sinusoidal PE then dropout (reference model.py:283-301)."""

    d_model: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True):
        x = x + sinusoidal_pe(x.shape[-2], self.d_model, x.dtype)
        return FastDropout(self.dropout)(x, deterministic=deterministic)


# ---------------------------------------------------------------------------
# BatchNorm with torch semantics
# ---------------------------------------------------------------------------

class TorchBatchNorm(nn.Module):
    """BatchNorm over all axes except the last (channel) axis.

    Torch `nn.BatchNorm2d` semantics: in training, normalize with the *biased*
    batch variance and update running stats with the *unbiased* variance using
    `running = (1 - momentum) * running + momentum * batch` (momentum=0.1);
    in eval, normalize with the running stats.
    """

    features: int
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, use_running_average: bool):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,), jnp.float32))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=axes)
            var = jnp.mean(jnp.square(xf - mean), axis=axes)  # biased
            n = int(np.prod([x.shape[a] for a in axes]))
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased

        inv = jax.lax.rsqrt(var + self.eps)
        y = (x - mean) * (inv * scale) + bias
        return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Multi-head attention module (torch nn.MultiheadAttention weight layout
# factored into separate q/k/v Dense for clean TP sharding)
# ---------------------------------------------------------------------------

class _DenseParams(nn.Module):
    """Raw kernel+bias holder with nn.Dense's exact parameter tree
    (names, shapes, initializers) — lets MultiHeadAttention fuse the
    q/k/v projections at trace time without changing the checkpoint
    layout or the TP PartitionSpecs (mesh.py matches by name)."""

    fan_in: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", torch_linear_kernel_init,
                            (self.fan_in, self.features))
        bias = self.param("bias", torch_bias_init(self.fan_in),
                          (self.features,))
        return kernel, bias


class MultiHeadAttention(nn.Module):
    """Projected MHA; `q_in` supplies queries, `kv_in` keys and values.

    The q/k/v/out projections keep separate PARAMETERS so each carries its
    own PartitionSpec (heads sharded over the 'model' mesh axis) and
    reference torch in_proj weights transplant by slicing rows (see
    tests/transplant.py) — but for SELF-attention (q_in is kv_in) the
    three projections run as ONE (d, 3d) matmul on a trace-time weight
    concat: per-output-column math is identical, and the step drops two
    small-matmul dispatches per attention block (the demo config is
    op-count-bound — bench_results/profile_demo_auto.jsonl).
    `dtype` is the computation dtype (params stay float32); softmax
    statistics accumulate in f32 inside the attention op regardless.
    """

    d_model: int
    nhead: int
    dropout: float = 0.0
    impl: str = "xla"
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, q_in, kv_in, *, deterministic: bool = True):
        d = self.d_model
        wq, bq = _DenseParams(d, d, name="q_proj")()
        wk, bk = _DenseParams(d, d, name="k_proj")()
        wv, bv = _DenseParams(d, d, name="v_proj")()
        cdt = q_in.dtype if self.dtype is None else jnp.dtype(self.dtype)

        def proj(x, w, b):
            return x.astype(cdt) @ w.astype(cdt) + b.astype(cdt)

        if q_in is kv_in:
            w = jnp.concatenate([wq, wk, wv], axis=1)
            b = jnp.concatenate([bq, bk, bv])
            qkv = proj(q_in, w, b)
            q = qkv[..., :d]
            k = qkv[..., d:2 * d]
            v = qkv[..., 2 * d:]
        else:
            q = proj(q_in, wq, bq)
            k = proj(kv_in, wk, bk)
            v = proj(kv_in, wv, bv)
        rate = 0.0 if deterministic else self.dropout
        rng = self.make_rng("dropout") if rate > 0.0 else None
        out = multi_head_attention(q, k, v, self.nhead, impl=self.impl,
                                   dropout_rate=rate, dropout_rng=rng)
        return dense(d, d, "out_proj", self.dtype)(out)


# ---------------------------------------------------------------------------
# Pre-norm transformer encoder (self-attention) stack
# ---------------------------------------------------------------------------

class TransformerEncoderLayer(nn.Module):
    """Pre-norm self-attention block, torch `nn.TransformerEncoderLayer`
    (norm_first=True, ffn=4*d, default ReLU) semantics
    (reference model.py:48-52)."""

    d_model: int
    nhead: int
    dropout: float = 0.1
    attn_impl: str = "xla"
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d = self.d_model
        drop = lambda name: FastDropout(self.dropout, name=name)
        h = nn.LayerNorm(epsilon=1e-5, name="norm1", dtype=self.dtype)(x)
        h = MultiHeadAttention(d, self.nhead, self.dropout, self.attn_impl,
                               self.dtype, name="self_attn")(
            h, h, deterministic=deterministic)
        x = x + drop("drop1")(h, deterministic=deterministic)

        h = nn.LayerNorm(epsilon=1e-5, name="norm2", dtype=self.dtype)(x)
        h = dense(4 * d, d, "linear1", self.dtype)(h)
        # Fused relu+dropout: one (B, T, 4d) residual instead of two
        # (ops/activations.py) — same 'dropout' rng collection draw order
        # as the unfused FastDropout("drop_ff") it replaces.
        rate = 0.0 if deterministic else self.dropout
        rng = self.make_rng("dropout") if rate > 0.0 else None
        h = relu_dropout(h, rate, rng)
        h = dense(d, 4 * d, "linear2", self.dtype)(h)
        x = x + drop("drop2")(h, deterministic=deterministic)
        return x


class TransformerEncoder(nn.Module):
    """Stack of pre-norm encoder layers (no final norm, as in the reference's
    `nn.TransformerEncoder(encoder_layer, num_layers)` without a norm arg)."""

    d_model: int
    nhead: int
    num_layers: int
    dropout: float = 0.1
    attn_impl: str = "xla"
    remat: bool = False
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        layer_cls = TransformerEncoderLayer
        if self.remat:
            # deterministic is passed positionally (argnum 2; the module is
            # argnum 0) so jax.checkpoint treats it as static.
            layer_cls = nn.remat(TransformerEncoderLayer,
                                 static_argnums=(2,))
        for i in range(self.num_layers):
            x = layer_cls(self.d_model, self.nhead, self.dropout,
                          self.attn_impl, self.dtype, name=f"layer_{i}")(
                x, deterministic)
        return x
