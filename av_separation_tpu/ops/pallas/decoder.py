"""Fused separation-decoder Pallas TPU kernel.

Fuses the reference decoder's whole tail (reference model.py:194-220):
Linear(d -> 2d) + GELU + Linear(2d -> S*F) + sigmoid + mask-apply, in a single
VMEM-resident kernel per time tile — the (B, T, 2d) GELU activation and the
(B, T, S*F) pre-sigmoid logits never round-trip to HBM.

Weights are kept fully resident in VMEM (fine for d_model <= 512; the XLA
path serves larger models).  The per-speaker mask columns are padded to the
128-lane boundary outside the kernel so the (tile_T, S, F_pad) reshape stays
tiling-aligned.

Forward runs as the Pallas kernel; the backward pass of the custom VJP uses
the straightforward XLA matmul chain (recomputing the cheap first Linear) —
gradient work is matmul-dominated and XLA is already at roofline there.

Returns (separated, masks) in the reference layout (B, S, F, T).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _erf(x):
    """erf via Abramowitz-Stegun 7.1.26 (max error 1.5e-7 — at f32 epsilon).

    Neither erf nor erfc lowers in the Pallas TPU Mosaic backend, so the
    kernel carries its own f32-exact rational approximation.
    """
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x):
    # Exact (erf-form) GELU; matches jax.nn.gelu(approximate=False) to f32.
    return 0.5 * x * (1.0 + _erf(x * np.float32(0.7071067811865476)))


def _decoder_kernel(h_ref, w1_ref, b1_ref, w2_ref, b2_ref, mixed_ref,
                    sep_ref, mask_ref, *, num_speakers: int):
    h = h_ref[0]  # (tile_t, d)
    a = _gelu(jnp.dot(h, w1_ref[:], preferred_element_type=jnp.float32)
              + b1_ref[:])
    logits = (jnp.dot(a, w2_ref[:], preferred_element_type=jnp.float32)
              + b2_ref[:])  # (tile_t, S*F_pad)
    m = jax.nn.sigmoid(logits)
    mask_ref[0] = m.astype(mask_ref.dtype)
    tile_t = m.shape[0]
    f_pad = m.shape[1] // num_speakers
    m3 = m.reshape(tile_t, num_speakers, f_pad)
    sep = m3 * mixed_ref[0][:, None, :]  # (tile_t, S, F_pad)
    sep_ref[0] = sep.reshape(tile_t, num_speakers * f_pad).astype(
        sep_ref.dtype)


def _decoder_pallas_fwd(h, w1, b1, w2p, b2p, mixed_tf, num_speakers,
                        tile_t):
    """h (B, T_pad, d); w2p/b2p pre-padded to S*F_pad columns;
    mixed_tf (B, T_pad, F_pad).  Returns sep/masks as (B, T_pad, S*F_pad)."""
    b, t_pad, d = h.shape
    sf_pad = w2p.shape[1]
    nt = t_pad // tile_t
    two_d = w1.shape[1]

    sep, masks = pl.pallas_call(
        functools.partial(_decoder_kernel, num_speakers=num_speakers),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, tile_t, d), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_t, sf_pad // num_speakers),
                         lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_t, sf_pad), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_t, sf_pad), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((b, t_pad, sf_pad), h.dtype)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(h, w1, b1.reshape(1, -1), w2p, b2p.reshape(1, -1), mixed_tf)
    return sep, masks


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_mask_decoder(fused, w1, b1, w2, b2, mixed_spec,
                       num_speakers: int, freq_bins: int):
    sep, masks = _fwd_impl(fused, w1, b1, w2, b2, mixed_spec,
                           num_speakers, freq_bins)
    return sep, masks


def _pad_cols_per_speaker(w2, b2, num_speakers, freq_bins, f_pad):
    """(…, S*F) -> (…, S*F_pad): pad each speaker's F block to F_pad."""
    w3 = w2.reshape(*w2.shape[:-1], num_speakers, freq_bins)
    pads = [(0, 0)] * (w3.ndim - 1) + [(0, f_pad - freq_bins)]
    w3 = jnp.pad(w3, pads)
    b3 = jnp.pad(b2.reshape(num_speakers, freq_bins),
                 ((0, 0), (0, f_pad - freq_bins)))
    return (w3.reshape(*w2.shape[:-1], num_speakers * f_pad),
            b3.reshape(num_speakers * f_pad))


def _fwd_impl(fused, w1, b1, w2, b2, mixed_spec, num_speakers, freq_bins):
    b, t, d = fused.shape
    f_pad = _cdiv(freq_bins, 128) * 128
    tile_t = min(128, _cdiv(t, 8) * 8)
    t_pad = _cdiv(t, tile_t) * tile_t

    h = jnp.pad(fused, ((0, 0), (0, t_pad - t), (0, 0)))
    w2p, b2p = _pad_cols_per_speaker(w2, b2, num_speakers, freq_bins, f_pad)
    # mixed (B, F, T) -> (B, T_pad, F_pad), time-major like the MLP rows.
    mixed_tf = jnp.swapaxes(mixed_spec, -1, -2)
    mixed_tf = jnp.pad(mixed_tf, ((0, 0), (0, t_pad - t),
                                  (0, f_pad - freq_bins)))

    sep_flat, mask_flat = _decoder_pallas_fwd(
        h.astype(jnp.float32), w1, b1, w2p, b2p, mixed_tf,
        num_speakers, tile_t)

    def unflatten(x):
        x = x.reshape(b, t_pad, num_speakers, f_pad)
        x = x[:, :t, :, :freq_bins]
        return x.transpose(0, 2, 3, 1)  # (B, S, F, T)

    return unflatten(sep_flat), unflatten(mask_flat)


def _fwd_rule(fused, w1, b1, w2, b2, mixed_spec, num_speakers, freq_bins):
    sep, masks = _fwd_impl(fused, w1, b1, w2, b2, mixed_spec,
                           num_speakers, freq_bins)
    return (sep, masks), (fused, w1, b1, w2, b2, mixed_spec, masks)


def _bwd_rule(num_speakers, freq_bins, res, grads):
    fused, w1, b1, w2, b2, mixed_spec, masks = res
    g_sep, g_mask = grads
    # d(sep)/d(mask) = mixed; fold into one mask cotangent.
    g_masks = g_mask + g_sep * mixed_spec[:, None]
    g_mixed = jnp.sum(g_sep * masks, axis=1)

    # masks = sigmoid(logits) with logits laid out (B, T, S, F) pre-permute.
    d_logits = (g_masks * masks * (1.0 - masks)).transpose(0, 3, 1, 2)
    b, t, s, f = d_logits.shape
    d_logits = d_logits.reshape(b, t, s * f)

    pre = jnp.einsum("btd,dh->bth", fused, w1) + b1
    a = _gelu(pre)
    g_a = jnp.einsum("bto,ho->bth", d_logits, w2)
    g_w2 = jnp.einsum("bth,bto->ho", a, d_logits)
    g_b2 = jnp.sum(d_logits, axis=(0, 1))
    g_pre = g_a * _gelu_grad(pre)
    g_fused = jnp.einsum("bth,dh->btd", g_pre, w1)
    g_w1 = jnp.einsum("btd,bth->dh", fused, g_pre)
    g_b1 = jnp.sum(g_pre, axis=(0, 1))
    return g_fused, g_w1, g_b1, g_w2, g_b2, g_mixed


def _gelu_grad(x):
    # d/dx [x * Phi(x)] = Phi(x) + x * phi(x), exact (erf) GELU.
    phi = jnp.exp(-0.5 * x * x) / np.sqrt(2.0 * np.pi)
    cdf = 0.5 * (1.0 + jax.lax.erf(x / np.sqrt(2.0)))
    return cdf + x * phi


fused_mask_decoder.defvjp(_fwd_rule, _bwd_rule)
