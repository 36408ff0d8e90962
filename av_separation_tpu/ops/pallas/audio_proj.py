"""Fused audio input-projection Pallas kernel.

The reference projects the spectrogram into model space with two k=3 conv1d
layers + ReLUs (reference model.py:37-42).  In channels-last layout each
conv is three shifted (T, C_in) @ (C_in, C_out) matmuls summed — so the whole
stem is six MXU matmuls.  This kernel runs both layers for a time tile
entirely in VMEM (halo of 2 frames), so the (T, d) ReLU intermediate never
round-trips to HBM:

    h  = relu( sum_tap x[t+tap-1] @ W1[tap] + b1 )     # on tile + halo
    y  = relu( sum_tap h[t+tap-1] @ W2[tap] + b2 )     # on tile

Forward is the Pallas kernel; backward (custom VJP) uses the XLA conv-grad
chain, which is already matmul-roofline.  Zero-padding semantics match
torch's padding=1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _proj_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, h_ref,
                 *, tile_t: int, t_total: int):
    """x_ref: (1, T_pad + 4, F) — the sample's full zero-padded row (halo
    tiles overlap, which BlockSpec block-unit indexing can't express, so the
    tile+halo slice happens here).  o_ref: (1, tile_t, d); h_ref emits the
    tile's hidden activation (the backward's only residual beyond x/y)."""
    ti = pl.program_id(1)
    x = x_ref[0, pl.ds(ti * tile_t, tile_t + 4), :].astype(jnp.float32)

    def conv(src, w_ref, b_ref, rows):
        # src: (rows + 2, C_in); returns relu(conv)(rows, C_out)
        acc = b_ref[:]
        for tap in range(3):
            acc = acc + jnp.dot(src[tap:tap + rows],
                                w_ref[tap],
                                preferred_element_type=jnp.float32)
        return jnp.maximum(acc, 0.0)

    h = conv(x, w1_ref, b1_ref, tile_t + 2)       # (tile_t+2, d)
    # Torch's second conv zero-pads the HIDDEN activation: rows of h that
    # fall outside [0, T) must be exactly 0, not relu(b1) from the padded
    # input — mask them (row j holds h at time  ti*tile_t + j - 1).
    u = (ti * tile_t - 1) + jax.lax.broadcasted_iota(
        jnp.int32, (tile_t + 2, 1), dimension=0)
    h = jnp.where((u >= 0) & (u < t_total), h, 0.0)
    h_ref[0] = h[1:tile_t + 1].astype(h_ref.dtype)
    y = conv(h, w2_ref, b2_ref, tile_t)           # (tile_t, d)
    o_ref[0] = y.astype(o_ref.dtype)


def _fwd_impl(x, w1, b1, w2, b2):
    """x: (B, T, F); w: (3, C_in, C_out); returns (y, h): (B, T, d) each."""
    b, t, f = x.shape
    d = w1.shape[-1]
    tile_t = min(128, _cdiv(t, 8) * 8)
    t_pad = _cdiv(t, tile_t) * tile_t
    # Global halo: 2 zero frames each side (conv1's pad=1 plus conv2's
    # pad=1); also pad T up to the tile multiple.
    x_p = jnp.pad(x, ((0, 0), (2, 2 + t_pad - t), (0, 0)))
    nt = t_pad // tile_t

    tile_spec = pl.BlockSpec((1, tile_t, d), lambda bi, ti: (bi, ti, 0),
                             memory_space=pltpu.VMEM)
    out, hid = pl.pallas_call(
        functools.partial(_proj_kernel, tile_t=tile_t, t_total=t),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, t_pad + 4, f), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[tile_spec, tile_spec],
        out_shape=[jax.ShapeDtypeStruct((b, t_pad, d), x.dtype)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(x_p, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))
    return out[:, :t], hid[:, :t]


def _xla_reference(x, w1, b1, w2, b2):
    """Same math in plain XLA (used for the backward pass and gating)."""
    def conv(src, w, bias):
        padded = jnp.pad(src, ((0, 0), (1, 1), (0, 0)))
        acc = bias
        t = src.shape[1]
        for tap in range(3):
            acc = acc + jnp.einsum("btf,fd->btd", padded[:, tap:tap + t], w[tap])
        return jax.nn.relu(acc)

    return conv(conv(x, w1, b1), w2, b2)


def _frames3(t_arr):
    """(B, T, C) -> (B, T, 3, C): tap k of row t reads t_pad[t + k] under
    zero 'same' padding — the conv's operand view as three shifted slices
    (same slice trick as ops/stft.py frame_signal)."""
    padded = jnp.pad(t_arr, ((0, 0), (1, 1), (0, 0)))
    t = t_arr.shape[1]
    return jnp.stack([padded[:, k:k + t] for k in range(3)], axis=2)


@jax.custom_vjp
def fused_audio_projection(x, w1, b1, w2, b2):
    return _fwd_impl(x, w1, b1, w2, b2)[0]


def _fwd_rule(x, w1, b1, w2, b2):
    y, h = _fwd_impl(x, w1, b1, w2, b2)
    return y, (x, h, y, w1, w2)


def _bwd_rule(res, g):
    """Explicit framed-einsum conv gradients — no forward replay.

    The previous backward re-ran the XLA forward inside jax.vjp (15 small
    dispatches, ~0.8 ms/step of the scaled config); here the ReLU masks
    come from the SAVED activations (h, y — the kernel's own outputs) and
    each conv's dgrad/wgrad is ONE big einsum over a 3-tap framed view.
      dgrad:  dx[t] = sum_k dpre[t + 1 - k] @ W[k].T
            = sum_k frames3(dpre)[t, 2 - k] @ W[k].T
      wgrad:  dW[k] = sum_{b,t} frames3(src)[b, t, k].T dpre[b, t]
    f32 accumulation via preferred_element_type; cotangents come back in
    the inputs' dtypes (matching jax.vjp's convention).
    """
    x, h, y, w1, w2 = res
    f32 = jnp.float32
    gp = (g.astype(f32) * (y > 0)).astype(g.dtype)        # d_preact2
    db2 = jnp.sum(gp.astype(f32), axis=(0, 1))
    h3 = _frames3(h)
    dw2 = jnp.einsum("btkf,btd->kfd", h3, gp,
                     preferred_element_type=f32)
    g3 = _frames3(gp)[:, :, ::-1]                          # tap-reversed
    dh = jnp.einsum("btkd,kfd->btf", g3, w2.astype(gp.dtype),
                    preferred_element_type=f32)
    gp1 = (dh * (h > 0)).astype(g.dtype)                   # d_preact1
    db1 = jnp.sum(gp1.astype(f32), axis=(0, 1))
    x3 = _frames3(x)
    dw1 = jnp.einsum("btkf,btd->kfd", x3, gp1,
                     preferred_element_type=f32)
    g13 = _frames3(gp1)[:, :, ::-1]
    dx = jnp.einsum("btkd,kfd->btf", g13, w1.astype(gp1.dtype),
                    preferred_element_type=f32)
    return (dx.astype(x.dtype), dw1.astype(w1.dtype), db1.astype(f32),
            dw2.astype(w2.dtype), db2.astype(f32))


fused_audio_projection.defvjp(_fwd_rule, _bwd_rule)
