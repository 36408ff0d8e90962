"""Fused visual conv stem: stride-2 3x3 convs + train-mode BatchNorm + ReLU
as Pallas TPU kernels with a custom VJP.

Replaces the XLA lowering of the reference's per-frame backbone (reference
model.py:81-92: three stride-2 Conv2d(3x3) -> BatchNorm2d -> ReLU stages,
1->32->64->128 channels) for TRAINING.  Measured motivation (r3/r4 profile
artifacts, v5e):

  - lrs2 (96x96 frames): the XLA stem is 9.8 ms of a 27.3 ms step (36%) —
    bench_results/profile_lrs2_auto.jsonl.
  - demo (32x32 frames): 2.17 ms of a 5.83 ms step (37%) —
    bench_results/profile_demo_auto.jsonl.

  The cost is NOT conv FLOPs (conv2/3 reach only 10-20%% MFU, conv1 0.6%%)
  but memory passes: XLA runs conv / BN-stats / BN-apply+ReLU as separate
  HBM round trips per layer, and the stride-2 transposed-conv backward adds
  more.  This module fuses per layer: the conv kernel applies the PREVIOUS
  layer's BN+ReLU to its input tile in VMEM (prologue), computes the conv
  as one implicit-im2col matmul on the MXU, and emits the raw conv output
  plus the per-channel batch statistics the BN needs — so the normalized
  activation never materializes in HBM and the stats passes disappear.

Key layout trick: a stride-2 3x3 'SAME' conv becomes NINE stride-1 tap
reads after an even/odd space-to-depth split, done ON VALUES in VMEM
(zero-pad + reshape + STATIC slice — no strided memory access, which
Mosaic lacks): after a 1-pixel pad, padded input row 2p+dy is plane
a=dy%%2 at block row p + dy//2.  Each tap is an (F*Ho*Wo, Cin) matrix fed
to one of nine accumulating f32 MXU matmuls (a single lane-axis concat
into a K=9*Cin matrix is rejected by Mosaic with an offset-mismatch
error, and roll+mask shifts compile pathologically slowly).

Backward (the bulk of the XLA cost) has two kernels per layer:
  - wgrad: patches(prologue-recomputed input)^T @ g, accumulated in a
    (9*Cin, Cout) f32 VMEM scratch across the sequential frame grid.
  - dgrad: g @ w^T -> d(patches), scatter-added back into the input-shaped
    gradient by inverting the nine tap shifts, then multiplied by the
    recomputed ReLU mask in the epilogue, emitting h = d(BN output) plus
    the two per-channel reductions (sum h, sum h*x_hat) that the train-BN
    backward needs — XLA then finishes the (elementwise) BN backward.

conv1 (C_in=1) stays on XLA: its degenerate channel depth defeats both the
MXU and healthy VMEM layouts, and it is a small share of the cost; its
weight gradient comes from jax.vjp of the same XLA conv.

Semantics match the XLA path exactly in f32 (gated in tests/test_kernels.py
interpret mode) and to bf16 tolerance on chip (tools/verify_kernels_tpu.py):
conv accumulates f32 and rounds to the compute dtype; BN statistics are
computed from the ROUNDED conv output in f32 (what the XLA path's separate
BN layer sees); BN normalize runs in f32 and casts before ReLU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# (plane parity a, block offset o) per kernel tap offset d in {0, 1, 2}
# AFTER 1-pixel zero padding: padded input row rp = 2p + d = 2*(p + o) + a.
_TAP = {0: (0, 0), 1: (1, 0), 2: (0, 1)}

# Raised scoped-VMEM limit for these kernels: the unrolled parity-split /
# tap-slice chain makes Mosaic's stack allocator hold many live relayout
# copies (measured 74 MB at fb=6 on the 48x48x32 layer vs the 16 MB
# default), and v5e has 128 MB of physical VMEM — so give the kernels
# most of it rather than shrinking fb to 1 (more, smaller programs would
# pay the pipeline bubble instead).
_VMEM_LIMIT = 96 * 1024 * 1024


def _pick_fb(f: int, ho: int, wo: int, in_elems_per_frame: int = 0,
             max_rows: int = 4096, max_fb: int = 8) -> int:
    """Largest divisor of `f` keeping the im2col row count <= max_rows,
    fb <= max_fb, AND the input block under ~250k elements.  The caps are
    MOSAIC COMPILE-TIME constraints, not perf choices: the parity-split
    relayouts unroll per leading-dim element (compile time explodes
    superlinearly in fb — fb=48 OOM-killed the compile helper), and the
    unrolled live set also scales with the block (the 48x48x32 layer at
    fb=6 needs 74 MB of kernel VMEM stack and ~11 min of compile; its
    wgrad at fb=6 OOM-killed the compiler outright).  Grid steps on a TPU
    core are pipelined loop iterations, not dispatches, so many small
    programs are cheap."""
    cap = max(1, min(max_rows // (ho * wo), max_fb))
    if in_elems_per_frame:
        cap = max(1, min(cap, 250_000 // in_elems_per_frame))
    best = 1
    for d in range(1, min(f, cap) + 1):
        if f % d == 0:
            best = d
    return best


def _tap_mats(x: jnp.ndarray, fb: int, hp: int, wp: int, cin: int):
    """(Fb, H, W, Cin) -> nine (Fb*Hp*Wp, Cin) implicit-im2col tap
    matrices, tap-major (dy, dx) to match w.reshape(9*Cin, Cout) rows.

    Everything is zero-pad + reshape + STATIC slice: after a 1-pixel pad
    the stride-2 taps become even/odd plane selections at block offsets
    {0, 1}.  (Two rejected formulations, both real Mosaic failures: a
    9-way lane-axis concat of the taps dies with an offset-mismatch
    error, and roll+iota-mask shifts compile pathologically slowly.)

    The conv then runs as nine accumulating K=Cin matmuls rather than one
    K=9*Cin matmul, keeping every operand in its natural layout."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    v = xp.reshape(fb, hp + 1, 2, wp + 1, 2, cin)
    out = []
    for dy in (0, 1, 2):
        a, o = _TAP[dy]
        for dx in (0, 1, 2):
            b, u = _TAP[dx]
            t = v[:, o:o + hp, a, u:u + wp, b, :]
            out.append(t.reshape(fb * hp * wp, cin))
    return out


def _affine_relu(x: jnp.ndarray, scale, bias) -> jnp.ndarray:
    """Recompute the previous layer's BN+ReLU on a raw conv tile: f32
    normalize (folded into per-channel scale/bias), cast to the compute
    dtype, then ReLU — the exact order the XLA path applies."""
    pre = (x.astype(jnp.float32) * scale + bias).astype(x.dtype)
    return jnp.maximum(pre, jnp.zeros_like(pre))


# ---------------------------------------------------------------------------
# Forward: conv (+ input affine+ReLU prologue) + batch-stat emission
# ---------------------------------------------------------------------------

def _fwd_kernel(w_ref, cb_ref, sc_ref, bi_ref, x_ref, y_ref, st_ref,
                acc, *, fb: int, hp: int, wp: int, cin: int, cout: int,
                prologue: bool):
    f = pl.program_id(0)

    @pl.when(f == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    x = x_ref[...]
    if prologue:
        x = _affine_relu(x, sc_ref[...], bi_ref[...])
    y = cb_ref[...] * jnp.ones((fb * hp * wp, 1), jnp.float32)
    for k, t in enumerate(_tap_mats(x, fb, hp, wp, cin)):
        y = y + jax.lax.dot_general(
            t, w_ref[k * cin:(k + 1) * cin, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    yc = y.astype(y_ref.dtype)
    # Stats from the ROUNDED output (what the downstream BN sees).
    yf = yc.astype(jnp.float32)
    acc[0:1, :] += jnp.sum(yf, axis=0, keepdims=True)
    acc[1:2, :] += jnp.sum(yf * yf, axis=0, keepdims=True)
    y_ref[...] = yc.reshape(fb, hp, wp, cout)

    @pl.when(f == pl.num_programs(0) - 1)
    def _():
        st_ref[...] = acc[...]


def _conv_fwd(x, w9, cb, sc, bi, *, prologue: bool):
    """x (F, H, W, Cin) -> (y (F, Hp, Wp, Cout), stats (2, Cout) f32
    [sum, sumsq]).  sc/bi: previous layer's folded BN scale/bias (1, Cin)
    f32 (ignored when prologue=False)."""
    f, h, w_, cin = x.shape
    cout = w9.shape[1]
    hp, wp = h // 2, w_ // 2
    fb = _pick_fb(f, hp, wp, h * w_ * cin)
    kernel = functools.partial(_fwd_kernel, fb=fb, hp=hp, wp=wp, cin=cin,
                               cout=cout, prologue=prologue)
    return pl.pallas_call(
        kernel,
        grid=(f // fb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w (9Cin, Cout)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # conv bias (1, Cout)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # scale (1, Cin)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bias (1, Cin)
            pl.BlockSpec((fb, h, w_, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((fb, hp, wp, cout), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((f, hp, wp, cout), x.dtype),
            jax.ShapeDtypeStruct((2, cout), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2, cout), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT),
    )(w9, cb, sc, bi, x)


# ---------------------------------------------------------------------------
# Backward: weight gradient
# ---------------------------------------------------------------------------

def _wgrad_kernel(sc_ref, bi_ref, x_ref, g_ref, dw_ref, acc, *, fb: int,
                  hp: int, wp: int, cin: int, prologue: bool):
    f = pl.program_id(0)

    @pl.when(f == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    x = x_ref[...]
    if prologue:
        x = _affine_relu(x, sc_ref[...], bi_ref[...])
    g = g_ref[...].reshape(fb * hp * wp, -1)
    for k, t in enumerate(_tap_mats(x, fb, hp, wp, cin)):
        acc[k * cin:(k + 1) * cin, :] += jax.lax.dot_general(
            t, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(f == pl.num_programs(0) - 1)
    def _():
        dw_ref[...] = acc[...]


def _conv_wgrad(x, g, sc, bi, *, prologue: bool):
    """dW (9*Cin, Cout) f32 = im2col(affine_relu(x))^T @ g."""
    f, h, w_, cin = x.shape
    cout = g.shape[-1]
    hp, wp = h // 2, w_ // 2
    fb = _pick_fb(f, hp, wp, h * w_ * cin)
    kernel = functools.partial(_wgrad_kernel, fb=fb, hp=hp, wp=wp,
                               cin=cin, prologue=prologue)
    return pl.pallas_call(
        kernel,
        grid=(f // fb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((fb, h, w_, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fb, hp, wp, cout), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9 * cin, cout), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9 * cin, cout), jnp.float32),
        scratch_shapes=[pltpu.VMEM((9 * cin, cout), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT),
    )(sc, bi, x, g)


# ---------------------------------------------------------------------------
# Backward: data gradient (through the NEXT layer's conv) + ReLU mask +
# BN-backward reductions for the PREVIOUS layer
# ---------------------------------------------------------------------------

def _dgrad_kernel(w_ref, sc_ref, bi_ref, mn_ref, iv_ref, y_ref, g_ref,
                  p00_ref, p01_ref, p10_ref, p11_ref, st_ref, acc, *,
                  fb: int, hp: int, wp: int, cin: int):
    f = pl.program_id(0)

    @pl.when(f == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    g = g_ref[...].reshape(fb * hp * wp, -1)
    # Per tap: d(tap matrix) = g @ w_tap^T, zero-padded back to its
    # position in the HALO plane (pure pad + add — no concat, no roll,
    # no scatter; see _tap_mats for the rejected formulations) and
    # accumulated into the four even/odd plane gradients.
    planes = {}
    for dy in (0, 1, 2):
        a, o = _TAP[dy]
        for dx in (0, 1, 2):
            b, u = _TAP[dx]
            k = dy * 3 + dx
            c = jax.lax.dot_general(
                g, w_ref[k * cin:(k + 1) * cin, :],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            c = c.reshape(fb, hp, wp, cin)
            c = jnp.pad(c, ((0, 0), (o, 1 - o), (u, 1 - u), (0, 0)))
            planes[(a, b)] = c if (a, b) not in planes \
                else planes[(a, b)] + c
    # Apply the previous layer's ReLU mask + a validity mask and emit each
    # plane in HALO shape (hp+1, wp+1) — no cropped (offset-layout) values
    # are reduced or written, which Mosaic rejects ("input layout must
    # have zero offsets over dimensions that are being reduced"); the XLA
    # glue (_interleave_planes) crops.  Plane (a, b) element i holds
    # output row r = 2i + a - 1 (valid i: [1, hp] for a=0, [0, hp) for
    # a=1); the matching y row has parity 1-a at block index i - (1 - a),
    # built here by zero-padding the y parity slice into halo shape.
    yv = y_ref[...].reshape(fb, hp, 2, wp, 2, cin)
    outs = {(0, 0): p00_ref, (0, 1): p01_ref, (1, 0): p10_ref,
            (1, 1): p11_ref}
    for (a, b), plane in planes.items():
        ym = yv[:, :, 1 - a, :, 1 - b, :].astype(jnp.float32)
        ym = jnp.pad(ym, ((0, 0), (1 - a, a), (1 - b, b), (0, 0)))
        row = jax.lax.broadcasted_iota(jnp.int32, plane.shape, 1)
        col = jax.lax.broadcasted_iota(jnp.int32, plane.shape, 2)
        valid = ((row >= 1 - a) & (row < hp + 1 - a)
                 & (col >= 1 - b) & (col < wp + 1 - b))
        # Compare in f32 on the compute-dtype-ROUNDED value (bf16 vector
        # compares are unsupported on this target; the round-trip keeps
        # the mask identical to the XLA path's relu'(bf16 activation)).
        pre = (ym * sc_ref[...] + bi_ref[...]).astype(y_ref.dtype) \
            .astype(jnp.float32)
        hh = jnp.where(valid & (pre > 0), plane, 0.0)
        xhat = (ym - mn_ref[...]) * iv_ref[...]
        acc[0:1, :] += jnp.sum(hh, axis=(0, 1, 2)).reshape(1, -1)
        acc[1:2, :] += jnp.sum(hh * xhat, axis=(0, 1, 2)).reshape(1, -1)
        outs[(a, b)][...] = hh.astype(p00_ref.dtype)

    @pl.when(f == pl.num_programs(0) - 1)
    def _():
        st_ref[...] = acc[...]


def _conv_dgrad(g, w9, y_prev, sc, bi, mn, iv):
    """Backprop g (F, Hp, Wp, Cout) through the conv into its input, fused
    with the previous layer's ReLU mask and BN-backward reductions.

    Returns (h_planes {(a, b): (F, hp, wp, Cin)} = d(BN output) in plane
    coordinates — interleave with `_interleave_planes` — and sums
    (2, Cin) f32 [sum h, sum h*x_hat])."""
    f, h, w_, cin = y_prev.shape
    hp, wp = h // 2, w_ // 2
    fb = _pick_fb(f, hp, wp, h * w_ * cin)
    cout = g.shape[-1]
    kernel = functools.partial(_dgrad_kernel, fb=fb, hp=hp, wp=wp, cin=cin)
    plane_spec = pl.BlockSpec((fb, hp + 1, wp + 1, cin),
                              lambda i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    plane_shape = jax.ShapeDtypeStruct((f, hp + 1, wp + 1, cin), g.dtype)
    p00, p01, p10, p11, st = pl.pallas_call(
        kernel,
        grid=(f // fb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w (9Cin, Cout)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # scale (1, Cin)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bias (1, Cin)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # mean (1, Cin)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # inv (1, Cin)
            pl.BlockSpec((fb, h, w_, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fb, hp, wp, cout), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[plane_spec] * 4 + [
            pl.BlockSpec((2, cin), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)],
        out_shape=[plane_shape] * 4 + [
            jax.ShapeDtypeStruct((2, cin), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((2, cin), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT),
    )(w9, sc, bi, mn, iv, y_prev, g)
    return {(0, 0): p00, (0, 1): p01, (1, 0): p10, (1, 1): p11}, st


def _interleave_planes(planes: dict) -> jnp.ndarray:
    """{(a, b): (F, hp+1, wp+1, C)} HALO plane tensors -> (F, H, W, C).

    Plane (a, b) element i holds output row r = 2i + a - 1, so the valid
    crop is rows [1:] for a=0 and [:-1] for a=1 (cols likewise with b);
    after cropping, even rows come from a=1 planes and odd from a=0.
    Runs in XLA, fused into the adjacent elementwise BN-backward pass."""
    c = {}
    for (a, b), t in planes.items():
        rs = slice(1, None) if a == 0 else slice(0, -1)
        cs = slice(1, None) if b == 0 else slice(0, -1)
        c[(a, b)] = t[:, rs, cs, :]
    ev = jnp.stack([c[(1, 1)], c[(1, 0)]], axis=3)
    od = jnp.stack([c[(0, 1)], c[(0, 0)]], axis=3)
    x = jnp.stack([ev, od], axis=2)  # (F, hp, 2, wp, 2, C)
    f, hp, _, wp, _, ch = x.shape
    return x.reshape(f, hp * 2, wp * 2, ch)


# ---------------------------------------------------------------------------
# The fused stem (train mode) with custom VJP
# ---------------------------------------------------------------------------

def _conv1_xla(x, w1, b1):
    """conv1 (C_in=1) on XLA: degenerate channel depth defeats MXU/VMEM
    layouts in a hand kernel; XLA's emitter handles it adequately."""
    y = jax.lax.conv_general_dilated(
        x, w1.astype(x.dtype), window_strides=(2, 2),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b1.astype(x.dtype)


def _bn_scalars(s, ssq, m, gamma, beta, eps):
    """Fold batch statistics into per-channel (scale', bias', mean, inv):
    bn(x) = x * scale' + bias'."""
    mean = s / m
    var = ssq / m - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    scale = gamma * inv
    bias = beta - mean * scale
    return mean, var, inv, scale, bias


def _row(v):
    return v.reshape(1, -1).astype(jnp.float32)


def _stem_fwd_impl(x, w1, b1, ga1, be1, w2, b2, ga2, be2, w3, b3, ga3, be3,
                   eps):
    f = x.shape[0]
    y1 = _conv1_xla(x, w1, b1)
    y1f = y1.astype(jnp.float32)
    m1 = f * y1.shape[1] * y1.shape[2]
    s1 = jnp.sum(y1f, axis=(0, 1, 2))
    sq1 = jnp.sum(y1f * y1f, axis=(0, 1, 2))
    bm1, bv1, iv1, sc1, bi1 = _bn_scalars(s1, sq1, m1, ga1, be1, eps)

    w2r = w2.reshape(-1, w2.shape[-1]).astype(x.dtype)
    y2, st2 = _conv_fwd(y1, w2r, _row(b2), _row(sc1), _row(bi1),
                        prologue=True)
    m2 = f * y2.shape[1] * y2.shape[2]
    bm2, bv2, iv2, sc2, bi2 = _bn_scalars(st2[0], st2[1], m2, ga2, be2, eps)

    w3r = w3.reshape(-1, w3.shape[-1]).astype(x.dtype)
    y3, st3 = _conv_fwd(y2, w3r, _row(b3), _row(sc2), _row(bi2),
                        prologue=True)
    m3 = f * y3.shape[1] * y3.shape[2]
    bm3, bv3, iv3, sc3, bi3 = _bn_scalars(st3[0], st3[1], m3, ga3, be3, eps)

    a3 = jnp.maximum((y3.astype(jnp.float32) * sc3 + bi3).astype(y3.dtype),
                     0)
    pooled = jnp.mean(a3, axis=(1, 2))
    stats = (bm1, bv1, bm2, bv2, bm3, bv3)
    res = (x, y1, y2, y3, w1, w2r, w3r,
           (bm1, iv1, sc1, bi1), (bm2, iv2, sc2, bi2),
           (bm3, iv3, sc3, bi3), (ga1, ga2, ga3))
    return pooled, stats, res


@functools.partial(jax.custom_vjp, nondiff_argnums=(13,))
def fused_visual_stem(x, w1, b1, ga1, be1, w2, b2, ga2, be2, w3, b3, ga3,
                      be3, eps=1e-5):
    """Train-mode fused conv stem (reference model.py:81-92 semantics).

    x (F, H, W, 1) compute-dtype frames -> (pooled (F, 128), batch stats
    (bm1, bv1, bm2, bv2, bm3, bv3) f32) — biased batch variance, as torch
    BatchNorm2d normalizes with in training.  Weights are the flax layouts:
    w_i (3, 3, Cin, Cout), conv biases (Cout,), BN gamma/beta (Cout,).
    """
    pooled, stats, _ = _stem_fwd_impl(x, w1, b1, ga1, be1, w2, b2, ga2,
                                      be2, w3, b3, ga3, be3, eps)
    return pooled, stats


def _stem_fwd_rule(x, w1, b1, ga1, be1, w2, b2, ga2, be2, w3, b3, ga3, be3,
                   eps):
    pooled, stats, res = _stem_fwd_impl(x, w1, b1, ga1, be1, w2, b2, ga2,
                                        be2, w3, b3, ga3, be3, eps)
    return (pooled, stats), res


def _bn_bwd_elem(h, y, mean, inv, gamma, m):
    """Finish the train-BN backward elementwise given the fused reductions:
    g = gamma*inv*(h - sum(h)/M - x_hat * sum(h*x_hat)/M).  Returns
    (g, dgamma, dbeta); h is d(BN output) AFTER the ReLU mask."""
    hf = h.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    xhat = (yf - mean) * inv
    s1 = jnp.sum(hf, axis=(0, 1, 2))
    s2 = jnp.sum(hf * xhat, axis=(0, 1, 2))
    g = (gamma * inv) * (hf - s1 / m - xhat * (s2 / m))
    return g.astype(h.dtype), s2, s1


def _stem_bwd_rule(eps, res, ct):
    (x, y1, y2, y3, w1, w2r, w3r, bn1, bn2, bn3, gammas) = res
    bm1, iv1, sc1, bi1 = bn1
    bm2, iv2, sc2, bi2 = bn2
    bm3, iv3, sc3, bi3 = bn3
    ga1, ga2, ga3 = gammas
    g_pool = ct[0]  # stats outputs get zero cotangents (not differentiated)
    f = x.shape[0]
    h3_dim, w3_dim = y3.shape[1], y3.shape[2]
    m3 = f * h3_dim * w3_dim
    m2 = f * y2.shape[1] * y2.shape[2]
    m1 = f * y1.shape[1] * y1.shape[2]

    # Top: mean-pool backward + ReLU mask + BN3 backward (all elementwise
    # or small reductions — XLA fuses this into a couple of passes).
    da3 = jnp.broadcast_to(
        g_pool.astype(jnp.float32)[:, None, None, :] / (h3_dim * w3_dim),
        y3.shape)
    y3f = y3.astype(jnp.float32)
    pre3 = (y3f * sc3 + bi3).astype(y3.dtype)
    h3 = jnp.where(pre3 > 0, da3, 0.0).astype(y3.dtype)
    g3, dga3, dbe3 = _bn_bwd_elem(h3, y3, bm3, iv3, ga3, m3)
    db3 = jnp.sum(g3.astype(jnp.float32), axis=(0, 1, 2))

    # Layer 3 conv backward (Pallas): weights + data (fused with ReLU mask
    # and BN2-backward reductions).
    dw3 = _conv_wgrad(y2, g3, _row(sc2), _row(bi2), prologue=True)
    h2_planes, st2 = _conv_dgrad(g3, w3r, y2, _row(sc2), _row(bi2),
                                 _row(bm2), _row(iv2))
    h2 = _interleave_planes(h2_planes)
    g2 = ((ga2 * iv2) * (h2.astype(jnp.float32) - st2[0] / m2
                         - (y2.astype(jnp.float32) - bm2) * iv2
                         * (st2[1] / m2))).astype(y2.dtype)
    dga2, dbe2 = st2[1], st2[0]
    db2 = jnp.sum(g2.astype(jnp.float32), axis=(0, 1, 2))

    # Layer 2 conv backward.
    dw2 = _conv_wgrad(y1, g2, _row(sc1), _row(bi1), prologue=True)
    h1_planes, st1 = _conv_dgrad(g2, w2r, y1, _row(sc1), _row(bi1),
                                 _row(bm1), _row(iv1))
    h1 = _interleave_planes(h1_planes)
    g1 = ((ga1 * iv1) * (h1.astype(jnp.float32) - st1[0] / m1
                         - (y1.astype(jnp.float32) - bm1) * iv1
                         * (st1[1] / m1))).astype(y1.dtype)
    dga1, dbe1 = st1[1], st1[0]
    db1 = jnp.sum(g1.astype(jnp.float32), axis=(0, 1, 2))

    # conv1 weight gradient via the XLA conv's own VJP (no dgrad into the
    # input frames — they are data, not differentiated).
    zero_b1 = jnp.zeros((w1.shape[-1],), x.dtype)
    _, vjp_w1 = jax.vjp(lambda w: _conv1_xla(x, w, zero_b1), w1)
    (dw1,) = vjp_w1(g1)

    cout2 = w2r.shape[-1]
    cout3 = w3r.shape[-1]
    return (jnp.zeros_like(x),
            dw1.astype(w1.dtype), db1, dga1, dbe1,
            dw2.reshape(3, 3, -1, cout2), db2, dga2, dbe2,
            dw3.reshape(3, 3, -1, cout3), db3, dga3, dbe3)


fused_visual_stem.defvjp(_stem_fwd_rule, _stem_bwd_rule)
