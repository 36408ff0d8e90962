"""Fused visual conv stem: stride-2 3x3 convs + train-mode BatchNorm + ReLU
as Pallas TPU kernels with a custom VJP (v2: strictly-2D flat-plane layout).

Replaces the XLA lowering of the reference's per-frame backbone (reference
model.py:81-92: three stride-2 Conv2d(3x3) -> BatchNorm2d -> ReLU stages,
1->32->64->128 channels) for TRAINING.  Measured motivation (r4 profile
artifacts, v5e): the XLA stem is 37% of the demo step and 36% of the lrs2
step (bench_results/profile_{demo,lrs2}_auto.jsonl) — not conv FLOPs but
memory passes (conv / BN-stats / BN-apply as separate HBM round trips,
plus the stride-2 transposed-conv backward).

v1 LESSONS (kept because they are measured Mosaic behavior, r4):
  - in-kernel even/odd parity restructuring (pad + 6D reshape + slice)
    COMPILES but executes as per-program sublane-shuffle chains — 12x/26x
    slower than the XLA stem end-to-end;
  - a lane-axis concat of shifted planes fails to compile ("offset
    mismatch on non-concat dimension");
  - jnp.roll on a 2D block costs ~45 us per application at demo scale;
  - compile memory explodes with the per-program block (fb cap, 96 MB
    scoped-VMEM, ~11 min compiles at 48x48).

v2 DESIGN (this file): do the parity split ON THE XLA SIDE and keep every
kernel value strictly 2D.
  - Layer input planes P[a][b]: flat (F*S, Cin), S = (Ho+2)*(Wo+2), one
    row per (frame, p, q) with a 1-row/col halo on each side of the
    output grid.  XLA builds them in one fused gather pass per layer.
  - The conv output lives in the SAME flat halo layout (garbage rows at
    p >= Ho or q >= Wo), so every stride-2 tap becomes a PURE ROW OFFSET:
    output row j reads plane[a][b] row j + o*(Wo+2) + u.  In-kernel that
    is a static REF slice feeding an accumulating MXU matmul — no
    reshape, pad, concat or roll ever touches a kernel value.  Tap reads
    that would cross the block end only feed garbage output rows (each
    frame ends with >= 2*(Wo+2) garbage rows > the max offset), so the
    accumulation simply stops short: acc[0:R-off] += dot(plane[off:R]).
  - Batch statistics are accumulated in-kernel under a validity mask
    (an (F*S, 1) row-mask input); BN normalize folds into per-channel
    scale'/bias' applied as the NEXT kernel's prologue, so normalized
    activations never materialize in HBM.
  - Backward: wgrad accumulates dW per tap from the same ref slices;
    dgrad scatter-adds g @ w_tap^T into four plane-gradient scratches at
    the tap offsets, applies the recomputed ReLU mask per plane, and
    emits per-channel (sum h, sum h*x_hat) so XLA can finish the
    train-BN backward elementwise.

conv1 (C_in=1) stays on XLA: its degenerate channel depth defeats the MXU
regardless of layout; its weight gradient comes from jax.vjp of the same
XLA conv.

Numerics match the XLA path exactly in f32 (tests/test_kernels.py
interpret gate) and to the XLA path's own bf16 rounding on chip
(tools/verify_kernels_tpu.py): conv accumulates f32 and rounds to the
compute dtype; BN statistics are computed from the ROUNDED conv output;
normalize runs in f32 and casts before ReLU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# (plane parity a, block offset o) per kernel tap offset d in {0, 1, 2}:
# padded input row rp = 2p + d = 2*(p + o) + a.
_TAP = {0: (0, 0), 1: (1, 0), 2: (0, 1)}

# Raised scoped-VMEM limit: Mosaic's stack allocator keeps several live
# f32 copies of the (R, Cout) accumulator chain across the unrolled taps
# (36.6 MB measured at R=5000/Cout=64 vs the 16 MB default); v5e has
# 128 MB of physical VMEM.
_VMEM_LIMIT = 96 * 1024 * 1024


def _taps():
    """[(tap_index k, plane (a, b), flat row offset factory)]"""
    out = []
    for dy in (0, 1, 2):
        a, o = _TAP[dy]
        for dx in (0, 1, 2):
            b, u = _TAP[dx]
            out.append((dy * 3 + dx, (a, b), o, u))
    return out


def _pick_fb(f: int, s: int, c: int, budget_elems: int = 400_000) -> int:
    """Frames per program: largest divisor of f with fb*S*C under a VMEM
    budget.  v2 kernels have no relayouts, so this is a plain working-set
    bound, not a compile-time constraint."""
    cap = max(1, budget_elems // (s * c))
    best = 1
    for d in range(1, min(f, cap) + 1):
        if f % d == 0:
            best = d
    return best


# ---------------------------------------------------------------------------
# XLA-side layout helpers (each a single fused gather pass)
# ---------------------------------------------------------------------------

def _split_planes(y: jnp.ndarray):
    """(F, H, W, C) -> (4, F*S, C) stacked flat halo planes of the
    1-padded input, S = (H/2+2)*(W/2+2); plane index = 2a + b.

    ONE transpose produces all four planes contiguously — four separate
    strided slices made XLA run four gather passes (measured 4.5 ms for a
    52 MB input at demo scale; the transpose form is a single relayout).
    """
    f, h, w, c = y.shape
    hp, wp = h // 2, w // 2
    ypad = jnp.pad(y, ((0, 0), (1, 3), (1, 3), (0, 0)))
    v = ypad.reshape(f, hp + 2, 2, wp + 2, 2, c)
    v = v.transpose(2, 4, 0, 1, 3, 5)  # (2, 2, F, hp+2, wp+2, C)
    return v.reshape(4, f * (hp + 2) * (wp + 2), c)


def _from_planes(planes: jnp.ndarray, f: int, h: int,
                 w: int) -> jnp.ndarray:
    """Inverse of _split_planes (drops the padding): (4, F*S, C) ->
    (F, H, W, C).  Pixel r sits in plane parity (r+1)%2 at index (r+1)//2."""
    hp, wp = h // 2, w // 2
    c = planes.shape[-1]
    cropped = {}
    for a in (0, 1):
        for b in (0, 1):
            t = planes[2 * a + b].reshape(f, hp + 2, wp + 2, c)
            rs = slice(1, hp + 1) if a == 0 else slice(0, hp)
            cs = slice(1, wp + 1) if b == 0 else slice(0, wp)
            cropped[(a, b)] = t[:, rs, cs, :]
    ev = jnp.stack([cropped[(1, 1)], cropped[(1, 0)]], axis=3)
    od = jnp.stack([cropped[(0, 1)], cropped[(0, 0)]], axis=3)
    x = jnp.stack([ev, od], axis=2)  # (F, hp, 2, wp, 2, C)
    return x.reshape(f, h, w, c)


def _halo_shape(h_out: int, w_out: int):
    return (h_out + 2) * (w_out + 2)


def _masks(f: int, ho: int, wo: int) -> jnp.ndarray:
    """(F*S, 8) f32 mask bundle in ONE tensor (one DMA per program instead
    of five): lane 0 = valid OUTPUT rows (p < Ho, q < Wo); lanes 1+2a+b =
    plane (a, b) holds a REAL input pixel (plane index i maps to pixel row
    2i+a-1: valid rows [1, Ho] for a=0, [0, Ho) for a=1; cols likewise);
    lanes 5-7 zero padding."""
    m = np.zeros((ho + 2, wo + 2, 8), np.float32)
    m[:ho, :wo, 0] = 1.0
    for a in (0, 1):
        for b in (0, 1):
            rs = slice(1, ho + 1) if a == 0 else slice(0, ho)
            cs = slice(1, wo + 1) if b == 0 else slice(0, wo)
            m[rs, cs, 1 + 2 * a + b] = 1.0
    return jnp.asarray(np.tile(m.reshape(-1, 8), (f, 1)))


def _to_halo(g: jnp.ndarray) -> jnp.ndarray:
    """(F, Ho, Wo, C) -> (F*S, C) flat halo layout with ZERO garbage rows
    (the wgrad/dgrad contractions rely on the zeros)."""
    f, ho, wo, c = g.shape
    gp = jnp.pad(g, ((0, 0), (0, 2), (0, 2), (0, 0)))
    return gp.reshape(f * (ho + 2) * (wo + 2), c)


def _from_halo(y: jnp.ndarray, f: int, ho: int, wo: int) -> jnp.ndarray:
    """(F*S, C) flat halo -> (F, Ho, Wo, C) valid region."""
    c = y.shape[-1]
    return y.reshape(f, ho + 2, wo + 2, c)[:, :ho, :wo, :]


# ---------------------------------------------------------------------------
# Kernels: all values strictly 2D; taps are static ref slices
# ---------------------------------------------------------------------------

def _fwd_kernel(w_ref, cb_ref, sc_ref, bi_ref, m_ref, p_ref, y_ref,
                st_ref, acc_y, acc_st, *, r: int, wo: int, cin: int,
                prologue: bool):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_st[:] = jnp.zeros_like(acc_st)

    acc_y[...] = jnp.broadcast_to(cb_ref[...], acc_y.shape)
    for k, (a, b), o, u in _taps():
        off = o * (wo + 2) + u
        t = p_ref[2 * a + b, off:r, :]
        if prologue:
            # The plane tensor carries the conv's 'SAME' zero padding as
            # raw zeros; the affine prologue would turn them into
            # relu(bias) — the plane-validity mask restores true zeros.
            tf = (t.astype(jnp.float32) * sc_ref[...] + bi_ref[...])
            tf = tf * m_ref[off:r, 1 + 2 * a + b:2 + 2 * a + b]
            t = jnp.maximum(tf.astype(t.dtype), 0)
        acc_y[0:r - off, :] += jax.lax.dot_general(
            t, w_ref[k * cin:(k + 1) * cin, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    yc = acc_y[...].astype(y_ref.dtype)
    yf = yc.astype(jnp.float32) * m_ref[:, 0:1]  # stats: ROUNDED, masked
    acc_st[0:1, :] += jnp.sum(yf, axis=0, keepdims=True)
    acc_st[1:2, :] += jnp.sum(yf * yf, axis=0, keepdims=True)
    y_ref[...] = yc

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        st_ref[...] = acc_st[...]


def _conv_fwd(planes, w9, cb, sc, bi, masks, *, f, ho, wo, prologue):
    """planes (4, F*S, Cin) -> (y_halo (F*S, Cout), stats (2, Cout) f32
    [sum, sumsq] over VALID rows).  masks: _masks(f, ho, wo)."""
    s = _halo_shape(ho, wo)
    cin = w9.shape[0] // 9
    cout = w9.shape[1]
    fb = _pick_fb(f, s, max(cin, cout))
    r = fb * s
    kernel = functools.partial(_fwd_kernel, r=r, wo=wo, cin=cin,
                               prologue=prologue)
    y, st = pl.pallas_call(
        kernel,
        grid=(f // fb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w (9Cin, Cout)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # conv bias (1, Cout)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # scale (1, Cin)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bias (1, Cin)
            pl.BlockSpec((r, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),   # mask bundle
            pl.BlockSpec((4, r, cin), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),   # stacked planes
        ],
        out_specs=[
            pl.BlockSpec((r, cout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((f * s, cout), planes.dtype),
            jax.ShapeDtypeStruct((2, cout), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((r, cout), jnp.float32),
                        pltpu.VMEM((2, cout), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT),
    )(w9, cb, sc, bi, masks, planes)
    return y, st


def _wgrad_kernel(sc_ref, bi_ref, m_ref, p_ref, g_ref, dw_ref, acc, *,
                  r: int, wo: int, cin: int, prologue: bool):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    for k, (a, b), o, u in _taps():
        off = o * (wo + 2) + u
        t = p_ref[2 * a + b, off:r, :]
        if prologue:
            tf = (t.astype(jnp.float32) * sc_ref[...] + bi_ref[...])
            tf = tf * m_ref[off:r, 1 + 2 * a + b:2 + 2 * a + b]
            t = jnp.maximum(tf.astype(t.dtype), 0)
        g = g_ref[0:r - off, :]  # garbage rows of g are zero
        acc[k * cin:(k + 1) * cin, :] += jax.lax.dot_general(
            t, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        dw_ref[...] = acc[...]


def _conv_wgrad(planes, g_halo, sc, bi, masks, *, f, ho, wo, cout,
                prologue):
    """dW (9*Cin, Cout) f32; g_halo must have zeroed garbage rows."""
    s = _halo_shape(ho, wo)
    cin = planes.shape[-1]
    fb = _pick_fb(f, s, max(cin, cout))
    r = fb * s
    kernel = functools.partial(_wgrad_kernel, r=r, wo=wo, cin=cin,
                               prologue=prologue)
    return pl.pallas_call(
        kernel,
        grid=(f // fb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((r, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, r, cin), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, cout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9 * cin, cout), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9 * cin, cout), jnp.float32),
        scratch_shapes=[pltpu.VMEM((9 * cin, cout), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT),
    )(sc, bi, masks, planes, g_halo)


def _dgrad_kernel(w_ref, sc_ref, bi_ref, mn_ref, iv_ref, m_ref, p_ref,
                  g_ref, h_ref, st_ref, acc_h, acc_st, *, r: int, wo: int,
                  cin: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_st[:] = jnp.zeros_like(acc_st)

    acc_h[...] = jnp.zeros_like(acc_h)
    for k, (a, b), o, u in _taps():
        off = o * (wo + 2) + u
        g = g_ref[0:r - off, :]  # garbage rows of g are zero
        c = jax.lax.dot_general(
            g, w_ref[k * cin:(k + 1) * cin, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_h[2 * a + b, off:r, :] += c
    for a in (0, 1):
        for b in (0, 1):
            idx = 2 * a + b
            yf = p_ref[idx].astype(jnp.float32)
            pre = (yf * sc_ref[...] + bi_ref[...])                 .astype(p_ref.dtype).astype(jnp.float32)
            keep = (pre > 0).astype(jnp.float32)                 * m_ref[:, 1 + idx:2 + idx]
            hh = acc_h[idx] * keep
            xhat = (yf - mn_ref[...]) * iv_ref[...]
            acc_st[0:1, :] += jnp.sum(hh, axis=0, keepdims=True)
            acc_st[1:2, :] += jnp.sum(hh * xhat, axis=0, keepdims=True)
            h_ref[idx, :, :] = hh.astype(h_ref.dtype)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        st_ref[...] = acc_st[...]


def _conv_dgrad(g_halo, w9, planes, masks, sc, bi, mn, iv, *, f, ho, wo):
    """Backprop g (halo layout, zeroed garbage) through the conv into its
    input PLANES, fused with the previous layer's ReLU mask and the
    train-BN backward reductions.  Returns (h planes (4, F*S, Cin), sums
    (2, Cin) f32 [sum h, sum h*x_hat])."""
    s = _halo_shape(ho, wo)
    cin = planes.shape[-1]
    cout = w9.shape[1]
    fb = _pick_fb(f, s, max(cin, cout))
    r = fb * s
    kernel = functools.partial(_dgrad_kernel, r=r, wo=wo, cin=cin)
    h, st = pl.pallas_call(
        kernel,
        grid=(f // fb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w
            pl.BlockSpec(memory_space=pltpu.VMEM),   # scale (1, Cin)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bias (1, Cin)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # mean (1, Cin)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # inv (1, Cin)
            pl.BlockSpec((r, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, r, cin), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, cout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((4, r, cin), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, cin), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, f * s, cin), g_halo.dtype),
            jax.ShapeDtypeStruct((2, cin), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((4, r, cin), jnp.float32),
                        pltpu.VMEM((2, cin), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT),
    )(w9, sc, bi, mn, iv, masks, planes, g_halo)
    return h, st


# ---------------------------------------------------------------------------
# The fused stem (train mode) with custom VJP
# ---------------------------------------------------------------------------

def _conv1_xla(x, w1, b1):
    """conv1 (C_in=1) on XLA: degenerate channel depth defeats MXU
    layouts in a hand kernel; XLA's emitter handles it adequately."""
    y = jax.lax.conv_general_dilated(
        x, w1.astype(x.dtype), window_strides=(2, 2),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b1.astype(x.dtype)


def _bn_scalars(s, ssq, m, gamma, beta, eps):
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
    f, hin, win, _ = x.shape
    h1, w1dim = hin // 2, win // 2       # conv1 output spatial
    h2, w2dim = h1 // 2, w1dim // 2      # conv2 output spatial
    h3, w3dim = h2 // 2, w2dim // 2      # conv3 output spatial

    y1 = _conv1_xla(x, w1, b1)
    y1f = y1.astype(jnp.float32)
    m1 = f * h1 * w1dim
    s1 = jnp.sum(y1f, axis=(0, 1, 2))
    sq1 = jnp.sum(y1f * y1f, axis=(0, 1, 2))
    bm1, bv1, iv1, sc1, bi1 = _bn_scalars(s1, sq1, m1, ga1, be1, eps)

    w2r = w2.reshape(-1, w2.shape[-1]).astype(x.dtype)
    planes1 = _split_planes(y1)
    masks_l2 = _masks(f, h2, w2dim)
    y2h, st2 = _conv_fwd(planes1, w2r, _row(b2), _row(sc1), _row(bi1),
                         masks_l2, f=f, ho=h2, wo=w2dim, prologue=True)
    m2 = f * h2 * w2dim
    bm2, bv2, iv2, sc2, bi2 = _bn_scalars(st2[0], st2[1], m2, ga2, be2, eps)

    w3r = w3.reshape(-1, w3.shape[-1]).astype(x.dtype)
    y2 = _from_halo(y2h, f, h2, w2dim)
    planes2 = _split_planes(y2)
    masks_l3 = _masks(f, h3, w3dim)
    y3h, st3 = _conv_fwd(planes2, w3r, _row(b3), _row(sc2), _row(bi2),
                         masks_l3, f=f, ho=h3, wo=w3dim, prologue=True)
    m3 = f * h3 * w3dim
    bm3, bv3, iv3, sc3, bi3 = _bn_scalars(st3[0], st3[1], m3, ga3, be3, eps)

    y3 = _from_halo(y3h, f, h3, w3dim)
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
    BatchNorm2d normalizes with in training.  Weights are the flax
    layouts: w_i (3, 3, Cin, Cout), conv biases (Cout,), BN gamma/beta
    (Cout,)."""
    pooled, stats, _ = _stem_fwd_impl(x, w1, b1, ga1, be1, w2, b2, ga2,
                                      be2, w3, b3, ga3, be3, eps)
    return pooled, stats


def _stem_fwd_rule(x, w1, b1, ga1, be1, w2, b2, ga2, be2, w3, b3, ga3, be3,
                   eps):
    pooled, stats, res = _stem_fwd_impl(x, w1, b1, ga1, be1, w2, b2, ga2,
                                        be2, w3, b3, ga3, be3, eps)
    return (pooled, stats), res


def _stem_bwd_rule(eps, res, ct):
    (x, y1, y2, y3, w1, w2r, w3r, bn1, bn2, bn3, gammas) = res
    bm1, iv1, sc1, bi1 = bn1
    bm2, iv2, sc2, bi2 = bn2
    bm3, iv3, sc3, bi3 = bn3
    ga1, ga2, ga3 = gammas
    g_pool = ct[0]  # stats outputs get zero cotangents
    f = x.shape[0]
    h1, w1dim = y1.shape[1], y1.shape[2]
    h2, w2dim = y2.shape[1], y2.shape[2]
    h3, w3dim = y3.shape[1], y3.shape[2]
    m1 = f * h1 * w1dim
    m2 = f * h2 * w2dim
    m3 = f * h3 * w3dim

    # Top: mean-pool backward + ReLU mask + BN3 backward (elementwise).
    da3 = jnp.broadcast_to(
        g_pool.astype(jnp.float32)[:, None, None, :] / (h3 * w3dim),
        y3.shape)
    y3f = y3.astype(jnp.float32)
    pre3 = (y3f * sc3 + bi3).astype(y3.dtype)
    h3t = jnp.where(pre3 > 0, da3, 0.0)
    s1_3 = jnp.sum(h3t, axis=(0, 1, 2))
    xhat3 = (y3f - bm3) * iv3
    s2_3 = jnp.sum(h3t * xhat3, axis=(0, 1, 2))
    g3 = ((ga3 * iv3) * (h3t - s1_3 / m3 - xhat3 * (s2_3 / m3))) \
        .astype(y3.dtype)
    dga3, dbe3 = s2_3, s1_3
    db3 = jnp.sum(g3.astype(jnp.float32), axis=(0, 1, 2))

    # Layer 3 conv backward (Pallas).
    planes2 = _split_planes(y2)
    masks_l3 = _masks(f, h3, w3dim)
    g3h = _to_halo(g3)
    dw3 = _conv_wgrad(planes2, g3h, _row(sc2), _row(bi2), masks_l3, f=f,
                      ho=h3, wo=w3dim, cout=g3.shape[-1], prologue=True)
    h2_planes, st2 = _conv_dgrad(g3h, w3r, planes2, masks_l3, _row(sc2),
                                 _row(bi2), _row(bm2), _row(iv2),
                                 f=f, ho=h3, wo=w3dim)
    hg2 = _from_planes(h2_planes, f, h2, w2dim)
    g2 = ((ga2 * iv2) * (hg2.astype(jnp.float32) - st2[0] / m2
                         - (y2.astype(jnp.float32) - bm2) * iv2
                         * (st2[1] / m2))).astype(y2.dtype)
    dga2, dbe2 = st2[1], st2[0]
    db2 = jnp.sum(g2.astype(jnp.float32), axis=(0, 1, 2))

    # Layer 2 conv backward.
    planes1 = _split_planes(y1)
    masks_l2 = _masks(f, h2, w2dim)
    g2h = _to_halo(g2)
    dw2 = _conv_wgrad(planes1, g2h, _row(sc1), _row(bi1), masks_l2, f=f,
                      ho=h2, wo=w2dim, cout=g2.shape[-1], prologue=True)
    h1_planes, st1 = _conv_dgrad(g2h, w2r, planes1, masks_l2, _row(sc1),
                                 _row(bi1), _row(bm1), _row(iv1),
                                 f=f, ho=h2, wo=w2dim)
    hg1 = _from_planes(h1_planes, f, h1, w1dim)
    g1 = ((ga1 * iv1) * (hg1.astype(jnp.float32) - st1[0] / m1
                         - (y1.astype(jnp.float32) - bm1) * iv1
                         * (st1[1] / m1))).astype(y1.dtype)
    dga1, dbe1 = st1[1], st1[0]
    db1 = jnp.sum(g1.astype(jnp.float32), axis=(0, 1, 2))

    # conv1 weight gradient via the XLA conv's own VJP.  No dgrad into the
    # input frames: the VisualEncoder call site wraps x in
    # lax.stop_gradient, declaring frames as non-differentiated data, so
    # the zero cotangent below is the stated contract, not a silent lie.
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
