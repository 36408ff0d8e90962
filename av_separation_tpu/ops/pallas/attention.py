"""Blockwise flash attention Pallas TPU kernel (forward + backward).

Replaces the dense-materialized attention the reference gets from torch MHA
(reference model.py:48-52,166-170) with an online-softmax blockwise kernel:
O(block_q x block_k) VMEM footprint instead of O(Tq x Tk) HBM, softmax
statistics carried in f32 scratch across the key-block grid dimension.  Serves
both the encoders' self-attention and the fusion stack's audio-query /
visual-KV cross-attention (Tq != Tk is the normal case there).

Grid layout: (B*H, Tq/block_q, Tk/block_k) with the key axis innermost
("arbitrary" semantics — sequential on a TPU core), so the (m, l, acc)
scratch carries across key blocks and the output block is finalized on the
last key iteration.

Three performance rules this kernel learned from the chip (scaled config,
T=501, dh=64: the first version ran 2x SLOWER than XLA dense attention):
  - Softmax statistics are stored COMPACT as (BH, Tq) — one f32 per row,
    laid out with Tq on the lane axis (block (1, block_q)).  Broadcasting
    them over 128 lanes "for layout convenience" made them 128x larger
    than the problem (67MB per stat tensor at scaled shapes) and that
    traffic, re-read by every backward stage, dominated the kernel.
    The forward fuses lse = m + log(l) and emits ONLY that.
  - Q/K/V are NOT padded to 128 lanes.  Head dims of 32/64 run as native
    narrow blocks (half-utilized loads beat doubling HBM bytes with an
    XLA pad copy first; the QK/PV matmul FLOPs are noise at these shapes).
  - Matmul operands stay in their NATIVE dtype with f32 accumulation
    (preferred_element_type): casting bf16 inputs to f32 "for safety" put
    every dot on the MXU's multi-pass f32 path (~1/4 rate).  Softmax/exp
    statistics remain f32 in the VPU, and the probability matrix is
    quantized to the value dtype before PV exactly as the XLA path does —
    so bf16 training numerics match attention_xla, not degrade them.

The backward pass recomputes probabilities blockwise (flash-style) and
accumulates dQ/dK/dV in two kernels: dQ over the key grid, dK/dV over the
query grid — each a pure matmul chain on the MXU.

Attention-probability DROPOUT (torch MHA training semantics: the normalized
probability row is masked and survivors scaled by 1/(1-r), so rows no longer
sum to 1) runs IN-KERNEL: each (batch*head, q-block, k-block) tile draws its
keep mask from the TPU hardware PRNG seeded by the tile coordinates
(pltpu.prng_seed(seed, b, i, j) — a pure function, so fwd and both bwd
kernels regenerate identical bits at negligible cost), falling back to a
stateless murmur3-finalizer hash under the CI interpreter where
pltpu.prng_random_bits is stubbed to zeros — the T x T mask never exists
in HBM either way.  The
flash trick delta = sum(dO * O) survives dropout exactly:
    out_row = sum_k (M_k P_k / (1-r)) V_k
    sum_k P_k dP_k = sum_k P_k M_k (dO . V_k) / (1-r) = dO . out_row
so the backward formulas only change by masking/rescaling dp.  Without the
in-kernel path, training (dropout > 0) would fall back to dense XLA
attention and materialize the probabilities.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Default block caps.  The grid is (B*H, Tq/bq, Tk/bk): SMALL blocks mean
# THOUSANDS of tiny programs and the per-program overhead dominates (the
# 128x128 default ran 2x slower than XLA dense at T=501).  Everything this
# framework runs has T <= ~512, so whole rows of K/V fit in VMEM: 512-caps
# collapse the grid to (B*H, 1, 1) — dense-in-VMEM attention with the
# online-softmax path only engaging for genuinely long sequences.
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 512
NEG_INF = -1e30


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pad_to(x: jnp.ndarray, axis: int, mult: int) -> jnp.ndarray:
    size = x.shape[axis]
    target = _cdiv(size, mult) * mult
    if target == size:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - size)
    return jnp.pad(x, pads)


def _interpret_active() -> bool:
    """True when tracing under pltpu.force_tpu_interpret_mode (the CI
    path): the TPU interpreter stubs pltpu.prng_random_bits to zeros, so
    dropout must use the software hash there.

    Detection reads a private JAX config attr; if a JAX upgrade moves it,
    this RAISES rather than guessing — silently choosing hw=True under the
    interpreter would make every keep-threshold compare see zeros and drop
    ALL attention probabilities (output silently zeroed in CI)."""
    try:
        from jax._src import config as _jconfig
        ctx = _jconfig.pallas_tpu_interpret_mode_context_manager
    except (ImportError, AttributeError) as e:  # pragma: no cover
        raise RuntimeError(
            "cannot detect pallas TPU interpret mode (private JAX config "
            "attr moved?) — refusing to guess: hw-PRNG dropout under the "
            "interpreter would silently zero attention. Update "
            "_interpret_active for this JAX version.") from e
    return ctx.value is not None


def _keep_mask(seed_ref, b, i, j, shape, rate: float, hw: bool = False):
    """Regenerable per-tile dropout keep mask.

    Compiled on TPU (`hw=True`): seed the hardware PRNG from the tile
    coordinates and draw the bits for free — `pltpu.prng_seed(seed, b, i,
    j)` is a pure function of its arguments, so the forward and both
    backward kernels regenerate identical bits.  (The murmur path below
    cost ~14% of the whole scaled-config train step: ~12 uint vector ops
    per score element, recomputed by all three kernels —
    bench_results/isolate_bwd r3: dropout 0.1 vs 0.0 = 78.1 vs 67.5
    ms/step with the hash, ~0 with hardware bits.)

    Interpreter fallback (`hw=False`): a stateless murmur3-finalizer hash
    over (seed, b, i, j, row, col) in plain uint32 vector ops — identical
    under the CI interpreter where the hardware PRNG is stubbed to zeros.
    """
    u = jnp.uint32
    if hw:
        threshold = u(min(int(rate * (1 << 32)), (1 << 32) - 1))
        # Mosaic's prng_seed takes at most 2 values: word 1 mixes the call
        # seed with the (i, j) block coordinates, word 2 carries the
        # batch*head index b alone — so BH is never shifted into high bits
        # (the old (b << 20) packing overflowed the int32 sign bit at
        # BH >= 2048 and ALIASED dropout streams between tiles at
        # BH >= 4096).  j < 2^12 holds for Tk <= ~524k at >= 128-wide key
        # blocks; i (query blocks >= 16 wide) stays well inside the
        # remaining bits for any sequence this framework runs.
        ij = (i.astype(jnp.int32) << 12) | j.astype(jnp.int32)
        # Spread the tile id by an odd constant (golden-ratio multiplier)
        # before mixing: adding ij raw would alias mask streams between
        # two call sites whose random seeds differ by a small tile offset
        # (< ~2^24).  Multiplying by 0x9E3779B1 (odd, hence a bijection on
        # int32) keeps tiles distinct within a call while separating
        # nearby call-site seeds.
        pltpu.prng_seed(seed_ref[0] + ij * jnp.int32(-1640531535),
                        b.astype(jnp.int32))
        bits = pltpu.prng_random_bits(shape)
        return bits.astype(u) >= threshold
    tile = (seed_ref[0].astype(u) * u(0x9E3779B9)
            ^ b.astype(u) * u(0x85EBCA6B)
            ^ i.astype(u) * u(0xC2B2AE35)
            ^ j.astype(u) * u(0x27D4EB2F))
    h = (jax.lax.broadcasted_iota(jnp.uint32, shape, 0) * u(0x01000193)
         + jax.lax.broadcasted_iota(jnp.uint32, shape, 1) * u(0x61C88647)
         + tile)
    h = h ^ (h >> u(16))
    h = h * u(0x85EBCA6B)
    h = h ^ (h >> u(13))
    h = h * u(0xC2B2AE35)
    h = h ^ (h >> u(16))
    threshold = u(min(int(rate * (1 << 32)), (1 << 32) - 1))
    return h >= threshold


# ---------------------------------------------------------------------------
# Head-packed single-block path
# ---------------------------------------------------------------------------
#
# When the whole (padded) sequence fits one block pair (every config this
# framework ships: T <= 512), the grid degenerates to (B*H, 1, 1) and the
# kernel cost is dominated by per-program overhead, not matmuls (scaled
# config: BH=128 programs per attention call, each ~0.7 us of MXU work).
# The packed path processes HP heads per program — grid (B*H/HP,), block
# (HP, T, dh) — and fuses the whole backward (delta + dQ + dK + dV) into
# ONE kernel: with everything resident in VMEM there is nothing to stage
# across programs, so the 3-stage structure (needed only for cross-block
# accumulation) collapses, cutting program count ~4x(stages+packing) and
# deleting the delta tensor's HBM round trip.  Numerics and the dropout
# mask stream are bit-identical to the unpacked single_k path (the PRNG is
# seeded per (bh, 0, 0) tile exactly as before).

PACKED_VMEM_BUDGET = 10 * 1024 * 1024


def _pick_heads_per_block(bh: int, bq: int, bk: int, d: int,
                          itemsize: int) -> int:
    """Largest hp in {8, 4, 2, 1} dividing B*H whose packed backward fits
    the VMEM budget: hp x 8 planes of (block, d) + 3 f32 (bq, bk)
    transients (p, dp, ds)."""
    for hp in (8, 4, 2, 1):
        if bh % hp:
            continue
        need = hp * 8 * max(bq, bk) * d * itemsize + 3 * bq * bk * 4
        if need <= PACKED_VMEM_BUDGET:
            return hp
    return 1


def _fwd_packed_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                       *, scale: float, tk: int, block_k: int, rate: float,
                       hw: bool, hp: int):
    b0 = pl.program_id(0)
    for h in range(hp):
        q = q_ref[h]
        k = k_ref[h]
        v = v_ref[h]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if tk % block_k != 0:
            s = _tail_mask(s, 0, tk, block_k)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        if rate > 0.0:
            keep = _keep_mask(seed_ref, b0 * hp + h, jnp.int32(0),
                              jnp.int32(0), p.shape, rate, hw)
            p = jnp.where(keep, p, 0.0)
        out = jnp.dot(p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32)
        o_ref[h] = (out / (l * (1.0 - rate))).astype(o_ref.dtype)
        lse = m + jnp.log(l)
        lse_ref[h] = jnp.broadcast_to(lse.reshape(1, -1),
                                      lse_ref.shape[1:])


def _bwd_packed_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, o_ref,
                       lse_ref, dq_ref, dk_ref, dv_ref,
                       *, scale: float, tk: int, block_k: int, rate: float,
                       hw: bool, hp: int):
    b0 = pl.program_id(0)
    for h in range(hp):
        q = q_ref[h]
        k = k_ref[h]
        v = v_ref[h]
        do = do_ref[h]
        o = o_ref[h]
        lse = lse_ref[h][0:1, :].reshape(-1, 1)
        # delta = sum(dO * O) per row, computed inline — the packed path
        # never materializes it in HBM.
        delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                        axis=-1, keepdims=True)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if tk % block_k != 0:
            s = _tail_mask(s, 0, tk, block_k)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if rate > 0.0:
            keep = _keep_mask(seed_ref, b0 * hp + h, jnp.int32(0),
                              jnp.int32(0), p.shape, rate, hw)
            pd = jnp.where(keep, p / (1.0 - rate), 0.0)
            dp = jnp.where(keep, dp / (1.0 - rate), 0.0)
        else:
            pd = p
        dv_ref[h] = jax.lax.dot_general(
            pd.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        ds = p * (dp - delta) * scale
        dq_ref[h] = jnp.dot(ds.astype(k.dtype), k,
                            preferred_element_type=jnp.float32
                            ).astype(dq_ref.dtype)
        dk_ref[h] = jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _flash_packed_call(q, k, v, seed, scale, true_tk, rate, hw, hp):
    bh, tq, d = q.shape
    bk = k.shape[1]
    out, lse = pl.pallas_call(
        functools.partial(_fwd_packed_kernel, scale=scale, tk=true_tk,
                          block_k=bk, rate=rate, hw=hw, hp=hp),
        grid=(bh // hp,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((hp, tq, d), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, bk, d), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, bk, d), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((hp, tq, d), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, 8, tq), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 8, tq), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(seed, q, k, v)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash_packed(q, k, v, seed, scale: float, true_tk: int, rate: float,
                  hw: bool, hp: int):
    out, _ = _flash_packed_call(q, k, v, seed, scale, true_tk, rate, hw,
                                hp)
    return out


def _flash_packed_fwd_rule(q, k, v, seed, scale, true_tk, rate, hw, hp):
    out, lse = _flash_packed_call(q, k, v, seed, scale, true_tk, rate, hw,
                                  hp)
    return out, (q, k, v, seed, out, lse)


def _flash_packed_bwd_rule(scale, true_tk, rate, hw, hp, res, g):
    q, k, v, seed, out, lse = res
    bh, tq, d = q.shape
    bk = k.shape[1]
    qspec = pl.BlockSpec((hp, tq, d), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((hp, bk, d), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_packed_kernel, scale=scale, tk=true_tk,
                          block_k=bk, rate=rate, hw=hw, hp=hp),
        grid=(bh // hp,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            qspec, kspec, kspec, qspec, qspec,
            pl.BlockSpec((hp, 8, tq), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[qspec, kspec, kspec],
        out_shape=[
            jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, bk, d), k.dtype),
            jax.ShapeDtypeStruct((bh, bk, d), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(seed, q, k, v, g, out, lse)
    return dq, dk, dv, jnp.zeros_like(seed)


_flash_packed.defvjp(_flash_packed_fwd_rule, _flash_packed_bwd_rule)


# ---------------------------------------------------------------------------
# Packed-LAYOUT single-block path: q/k/v stay (B, T, H*dh)
# ---------------------------------------------------------------------------
#
# `split_heads` ((B, T, D) -> (B, H, T, dh)) is a real relayout on TPU: XLA
# lowers the transpose to H per-head slices concatenated along the sequence
# axis — measured 1.8 ms/step of the scaled config (40 concatenates of
# bf16[32, 2004, 128] in the r5 step trace), plus the mirrored copies in
# backward.  When dh is a lane multiple (every config that resolves to the
# flash kernel ships dh=128), the kernel can read head h's columns
# [h*dh:(h+1)*dh] DIRECTLY from the packed (B, T, H*dh) array: blocks carry
# hp adjacent heads ((1, T, hp*dh)), and in-kernel static lane slices at
# 128 alignment are free.  dQ/dK/dV come back packed too, flowing straight
# into the projection backward with no un-transpose.  Math, seeding and the
# dropout mask stream are identical to the head-packed path above (the
# PRNG tile index is the same global b*H+h).

def _pick_heads_hpacked(nh: int, bq: int, bk: int, dh: int,
                        itemsize: int) -> int:
    """Largest hp in {8,4,2,1} dividing nhead whose packed-layout backward
    fits VMEM: 8 planes of (block, hp*dh) + 3 f32 (bq, bk) transients."""
    for hp in (8, 4, 2, 1):
        if nh % hp:
            continue
        need = 8 * max(bq, bk) * hp * dh * itemsize + 3 * bq * bk * 4
        if need <= PACKED_VMEM_BUDGET:
            return hp
    return 1


def _fwd_hpacked_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                        *, scale: float, tk: int, block_k: int, rate: float,
                        hw: bool, hp: int, dh: int, nh: int):
    b = pl.program_id(0)
    g = pl.program_id(1)
    for h in range(hp):
        sl = slice(h * dh, (h + 1) * dh)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if tk % block_k != 0:
            s = _tail_mask(s, 0, tk, block_k)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        if rate > 0.0:
            keep = _keep_mask(seed_ref, b * nh + g * hp + h, jnp.int32(0),
                              jnp.int32(0), p.shape, rate, hw)
            p = jnp.where(keep, p, 0.0)
        out = jnp.dot(p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = (out / (l * (1.0 - rate))).astype(o_ref.dtype)
        lse = m + jnp.log(l)
        lse_ref[0, h * 8:(h + 1) * 8, :] = jnp.broadcast_to(
            lse.reshape(1, -1), (8, lse_ref.shape[2]))


def _bwd_hpacked_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, o_ref,
                        lse_ref, dq_ref, dk_ref, dv_ref,
                        *, scale: float, tk: int, block_k: int, rate: float,
                        hw: bool, hp: int, dh: int, nh: int):
    b = pl.program_id(0)
    g = pl.program_id(1)
    for h in range(hp):
        sl = slice(h * dh, (h + 1) * dh)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        do = do_ref[0, :, sl]
        o = o_ref[0, :, sl]
        lse = lse_ref[0, h * 8:h * 8 + 1, :].reshape(-1, 1)
        delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                        axis=-1, keepdims=True)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if tk % block_k != 0:
            s = _tail_mask(s, 0, tk, block_k)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if rate > 0.0:
            keep = _keep_mask(seed_ref, b * nh + g * hp + h, jnp.int32(0),
                              jnp.int32(0), p.shape, rate, hw)
            pd = jnp.where(keep, p / (1.0 - rate), 0.0)
            dp = jnp.where(keep, dp / (1.0 - rate), 0.0)
        else:
            pd = p
        dv_ref[0, :, sl] = jax.lax.dot_general(
            pd.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        ds = p * (dp - delta) * scale
        dq_ref[0, :, sl] = jnp.dot(
            ds.astype(k.dtype), k,
            preferred_element_type=jnp.float32).astype(dq_ref.dtype)
        dk_ref[0, :, sl] = jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _hpacked_specs(bq, bk, width, hp, nh):
    qspec = pl.BlockSpec((1, bq, width), lambda b, g: (b, 0, g),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, bk, width), lambda b, g: (b, 0, g),
                         memory_space=pltpu.VMEM)
    lspec = pl.BlockSpec((1, hp * 8, bq), lambda b, g: (b, g, 0),
                         memory_space=pltpu.VMEM)
    return qspec, kspec, lspec


def _flash_hpacked_call(q, k, v, seed, scale, true_tk, rate, hw, hp, nh):
    b, tq, dm = q.shape
    bk = k.shape[1]
    dh = dm // nh
    width = hp * dh
    qspec, kspec, lspec = _hpacked_specs(tq, bk, width, hp, nh)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_hpacked_kernel, scale=scale, tk=true_tk,
                          block_k=bk, rate=rate, hw=hw, hp=hp, dh=dh,
                          nh=nh),
        grid=(b, nh // hp),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  qspec, kspec, kspec],
        out_specs=[qspec, lspec],
        out_shape=[
            jax.ShapeDtypeStruct((b, tq, dm), q.dtype),
            jax.ShapeDtypeStruct((b, nh * 8, tq), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(seed, q, k, v)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _flash_hpacked(q, k, v, seed, scale: float, true_tk: int, rate: float,
                   hw: bool, hp: int, nh: int):
    out, _ = _flash_hpacked_call(q, k, v, seed, scale, true_tk, rate, hw,
                                 hp, nh)
    return out


def _flash_hpacked_fwd_rule(q, k, v, seed, scale, true_tk, rate, hw, hp,
                            nh):
    out, lse = _flash_hpacked_call(q, k, v, seed, scale, true_tk, rate, hw,
                                   hp, nh)
    return out, (q, k, v, seed, out, lse)


def _flash_hpacked_bwd_rule(scale, true_tk, rate, hw, hp, nh, res, g):
    q, k, v, seed, out, lse = res
    b, tq, dm = q.shape
    bk = k.shape[1]
    dh = dm // nh
    width = hp * dh
    qspec, kspec, lspec = _hpacked_specs(tq, bk, width, hp, nh)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_hpacked_kernel, scale=scale, tk=true_tk,
                          block_k=bk, rate=rate, hw=hw, hp=hp, dh=dh,
                          nh=nh),
        grid=(b, nh // hp),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  qspec, kspec, kspec, qspec, qspec, lspec],
        out_specs=[qspec, kspec, kspec],
        out_shape=[
            jax.ShapeDtypeStruct((b, tq, dm), q.dtype),
            jax.ShapeDtypeStruct((b, bk, dm), k.dtype),
            jax.ShapeDtypeStruct((b, bk, dm), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(seed, q, k, v, g, out, lse)
    return dq, dk, dv, jnp.zeros_like(seed)


_flash_hpacked.defvjp(_flash_hpacked_fwd_rule, _flash_hpacked_bwd_rule)


def flash_attention_packed_qkv(q: jnp.ndarray, k: jnp.ndarray,
                               v: jnp.ndarray, nhead: int,
                               dropout_rate: float = 0.0,
                               dropout_seed: jnp.ndarray | None = None
                               ) -> jnp.ndarray | None:
    """Flash attention on PACKED (B, T, H*dh) q/k/v — no head transpose.

    Applies when dh is a lane multiple (dh % 128 == 0) and the whole
    (padded) sequence fits a single block pair (T <= 512, same condition
    as the head-packed path).  Returns None when the layout doesn't
    qualify — the caller falls back to split_heads + `flash_attention`.
    Numerics and dropout mask stream match `flash_attention` bit-for-bit
    (same math, same per-(b*H+h) tile seeding).
    """
    b, tq, dm = q.shape
    tk = k.shape[1]
    if dm % nhead:
        return None
    dh = dm // nhead
    if dh % 128:
        return None
    bq = _cdiv(tq, 16) * 16
    bk = _cdiv(tk, 128) * 128
    if bq > DEFAULT_BLOCK_Q or bk > DEFAULT_BLOCK_K:
        return None  # multi-block sequence: use the grid kernel
    scale = 1.0 / (dh ** 0.5)
    rate = float(dropout_rate)
    if rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    if dropout_seed is None:
        dropout_seed = jnp.zeros((1,), jnp.int32)
    qf = _pad_to(q, 1, bq)
    kf = _pad_to(k, 1, bk)
    vf = _pad_to(v, 1, bk)
    hw = rate > 0.0 and not _interpret_active()
    seed = dropout_seed.astype(jnp.int32).reshape(1)
    hp = _pick_heads_hpacked(nhead, qf.shape[1], kf.shape[1], dh,
                             qf.dtype.itemsize)
    out = _flash_hpacked(qf, kf, vf, seed, scale, tk, rate, hw, hp, nhead)
    return out[:, :tq, :]


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _tail_mask(s, j, tk: int, block_k: int):
    """Mask the padded key tail with a (1, block_k) ROW iota broadcast —
    a full (bq, bk) int32 iota + compare chain was ~3 extra VPU passes
    over the score matrix, comparable to the QK matmul itself at dh<=128."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, s.shape[-1]), 1)
    return jnp.where(col + j * block_k < tk, s, NEG_INF)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr,
                *, scale: float, tk: int, block_k: int, rate: float,
                hw: bool, single_k: bool):
    j = pl.program_id(2)

    # Matmuls run on NATIVE-dtype operands with f32 accumulation
    # (preferred_element_type): with bf16 inputs the MXU runs at full bf16
    # rate instead of multi-pass f32 (~4x), and the numerics match the XLA
    # path exactly (attention_xla also feeds bf16 operands into an
    # f32-accumulating einsum).  Softmax statistics stay f32 in the VPU.
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if tk % block_k != 0:
        s = _tail_mask(s, j, tk, block_k)

    if single_k:
        # Whole key row in one block (the common case: T <= block_k): plain
        # softmax with no online-rescale chain and no scratch carries —
        # saves the alpha/acc VMEM round-trips and several VPU passes.
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        if rate > 0.0:
            keep = _keep_mask(seed_ref, pl.program_id(0), pl.program_id(1),
                              j, p.shape, rate, hw)
            p = jnp.where(keep, p, 0.0)
        out = jnp.dot(p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32)
        o_ref[0] = (out / (l * (1.0 - rate))).astype(o_ref.dtype)
        lse = m + jnp.log(l)
        lse_ref[0] = jnp.broadcast_to(lse.reshape(1, -1),
                                      lse_ref.shape[1:])
        return

    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    m_prev = m_scr[:]
    l_prev = l_scr[:]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    # The softmax denominator accumulates the UNdropped p (torch applies
    # dropout after the softmax), so l is dropout-independent.
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

    if rate > 0.0:
        keep = _keep_mask(seed_ref, pl.program_id(0), pl.program_id(1), j,
                          p.shape, rate, hw)
        p = jnp.where(keep, p, 0.0)

    # p quantizes to the value dtype before PV, as the XLA path does
    # (attention_xla: probs.astype(v.dtype)).
    acc_scr[:] = acc_scr[:] * alpha + jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    m_scr[:] = m_new
    l_scr[:] = l_new

    @pl.when(j == nk - 1)
    def _():
        l = l_scr[:]
        o_ref[0] = (acc_scr[:] / (l * (1.0 - rate))).astype(o_ref.dtype)
        # Compact per-row logsumexp, (block_q, 1) relaid to a lane row and
        # broadcast over 8 sublanes (Mosaic's minimum second-minor block).
        # This is the ONLY statistic the backward needs — 16x less HBM than
        # a 128-lane broadcast, which dominated the first version's time.
        lse = m_scr[:] + jnp.log(l)
        lse_ref[0] = jnp.broadcast_to(lse.reshape(1, -1),
                                      lse_ref.shape[1:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _flash(q, k, v, seed, scale: float, block_q: int, block_k: int,
           true_tk: int, rate: float, hw: bool):
    out, _ = _flash_call(q, k, v, seed, scale, block_q, block_k, true_tk,
                         rate, hw)
    return out


def _flash_call(q, k, v, seed, scale, block_q, block_k, true_tk, rate, hw):
    """q: (BH, Tq, D) k/v: (BH, Tk, D) — sequence axes pre-padded to block
    multiples (D stays the native head dim); `true_tk` masks the padded key
    tail.  seed: (1,) int32.  Returns (out, lse (BH, Tq) f32)."""
    bh, tq, d = q.shape
    tk = true_tk
    nq = _cdiv(tq, block_q)
    nk = k.shape[1] // block_k

    grid = (bh, nq, nk)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, tk=tk, block_k=block_k,
                          rate=rate, hw=hw, single_k=(nk == 1)),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_q), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nq * block_q, d), q.dtype),
            jax.ShapeDtypeStruct((bh, nq * 8, block_q), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(seed, q, k, v)
    return out, lse


def _delta_kernel(o_ref, do_ref, delta_ref):
    """Per-row delta = sum(dO * O), stored compact (8, block_q)."""
    o = o_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    delta = jnp.sum(o * do, axis=-1, keepdims=True)
    delta_ref[0] = jnp.broadcast_to(delta.reshape(1, -1),
                                    delta_ref.shape[1:])


def _dq_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
               dq_ref, acc_scr, *, scale: float, tk: int, block_k: int,
               rate: float, hw: bool):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # Native-dtype matmul operands, f32 accumulation (see _fwd_kernel).
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0][0:1, :].reshape(-1, 1)
    delta = delta_ref[0][0:1, :].reshape(-1, 1)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if tk % block_k != 0:
        s = _tail_mask(s, j, tk, block_k)
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if rate > 0.0:
        keep = _keep_mask(seed_ref, pl.program_id(0), pl.program_id(1), j,
                          p.shape, rate, hw)
        # ds = P * (M . dp/(1-r) - delta): mask/rescale dp where it stands
        # in for dP (see module docstring — delta is dropout-exact).
        dp = jnp.where(keep, dp / (1.0 - rate), 0.0)
    ds = p * (dp - delta) * scale
    acc_scr[:] += jnp.dot(ds.astype(k.dtype), k,
                          preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _():
        dq_ref[0] = acc_scr[:].astype(dq_ref.dtype)


def _dkv_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, dk_scr, dv_scr,
                *, scale: float, tk: int, block_k: int, rate: float,
                hw: bool):
    i = pl.program_id(2)  # query-block index (innermost)
    nq = pl.num_programs(2)

    @pl.when(i == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    # Native-dtype matmul operands, f32 accumulation (see _fwd_kernel).
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0][0:1, :].reshape(-1, 1)
    delta = delta_ref[0][0:1, :].reshape(-1, 1)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    j = pl.program_id(1)
    if tk % block_k != 0:
        s = _tail_mask(s, j, tk, block_k)
    p = jnp.exp(s - lse)  # (bq, bk)
    if rate > 0.0:
        # Same (b, q-block, k-block) seeding as the forward: this grid is
        # (bh, nk, nq), so the q-block index is program_id(2) and the
        # k-block index program_id(1).
        keep = _keep_mask(seed_ref, pl.program_id(0), i, j, p.shape, rate,
                          hw)
        pd = jnp.where(keep, p / (1.0 - rate), 0.0)
    else:
        pd = p
    dv_scr[:] += jax.lax.dot_general(pd.astype(do.dtype), do,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if rate > 0.0:
        dp = jnp.where(keep, dp / (1.0 - rate), 0.0)
    ds = p * (dp - delta) * scale  # (bq, bk)
    dk_scr[:] += jax.lax.dot_general(ds.astype(q.dtype), q,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)

    @pl.when(i == nq - 1)
    def _():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_fwd_rule(q, k, v, seed, scale, block_q, block_k, true_tk, rate,
                    hw):
    out, lse = _flash_call(q, k, v, seed, scale, block_q, block_k,
                           true_tk, rate, hw)
    return out, (q, k, v, seed, out, lse)


def _flash_bwd_rule(scale, block_q, block_k, true_tk, rate, hw, res, g):
    q, k, v, seed, out, lse = res
    bh, tq, d = q.shape
    tk = true_tk
    nq = tq // block_q
    nk = k.shape[1] // block_k

    # Stage 1: per-row delta = sum(dO * O), compact (BH, Tq).
    delta = pl.pallas_call(
        _delta_kernel,
        grid=(bh, nq),
        in_specs=[pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((1, 8, block_q), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, nq * 8, block_q), jnp.float32),
    )(out, g)

    stat_spec = pl.BlockSpec((1, 8, block_q), lambda b, i, j: (b, i, 0),
                             memory_space=pltpu.VMEM)

    # Stage 2: dQ (accumulate over key blocks).
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, tk=tk, block_k=block_k,
                          rate=rate, hw=hw),
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            stat_spec,
            stat_spec,
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(seed, q, k, v, g, lse, delta)

    # Stage 3: dK/dV (accumulate over query blocks, innermost).
    stat_spec_kv = pl.BlockSpec((1, 8, block_q), lambda b, j, i: (b, i, 0),
                                memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, tk=tk, block_k=block_k,
                          rate=rate, hw=hw),
        grid=(bh, nk, nq),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            stat_spec_kv,
            stat_spec_kv,
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((bh, nk * block_k, d), k.dtype)] * 2,
        scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(seed, q, k, v, g, lse, delta)

    return dq, dk, dv, jnp.zeros_like(seed)


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K,
                    dropout_rate: float = 0.0,
                    dropout_seed: jnp.ndarray | None = None) -> jnp.ndarray:
    """(B, H, Tq, dh) x (B, H, Tk, dh) -> (B, H, Tq, dh), flash-style.

    The head dim runs as a native narrow block (no 128-lane padding); Tq/Tk
    not divisible by the block sizes are padded + masked.

    With dropout_rate > 0, attention-probability dropout (torch MHA training
    semantics) runs in-kernel; `dropout_seed` must be an int32 array of
    shape (1,) — the same seed reproduces the same mask.
    """
    b, h, tq, dh = q.shape
    tk = k.shape[2]
    scale = 1.0 / (dh ** 0.5)
    rate = float(dropout_rate)
    if rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    if dropout_seed is None:
        dropout_seed = jnp.zeros((1,), jnp.int32)

    qf = q.reshape(b * h, tq, dh)
    kf = k.reshape(b * h, tk, dh)
    vf = v.reshape(b * h, tk, dh)
    # Round the query block to a sublane multiple (16 covers bf16's
    # (16, 128) tile; fine for f32 too); key blocks to full lanes.
    bq = min(block_q, _cdiv(tq, 16) * 16)
    bk = min(block_k, _cdiv(tk, 128) * 128)
    qf = _pad_to(qf, 1, bq)
    kf = _pad_to(kf, 1, bk)
    vf = _pad_to(vf, 1, bk)

    hw = rate > 0.0 and not _interpret_active()
    seed = dropout_seed.astype(jnp.int32).reshape(1)
    if qf.shape[1] == bq and kf.shape[1] == bk:
        # Whole sequence in one block pair: use the head-packed path —
        # HP heads per program and a single fused backward kernel (see
        # the packed section above).  hp=1 still wins (1 bwd kernel
        # instead of 3 and no delta round trip).
        hp = _pick_heads_per_block(b * h, bq, bk, dh, qf.dtype.itemsize)
        out = _flash_packed(qf, kf, vf, seed, scale, tk, rate, hw, hp)
        return out[:, :tq, :].reshape(b, h, tq, dh)
    out = _flash(qf, kf, vf, seed, scale, bq, bk, tk, rate, hw)
    return out[:, :tq, :].reshape(b, h, tq, dh)
