"""Compiled-on-TPU verification of every Pallas kernel.

CI gates the kernels in interpreter mode on CPU (tests/test_kernels.py) where
f32 arithmetic is exact.  On the real chip BOTH the Pallas kernels and the
XLA lowering round f32 matmuls through the MXU's bf16 passes (default matmul
precision), so comparing them to each other at interpreter tolerances only
measures bf16 noise.  This harness instead computes an exact reference on
the host CPU backend (same process, true f32) and records, per check, the
max error of (a) the compiled Pallas kernel and (b) the compiled XLA
lowering against that reference.  A kernel PASSES when its error is no
worse than ~2x the XLA path's own rounding error (plus a small floor) —
i.e. the kernel is as close to the true result as the compiler's code.

Usage: python tools/verify_kernels_tpu.py [--out bench_results/kernel_allclose_tpu.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

RESULTS = []


def rand(shape, seed=0, scale=1.0):
    return jnp.asarray(np.random.default_rng(seed).normal(
        size=shape).astype(np.float32) * scale)


def on_cpu(fn, *args):
    """Run fn on the host CPU backend (exact f32) as the reference."""
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        cargs = jax.device_put(args, cpu)
        return jax.tree.map(np.asarray, jax.jit(fn)(*cargs))


def record(name, pallas_out, xla_out, ref, floor):
    """Gate: compiled-Pallas error vs exact ref must be <= 2x the
    compiled-XLA error + floor (both round through the MXU's bf16)."""
    def err(x):
        return float(np.max(np.abs(np.asarray(x, np.float64)
                                   - np.asarray(ref, np.float64))))
    e_pallas, e_xla = err(pallas_out), err(xla_out)
    ok = e_pallas <= 2.0 * e_xla + floor
    RESULTS.append({"check": name, "pallas_vs_ref_max_abs": e_pallas,
                    "xla_vs_ref_max_abs": e_xla, "floor": floor,
                    "pass": bool(ok)})
    print(f"{'PASS' if ok else 'FAIL'}  {name:44s} "
          f"pallas={e_pallas:.3e} xla={e_xla:.3e}", flush=True)
    return ok


def check_attention():
    from av_separation_tpu.ops.attention import attention_xla
    from av_separation_tpu.ops.pallas.attention import flash_attention

    for tq, tk, dh in [(63, 50, 32), (128, 128, 64), (501, 501, 64),
                       (376, 75, 64), (200, 37, 64)]:
        q, k, v = (rand((2, 4, t, dh), i) for i, t in
                   enumerate((tq, tk, tk)))
        ref = on_cpu(attention_xla, q, k, v)
        ours = jax.jit(flash_attention)(q, k, v)
        xla = jax.jit(attention_xla)(q, k, v)
        record(f"flash_attention fwd tq={tq} tk={tk} dh={dh}",
               ours, xla, ref, floor=1e-4)

    q, k, v = rand((1, 2, 63, 32), 0), rand((1, 2, 50, 32), 1), \
        rand((1, 2, 50, 32), 2)
    g = rand((1, 2, 63, 32), 3)

    def grads(attn):
        return jax.grad(lambda *a: jnp.vdot(attn(*a), g),
                        argnums=(0, 1, 2))

    gref = on_cpu(grads(attention_xla), q, k, v)
    gp = jax.jit(grads(flash_attention))(q, k, v)
    gx = jax.jit(grads(attention_xla))(q, k, v)
    for name, a, b, r in zip("qkv", gp, gx, gref):
        record(f"flash_attention bwd d{name}", a, b, r, floor=5e-4)


def check_decoder():
    from av_separation_tpu.ops.pallas.decoder import fused_mask_decoder

    b, t, d, s, f = 2, 63, 128, 2, 257
    r = np.random.default_rng(0)
    fused = jnp.asarray(r.normal(size=(b, t, d)).astype(np.float32))
    w1 = jnp.asarray(r.normal(size=(d, 2 * d)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(r.normal(size=(2 * d,)).astype(np.float32) * 0.05)
    w2 = jnp.asarray(r.normal(size=(2 * d, s * f)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(r.normal(size=(s * f,)).astype(np.float32) * 0.05)
    mixed = jnp.asarray(r.normal(size=(b, f, t)).astype(np.float32))

    def reference(fused, w1, b1, w2, b2, mixed):
        h = jax.nn.gelu(fused @ w1 + b1, approximate=False)
        logits = h @ w2 + b2
        masks = jax.nn.sigmoid(
            logits.reshape(b, t, s, f).transpose(0, 2, 3, 1))
        return masks * mixed[:, None], masks

    args = (fused, w1, b1, w2, b2, mixed)
    ref_sep, ref_masks = on_cpu(reference, *args)
    sep_p, mask_p = jax.jit(lambda *a: fused_mask_decoder(*a, s, f))(*args)
    sep_x, mask_x = jax.jit(reference)(*args)
    record("fused_mask_decoder fwd masks", mask_p, mask_x, ref_masks,
           floor=1e-5)
    record("fused_mask_decoder fwd separated", sep_p, sep_x, ref_sep,
           floor=1e-4)

    def grads(dec):
        return jax.grad(lambda *a: jnp.sum(jnp.square(dec(*a)[0])),
                        argnums=(0, 1, 3))

    gref = on_cpu(grads(reference), *args)
    gp = jax.jit(grads(lambda *a: fused_mask_decoder(*a, s, f)))(*args)
    gx = jax.jit(grads(reference))(*args)
    for name, a, b_, r_ in zip(("fused", "w1", "w2"), gp, gx, gref):
        record(f"fused_mask_decoder bwd d{name}", a, b_, r_, floor=1e-3)


def check_stft():
    from av_separation_tpu.data.synthetic import stft_magnitude_np
    from av_separation_tpu.ops.stft import stft_magnitude
    from av_separation_tpu.ops.pallas.stft import stft_magnitude_pallas

    rng = np.random.default_rng(0)
    audio = rng.normal(size=(3, 8000)).astype(np.float32)
    host = np.stack([stft_magnitude_np(a, 512, 128, 63) for a in audio])
    dev = jax.jit(lambda a: stft_magnitude_pallas(a, 512, 128, 63))(
        jnp.asarray(audio))
    xla = jax.jit(lambda a: stft_magnitude(a, 512, 128, 63))(
        jnp.asarray(audio))
    record("stft_magnitude vs host numpy reference", dev, xla, host,
           floor=1e-3)


def check_audio_proj():
    from av_separation_tpu.ops.pallas.audio_proj import (
        _xla_reference, fused_audio_projection)

    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(2, 63, 257)).astype(np.float32))
    w1 = jnp.asarray(r.normal(size=(3, 257, 128)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(r.normal(size=(128,)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(r.normal(size=(3, 128, 128)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(r.normal(size=(128,)).astype(np.float32) * 0.1)
    args = (x, w1, b1, w2, b2)

    ref = on_cpu(_xla_reference, *args)
    ours = jax.jit(fused_audio_projection)(*args)
    xla = jax.jit(_xla_reference)(*args)
    record("fused_audio_projection fwd", ours, xla, ref, floor=1e-3)

    def grads(fn):
        return jax.grad(lambda *a: jnp.sum(jnp.square(fn(*a))),
                        argnums=(0, 1, 3))

    gref = on_cpu(grads(_xla_reference), *args)
    gp = jax.jit(grads(fused_audio_projection))(*args)
    gx = jax.jit(grads(_xla_reference))(*args)
    for name, a, b_, r_ in zip(("x", "w1", "w2"), gp, gx, gref):
        record(f"fused_audio_projection bwd d{name}", a, b_, r_, floor=1e-2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "bench_results",
        "kernel_allclose_tpu.json"))
    args = ap.parse_args()

    backend = jax.default_backend()
    print(f"backend={backend} devices={jax.devices()}", flush=True)
    check_attention()
    check_decoder()
    check_stft()
    check_audio_proj()

    n_fail = sum(not r["pass"] for r in RESULTS)
    payload = {"backend": backend, "device": str(jax.devices()[0]),
               "gate": "pallas_err <= 2 * xla_err + floor, both vs exact "
                       "CPU-f32 reference (TPU matmuls round via bf16)",
               "checks": RESULTS, "failures": n_fail}
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"{len(RESULTS) - n_fail}/{len(RESULTS)} passed -> {args.out}",
          flush=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
