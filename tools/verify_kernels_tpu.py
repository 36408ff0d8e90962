"""Compiled-on-TPU allclose verification of every Pallas kernel.

CI gates the kernels in interpreter mode on CPU (tests/test_kernels.py);
this harness runs the SAME comparisons compiled natively on the real chip
and records max-abs-error per kernel (fwd and bwd) to a JSON artifact, so
the compiled kernels' numerics are a committed fact rather than a claim.

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


def record(name, ours, ref, atol, rtol):
    ours, ref = np.asarray(ours, np.float64), np.asarray(ref, np.float64)
    err = float(np.max(np.abs(ours - ref)))
    rel = float(np.max(np.abs(ours - ref) / (np.abs(ref) + 1e-6)))
    ok = bool(np.allclose(ours, ref, atol=atol, rtol=rtol))
    RESULTS.append({"check": name, "max_abs_err": err, "max_rel_err": rel,
                    "atol": atol, "rtol": rtol, "pass": ok})
    print(f"{'PASS' if ok else 'FAIL'}  {name:44s} "
          f"max_abs={err:.3e} max_rel={rel:.3e}", flush=True)
    return ok


def check_attention():
    from av_separation_tpu.ops.attention import attention_xla
    from av_separation_tpu.ops.pallas.attention import flash_attention

    for tq, tk, dh in [(63, 50, 32), (128, 128, 64), (501, 501, 64),
                       (376, 75, 64), (200, 37, 64)]:
        q, k, v = (rand((2, 4, t, dh), i) for i, t in
                   enumerate((tq, tk, tk)))
        ours = jax.jit(flash_attention)(q, k, v)
        ref = jax.jit(attention_xla)(q, k, v)
        record(f"flash_attention fwd tq={tq} tk={tk} dh={dh}",
               ours, ref, 2e-5, 1e-3)

    q, k, v = rand((1, 2, 63, 32), 0), rand((1, 2, 50, 32), 1), \
        rand((1, 2, 50, 32), 2)
    g = rand((1, 2, 63, 32), 3)
    gp = jax.jit(jax.grad(lambda *a: jnp.vdot(flash_attention(*a), g),
                          argnums=(0, 1, 2)))(q, k, v)
    gr = jax.jit(jax.grad(lambda *a: jnp.vdot(attention_xla(*a), g),
                          argnums=(0, 1, 2)))(q, k, v)
    for name, a, b in zip("qkv", gp, gr):
        record(f"flash_attention bwd d{name}", a, b, 5e-5, 1e-2)


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

    sep_p, mask_p = jax.jit(
        lambda *a: fused_mask_decoder(*a, s, f))(fused, w1, b1, w2, b2, mixed)
    sep_r, mask_r = jax.jit(reference)(fused, w1, b1, w2, b2, mixed)
    record("fused_mask_decoder fwd masks", mask_p, mask_r, 2e-6, 1e-4)
    record("fused_mask_decoder fwd separated", sep_p, sep_r, 2e-5, 1e-4)

    gp = jax.jit(jax.grad(
        lambda *a: jnp.sum(jnp.square(fused_mask_decoder(*a, s, f)[0])),
        argnums=(0, 1, 3)))(fused, w1, b1, w2, b2, mixed)
    gr = jax.jit(jax.grad(
        lambda *a: jnp.sum(jnp.square(reference(*a)[0])),
        argnums=(0, 1, 3)))(fused, w1, b1, w2, b2, mixed)
    for name, a, b in zip(("fused", "w1", "w2"), gp, gr):
        record(f"fused_mask_decoder bwd d{name}", a, b, 1e-3, 1e-2)


def check_stft():
    from av_separation_tpu.data.synthetic import stft_magnitude_np
    from av_separation_tpu.ops.pallas.stft import stft_magnitude_pallas

    rng = np.random.default_rng(0)
    audio = rng.normal(size=(3, 8000)).astype(np.float32)
    host = np.stack([stft_magnitude_np(a, 512, 128, 63) for a in audio])
    dev = jax.jit(lambda a: stft_magnitude_pallas(a, 512, 128, 63))(
        jnp.asarray(audio))
    record("stft_magnitude_pallas vs host reference", dev, host, 5e-4, 1e-3)


def check_audio_proj():
    from av_separation_tpu.ops.pallas.audio_proj import (
        _xla_reference, fused_audio_projection)

    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(2, 63, 257)).astype(np.float32))
    w1 = jnp.asarray(r.normal(size=(3, 257, 128)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(r.normal(size=(128,)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(r.normal(size=(3, 128, 128)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(r.normal(size=(128,)).astype(np.float32) * 0.1)
    ours = jax.jit(fused_audio_projection)(x, w1, b1, w2, b2)
    ref = jax.jit(_xla_reference)(x, w1, b1, w2, b2)
    record("fused_audio_projection fwd", ours, ref, 2e-4, 1e-3)

    gp = jax.jit(jax.grad(lambda *a: jnp.sum(
        jnp.square(fused_audio_projection(*a))), argnums=(0, 1, 3)))(
        x, w1, b1, w2, b2)
    gr = jax.jit(jax.grad(lambda *a: jnp.sum(
        jnp.square(_xla_reference(*a))), argnums=(0, 1, 3)))(
        x, w1, b1, w2, b2)
    for name, a, b in zip(("x", "w1", "w2"), gp, gr):
        record(f"fused_audio_projection bwd d{name}", a, b, 5e-2, 1e-2)


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
               "checks": RESULTS, "failures": n_fail}
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"{len(RESULTS) - n_fail}/{len(RESULTS)} passed -> {args.out}",
          flush=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
