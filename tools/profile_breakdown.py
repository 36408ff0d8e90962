"""Module-level timing breakdown of a training step on the chip.

Times each piece under jit with K-fold lax.scan dispatch (same value-transfer
sync discipline as bench.py) to attribute step time: visual conv stem,
full visual encoder, audio encoder, fusion, decoder, loss+bwd, on-device
data generation.

Two methodology rules this file learned the hard way:
  - Tensors are passed as jit ARGUMENTS, never closed over: closure
    constants embed in the HLO and blow the remote-compile request limit
    on big configs (HTTP 413).
  - The full-train-step section THREADS the state through the scan;
    feeding the same state to every iteration lets XLA dead-code-eliminate
    the entire backward+optimizer (grads of a discarded state are unused),
    which silently reports fwd-only time.

Usage: python tools/profile_breakdown.py [--config demo] [--batch 128]
           [--k 20] [--dtype bfloat16] [--impl xla|pallas]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from av_separation_tpu import get_config
from av_separation_tpu.train import create_train_state
from av_separation_tpu.utils.cache import enable_compilation_cache

RESULTS = []


_OVERHEAD_S = None


def _dispatch_overhead(reps=5):
    """Per-call dispatch+sync cost of the (tunneled) backend, measured once
    with an empty jitted program — subtracted from every section so small
    sections aren't swamped by it."""
    global _OVERHEAD_S
    if _OVERHEAD_S is None:
        f = jax.jit(lambda x: x + 1.0)
        x = jnp.float32(0)
        float(np.asarray(f(x)))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(f(x)))
            best = min(best, time.perf_counter() - t0)
        _OVERHEAD_S = best
        print(f"{'[dispatch+sync overhead per call]':44s} "
              f"{best * 1e3:8.3f} ms", flush=True)
    return _OVERHEAD_S


def timed(name, fn, *args, k=20, reps=3):
    """Time fn(*args) under a k-iteration scan; sync by fetching the scalar.

    fn's outputs are folded into a scalar carry so every iteration is live,
    and the inputs are routed THROUGH an optimization_barrier together with
    the carry — without that loop-carried data dependency XLA hoists the
    (loop-invariant) body out of the scan and every section "measures" the
    same dispatch overhead.  args are jit arguments (not constants), so big
    tensors don't inflate the compiled program past the remote-compile
    request limit.
    """
    def scanned(*args):
        def body(carry, _):
            c, a = jax.lax.optimization_barrier((carry, args))
            out = fn(*a)
            s = sum(jnp.sum(x.astype(jnp.float32))
                    for x in jax.tree.leaves(out))
            return c + s, None
        return jax.lax.scan(body, jnp.float32(0), None, length=k)[0]

    overhead = _dispatch_overhead()
    jfn = jax.jit(scanned)
    float(np.asarray(jfn(*args)))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(jfn(*args)))
        best = min(best, (time.perf_counter() - t0 - overhead) / k)
    print(f"{name:44s} {best * 1e3:8.3f} ms/step", flush=True)
    RESULTS.append({"section": name, "ms_per_step": round(best * 1e3, 3)})
    return best


def timed_threaded(name, step_fn, state, batch, k=20, reps=3):
    """Time a REAL train step with the state threaded through the scan —
    the backward pass and optimizer update stay live in the program."""
    def scanned(state, batch):
        def body(s, _):
            s2, metrics = step_fn(s, batch)
            return s2, metrics["loss"]
        final, losses = jax.lax.scan(body, state, None, length=k)
        return losses[-1]

    overhead = _dispatch_overhead()
    jfn = jax.jit(scanned)
    float(np.asarray(jfn(state, batch)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(jfn(state, batch)))
        best = min(best, (time.perf_counter() - t0 - overhead) / k)
    print(f"{name:44s} {best * 1e3:8.3f} ms/step", flush=True)
    RESULTS.append({"section": name, "ms_per_step": round(best * 1e3, 3)})
    return best


def timed_grad(name, fn, *args, k=20, reps=3):
    """Time fwd+bwd of fn: grad of sum(fn(*args)) wrt args[0]."""
    def loss(*a):
        out = fn(*a)
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree.leaves(out))
    g = jax.grad(loss, argnums=0)
    return timed(name, g, *args, k=k, reps=reps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="demo")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--impl", default=None)
    ap.add_argument("--json-out", default=None,
                    help="append per-section JSONL records here")
    args = ap.parse_args()
    enable_compilation_cache()

    cfg = get_config(args.config)
    model_kw = {"compute_dtype": args.dtype}
    if args.impl:
        model_kw.update(attn_impl=args.impl, decoder_impl=args.impl,
                        proj_impl=args.impl)
    cfg = dataclasses.replace(
        cfg, model=cfg.model.replace(**model_kw),
        train=dataclasses.replace(cfg.train, batch_size=args.batch))
    d = cfg.data
    b = args.batch
    print(f"config={args.config} batch={b} dtype={args.dtype} "
          f"impl={args.impl or 'xla'}", flush=True)
    model, state = create_train_state(cfg)
    params = state.params
    rng = np.random.default_rng(0)
    mixed = jnp.asarray(rng.normal(size=(b, d.freq_bins, d.num_stft_frames))
                        .astype(np.float32))
    frames = jnp.asarray(
        rng.normal(size=(b, d.total_lip_frames, d.frame_h, d.frame_w))
        .astype(np.float32))
    clean = jnp.asarray(
        rng.normal(size=(b, d.num_speakers, d.freq_bins, d.num_stft_frames))
        .astype(np.float32))
    batch = {"mixed_spec": mixed, "lip_frames": frames, "clean_specs": clean}
    k = args.k

    # full train step, state threaded (bwd + Adam live); the raw body (no
    # jit/donation) — the scan carries the state internally.
    from av_separation_tpu.train import _train_step_body
    raw_step = _train_step_body(model, cfg)
    timed_threaded("full train step (fwd+bwd+adam)", raw_step, state, batch,
                   k=k)

    # on-device data generation (what the fused path adds per step)
    from av_separation_tpu.data.device_synthetic import generate_batch
    key = jax.random.key(0, impl=cfg.train.rng_impl)
    def datagen(key):
        batch = generate_batch(key, d, b)
        return (batch["mixed_spec"],)
    timed("on-device data generation", datagen, key, k=k)

    # fwd only
    variables = {"params": params, "batch_stats": state.batch_stats}
    def fwd(variables, mixed, frames):
        sep, masks = model.apply(variables, mixed, frames,
                                 deterministic=True)
        return (jnp.sum(sep.astype(jnp.float32)),)
    timed("forward only", fwd, variables, mixed, frames, k=k)

    # visual conv stem: throwaway module with the same params
    import flax.linen as nn
    from av_separation_tpu.models.layers import TorchBatchNorm, dense
    from av_separation_tpu.models.model import VisualEncoder, _cdt, _conv

    venc = VisualEncoder(cfg.model)
    vvars = {"params": params["visual_encoder"],
             "batch_stats": state.batch_stats["visual_encoder"]}
    def vis(vvars, frames):
        out = venc.apply(vvars, frames, d.num_stft_frames,
                         deterministic=True)
        return (jnp.sum(out.astype(jnp.float32)),)
    timed("visual encoder (stem+tfmr+interp)", vis, vvars, frames, k=k)

    class Stem(nn.Module):
        cfg: object
        train_bn: bool = False

        @nn.compact
        def __call__(self, fr):
            bsz, n, hh, ww = fr.shape
            x = fr.reshape(bsz * n, hh, ww, 1)
            for i, ch in enumerate((32, 64, 128)):
                x = _conv(ch, (3, 3), (2, 2), [(1, 1), (1, 1)],
                          f"conv{i + 1}", _cdt(self.cfg))(x)
                x = TorchBatchNorm(ch, name=f"bn{i + 1}")(
                    x, use_running_average=not self.train_bn)
                x = nn.relu(x)
            x = jnp.mean(x, axis=(1, 2))
            return dense(self.cfg.d_model, 128, "frame_proj",
                         _cdt(self.cfg))(x)

    sp = {k2: params["visual_encoder"][k2]
          for k2 in ("conv1", "conv2", "conv3", "frame_proj",
                     "bn1", "bn2", "bn3")}
    sb = {k2: state.batch_stats["visual_encoder"][k2]
          for k2 in ("bn1", "bn2", "bn3")}
    svars = {"params": sp, "batch_stats": sb}

    stem_eval = Stem(cfg.model, train_bn=False)
    def stem_fn(svars, frames):
        return (jnp.sum(stem_eval.apply(svars, frames)
                        .astype(jnp.float32)),)
    timed("visual conv stem fwd (eval BN)", stem_fn, svars, frames, k=k)

    stem_train = Stem(cfg.model, train_bn=True)
    def stem_train_fn(svars, frames):
        out, _ = stem_train.apply(svars, frames, mutable=["batch_stats"])
        return (jnp.sum(out.astype(jnp.float32)),)
    timed("visual conv stem fwd (train BN)", stem_train_fn, svars, frames,
          k=k)

    def stem_loss(svars, frames):
        out, _ = stem_train.apply(svars, frames, mutable=["batch_stats"])
        return (jnp.sum(out.astype(jnp.float32)),)
    timed_grad("visual conv stem fwd+bwd (train BN)", stem_loss, svars,
               frames, k=k)

    # audio encoder
    from av_separation_tpu.models.model import AudioEncoder
    aenc = AudioEncoder(cfg.model)
    avars = {"params": params["audio_encoder"]}
    def aud(avars, mixed):
        out = aenc.apply(avars, mixed, deterministic=True)
        return (jnp.sum(out.astype(jnp.float32)),)
    timed("audio encoder", aud, avars, mixed, k=k)

    # fusion stack (audio-Q over T-resampled visual stream)
    from av_separation_tpu.models.model import CrossModalFusion
    fus = CrossModalFusion(cfg.model)
    t = d.num_stft_frames
    a_emb = jnp.asarray(rng.normal(size=(b, t, cfg.model.d_model))
                        .astype(np.float32))
    v_emb = jnp.asarray(rng.normal(size=(b, t, cfg.model.d_model))
                        .astype(np.float32))
    fvars = {"params": params["fusion"]}
    def fuse(fvars, a_emb, v_emb):
        out = fus.apply(fvars, a_emb, v_emb, deterministic=True)
        return (jnp.sum(out.astype(jnp.float32)),)
    timed("fusion stack", fuse, fvars, a_emb, v_emb, k=k)

    # decoder (mask MLP + sigmoid + apply)
    from av_separation_tpu.models.model import SeparationDecoder
    dec = SeparationDecoder(cfg.model)
    fused_in = jnp.asarray(rng.normal(size=(b, t, cfg.model.d_model))
                           .astype(np.float32))
    dvars = {"params": params["decoder"]}
    def decode(dvars, fused_in, mixed):
        sep, masks = dec.apply(dvars, fused_in, deterministic=True,
                               mixed_spec=mixed)
        return (jnp.sum(sep.astype(jnp.float32)),)
    timed("decoder (MLP+sigmoid+apply)", decode, dvars, fused_in, mixed, k=k)

    # loss (PIT over S!) on fixed tensors
    from av_separation_tpu.losses import separation_loss
    sep_fix = jnp.asarray(rng.normal(
        size=(b, d.num_speakers, d.freq_bins, t)).astype(np.float32))
    def loss_fn(sep_fix, clean):
        return (separation_loss(sep_fix, clean),)
    timed("PIT loss (fwd only)", loss_fn, sep_fix, clean, k=k)
    timed_grad("PIT loss (fwd+bwd)", loss_fn, sep_fix, clean, k=k)

    # Training-mode fwd+bwd per transformer component: attributes the
    # backward-pass gap (full step minus ~3x forward) to attention residual
    # traffic vs dropout-mask traffic vs everything else.  grad is wrt the
    # params arg, so the full activation backward runs.
    drng = jax.random.key(7, impl=cfg.train.rng_impl)

    timed_grad("audio encoder fwd+bwd (eval)", aud, avars, mixed, k=k)

    def aud_train(avars, mixed):
        out = aenc.apply(avars, mixed, deterministic=False,
                         rngs={"dropout": drng})
        return (jnp.sum(out.astype(jnp.float32)),)
    timed_grad("audio encoder fwd+bwd (train)", aud_train, avars, mixed, k=k)

    timed_grad("fusion fwd+bwd (eval)", fuse, fvars, a_emb, v_emb, k=k)

    def fuse_train(fvars, a_emb, v_emb):
        out = fus.apply(fvars, a_emb, v_emb, deterministic=False,
                        rngs={"dropout": drng})
        return (jnp.sum(out.astype(jnp.float32)),)
    timed_grad("fusion fwd+bwd (train)", fuse_train, fvars, a_emb, v_emb,
               k=k)

    def vis_train(vvars, frames):
        out, _ = venc.apply(vvars, frames, d.num_stft_frames,
                            deterministic=False, rngs={"dropout": drng},
                            mutable=["batch_stats"])
        return (jnp.sum(out.astype(jnp.float32)),)
    timed_grad("visual encoder fwd+bwd (train)", vis_train, vvars, frames,
               k=k)

    def dec_train(dvars, fused_in, mixed):
        sep, masks = dec.apply(dvars, fused_in, deterministic=False,
                               rngs={"dropout": drng}, mixed_spec=mixed)
        return (jnp.sum(sep.astype(jnp.float32)),)
    timed_grad("decoder fwd+bwd (train)", dec_train, dvars, fused_in, mixed,
               k=k)

    if args.json_out:
        with open(args.json_out, "a") as f:
            for r in RESULTS:
                r.update(config=args.config, batch=b, dtype=args.dtype,
                         impl=args.impl or "xla")
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
