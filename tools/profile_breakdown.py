"""Module-level timing breakdown of a training step on the chip.

Times each piece under jit with K-fold lax.scan dispatch (same value-transfer
sync discipline as bench.py) to attribute step time: visual conv stem,
full visual encoder, audio encoder, fusion, decoder, loss+bwd, on-device
data generation.

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
from av_separation_tpu.train import create_train_state, make_train_step
from av_separation_tpu.utils.cache import enable_compilation_cache

RESULTS = []


def timed(name, fn, *args, k=20, reps=3):
    """Time fn under a k-iteration scan; sync by fetching the scalar result."""
    def body(carry, _):
        out = fn(*args)
        # fold output into a scalar so every iteration is live
        s = sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(out))
        return carry + s, None

    scanned = jax.jit(lambda: jax.lax.scan(body, 0.0, None, length=k)[0])
    float(np.asarray(scanned()))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(scanned()))
        best = min(best, (time.perf_counter() - t0) / k)
    print(f"{name:38s} {best * 1e3:8.3f} ms/step", flush=True)
    RESULTS.append({"section": name, "ms_per_step": round(best * 1e3, 3)})
    return best


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
    k = args.k

    # full train step
    step_fn = make_train_step(model, cfg)
    st = state
    def full(s):
        s2, m = step_fn(s, {"mixed_spec": mixed, "lip_frames": frames,
                            "clean_specs": clean})
        return (m["loss"],)
    timed("full train step (fwd+bwd+adam)", full, st, k=k)

    # on-device data generation (what the fused path adds per step)
    from av_separation_tpu.data.device_synthetic import generate_batch
    key = jax.random.key(0, impl=cfg.train.rng_impl)
    def datagen():
        batch = generate_batch(key, d, b)
        return (batch["mixed_spec"],)
    timed("on-device data generation", datagen, k=k)

    # fwd only
    variables = {"params": params, "batch_stats": state.batch_stats}
    def fwd():
        sep, masks = model.apply(variables, mixed, frames,
                                 deterministic=True)
        return (jnp.sum(sep.astype(jnp.float32)),)
    timed("forward only", fwd, k=k)

    # visual conv stem only (conv+bn+relu x3 + pool + proj), isolated
    import flax.linen as nn
    from av_separation_tpu.models.model import VisualEncoder

    venc = VisualEncoder(cfg.model)
    vvars = {"params": params["visual_encoder"],
             "batch_stats": state.batch_stats["visual_encoder"]}
    def vis():
        out = venc.apply(vvars, frames, d.num_stft_frames,
                         deterministic=True)
        return (jnp.sum(out.astype(jnp.float32)),)
    timed("visual encoder (stem+tfmr+interp)", vis, k=k)

    # just the conv stem via a throwaway module with the same params
    from av_separation_tpu.models.model import _conv, _cdt
    from av_separation_tpu.models.layers import TorchBatchNorm, dense

    class Stem(nn.Module):
        cfg: object

        @nn.compact
        def __call__(self, fr):
            bsz, n, hh, ww = fr.shape
            x = fr.reshape(bsz * n, hh, ww, 1)
            for i, ch in enumerate((32, 64, 128)):
                x = _conv(ch, (3, 3), (2, 2), [(1, 1), (1, 1)],
                          f"conv{i + 1}", _cdt(self.cfg))(x)
                x = TorchBatchNorm(ch, name=f"bn{i + 1}")(
                    x, use_running_average=True)
                x = nn.relu(x)
            x = jnp.mean(x, axis=(1, 2))
            return dense(self.cfg.d_model, 128, "frame_proj",
                         _cdt(self.cfg))(x)

    stem = Stem(cfg.model)
    sp = {k2: params["visual_encoder"][k2]
          for k2 in ("conv1", "conv2", "conv3", "frame_proj",
                     "bn1", "bn2", "bn3")}
    sb = {k2: state.batch_stats["visual_encoder"][k2]
          for k2 in ("bn1", "bn2", "bn3")}
    def stem_fn():
        out = stem.apply({"params": sp, "batch_stats": sb}, frames)
        return (jnp.sum(out.astype(jnp.float32)),)
    timed("visual conv stem only", stem_fn, k=k)

    # audio encoder
    from av_separation_tpu.models.model import AudioEncoder
    aenc = AudioEncoder(cfg.model)
    def aud():
        out = aenc.apply({"params": params["audio_encoder"]}, mixed,
                         deterministic=True)
        return (jnp.sum(out.astype(jnp.float32)),)
    timed("audio encoder", aud, k=k)

    # fusion stack (audio-Q over T-resampled visual stream)
    from av_separation_tpu.models.model import CrossModalFusion
    fus = CrossModalFusion(cfg.model)
    t = d.num_stft_frames
    a_emb = jnp.asarray(rng.normal(size=(b, t, cfg.model.d_model))
                        .astype(np.float32))
    v_emb = jnp.asarray(rng.normal(size=(b, t, cfg.model.d_model))
                        .astype(np.float32))
    def fuse():
        out = fus.apply({"params": params["fusion"]}, a_emb, v_emb,
                        deterministic=True)
        return (jnp.sum(out.astype(jnp.float32)),)
    timed("fusion stack", fuse, k=k)

    # decoder (mask MLP + sigmoid + apply)
    from av_separation_tpu.models.model import SeparationDecoder
    dec = SeparationDecoder(cfg.model)
    fused_in = jnp.asarray(rng.normal(size=(b, t, cfg.model.d_model))
                           .astype(np.float32))
    def decode():
        sep, masks = dec.apply({"params": params["decoder"]}, fused_in,
                               deterministic=True, mixed_spec=mixed)
        return (jnp.sum(sep.astype(jnp.float32)),)
    timed("decoder (MLP+sigmoid+apply)", decode, k=k)

    # loss (PIT over S!) on fixed tensors
    from av_separation_tpu.losses import separation_loss
    sep_fix = jnp.asarray(rng.normal(
        size=(b, d.num_speakers, d.freq_bins, t)).astype(np.float32))
    def loss_fn():
        return (separation_loss(sep_fix, clean),)
    timed("PIT loss (fwd only)", loss_fn, k=k)

    if args.json_out:
        with open(args.json_out, "a") as f:
            for r in RESULTS:
                r.update(config=args.config, batch=b, dtype=args.dtype,
                         impl=args.impl or "xla")
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
