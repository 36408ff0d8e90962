"""One-off experiment: attribute the train-step fwd/bwd gap on the chip.

Times the full fwd+bwd+adam step for a config under several knob settings
(dropout on/off, attention impl, remat) to locate where the backward pass
loses its time.  Methodology identical to tools/profile_breakdown.py
(k-fold scan, state threaded, value-transfer sync).
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from av_separation_tpu import get_config
from av_separation_tpu.train import create_train_state, _train_step_body
from av_separation_tpu.utils.cache import enable_compilation_cache


def time_step(cfg, batch, k=10, reps=3):
    model, state = create_train_state(cfg)
    raw_step = _train_step_body(model, cfg)

    def scanned(state, batch):
        def body(s, _):
            s2, metrics = raw_step(s, batch)
            return s2, metrics["loss"]
        final, losses = jax.lax.scan(body, state, None, length=k)
        return losses[-1]

    jfn = jax.jit(scanned)
    float(np.asarray(jfn(state, batch)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(jfn(state, batch)))
        best = min(best, (time.perf_counter() - t0) / k)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="scaled")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    enable_compilation_cache()

    base = get_config(args.config)
    base = dataclasses.replace(
        base, train=dataclasses.replace(base.train, batch_size=args.batch))
    d = base.data
    b = args.batch
    rng = np.random.default_rng(0)
    batch = {
        "mixed_spec": jnp.asarray(
            rng.normal(size=(b, d.freq_bins, d.num_stft_frames))
            .astype(np.float32)),
        "lip_frames": jnp.asarray(
            rng.normal(size=(b, d.total_lip_frames, d.frame_h, d.frame_w))
            .astype(np.float32)),
        "clean_specs": jnp.asarray(
            rng.normal(size=(b, d.num_speakers, d.freq_bins,
                             d.num_stft_frames)).astype(np.float32)),
    }

    variants = [
        # NOTE: the base config's impl selectors default to 'auto'.
        ("auto dropout=0.1", dict(compute_dtype="bfloat16")),
        ("auto dropout=0.0", dict(compute_dtype="bfloat16", dropout=0.0)),
        ("xla-attn dropout=0.1",
         dict(compute_dtype="bfloat16", attn_impl="xla")),
        ("pallas-attn dropout=0.1",
         dict(compute_dtype="bfloat16", attn_impl="pallas")),
        ("pallas-attn dropout=0.0",
         dict(compute_dtype="bfloat16", attn_impl="pallas", dropout=0.0)),
        ("all-pallas dropout=0.0",
         dict(compute_dtype="bfloat16", attn_impl="pallas",
              decoder_impl="pallas", proj_impl="pallas", dropout=0.0)),
    ]
    for name, kw in variants:
        cfg = dataclasses.replace(base, model=base.model.replace(**kw))
        ms = time_step(cfg, batch, k=args.k) * 1e3
        print(f"{name:36s} {ms:8.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
