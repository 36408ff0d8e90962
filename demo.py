"""Proof-of-life demo: train 100 steps on the synthetic 2-speaker task and
show a large SNR improvement — the same experiment as the reference's demo
driver (reference demo.py:116-198; README claims +37.23 dB, BASELINE.md
verifies +37.03 dB on CPU torch).

Usage:
    python demo.py            # run on the default JAX backend (TPU if present)
    python demo.py --cpu      # force CPU
    python demo.py --steps N  # override step count
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--pit", choices=("global", "per_sample"),
                    default="global")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from av_separation_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    import dataclasses
    from av_separation_tpu import get_config
    from av_separation_tpu.data.loader import batch_iterator, eval_batch
    from av_separation_tpu.data.synthetic import SyntheticAVDataset
    from av_separation_tpu.train import (
        create_train_state, make_eval_step, make_train_step)

    print("=" * 64)
    print("Audio-Visual Speech Separation — TPU-native framework demo")
    print("=" * 64)
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")

    cfg = get_config("demo")
    cfg = dataclasses.replace(
        cfg,
        train=cfg.train.replace(steps=args.steps)
        if hasattr(cfg.train, "replace")
        else dataclasses.replace(cfg.train, steps=args.steps),
        loss=dataclasses.replace(cfg.loss, pit_mode=args.pit))

    t0 = time.time()
    ds = SyntheticAVDataset(cfg.data)
    sample = ds[0]
    print(f"\ndataset: {len(ds)} samples "
          f"(generated in {time.time() - t0:.1f}s)")
    for k, v in sample.items():
        print(f"  {k:12s} {v.shape}")

    model, state = create_train_state(cfg)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    print(f"\nmodel: d_model={cfg.model.d_model} params={n_params:,}")

    eval_fn = make_eval_step(model)
    ebatch = {k: jnp.asarray(v) for k, v in eval_batch(ds, 20).items()}

    m = eval_fn(state.params, state.batch_stats, ebatch)
    in_snr = float(m["input_snr"])
    pre_snr = float(m["output_snr"])
    print(f"\nInput SNR (mixed):        {in_snr:6.2f} dB")
    print(f"Output SNR (untrained):   {pre_snr:6.2f} dB")

    print(f"\ntraining {cfg.train.steps} steps "
          f"(Adam lr={cfg.train.learning_rate}, batch={cfg.train.batch_size}, "
          f"clip={cfg.train.grad_clip_norm}, pit={cfg.loss.pit_mode}) ...")
    step_fn = make_train_step(model, cfg)
    batches = batch_iterator(ds, cfg.train.batch_size,
                             seed=cfg.train.seed)
    t0 = time.time()
    for i in range(cfg.train.steps):
        batch = {k: jnp.asarray(v) for k, v in next(batches).items()}
        state, metrics = step_fn(state, batch)
        if (i + 1) % cfg.train.log_every == 0:
            print(f"  step {i + 1:4d}  loss {float(metrics['loss']):+8.3f}")
    dt = time.time() - t0
    audio_s = cfg.train.steps * cfg.train.batch_size * cfg.data.duration
    print(f"  {dt:.1f}s  ({audio_s / dt:.1f} audio-seconds/s)")

    m = eval_fn(state.params, state.batch_stats, ebatch)
    post_snr = float(m["output_snr"])
    print(f"\nOutput SNR (trained):     {post_snr:6.2f} dB")
    print(f"SNR improvement:          {post_snr - in_snr:+6.2f} dB")
    print(f"mask range: [{float(m['mask_min']):.3f}, "
          f"{float(m['mask_max']):.3f}]")

    ok = (0.0 <= float(m["mask_min"]) and float(m["mask_max"]) <= 1.0
          and post_snr - in_snr > 35.0)
    print("\nPASS" if ok else "\nFAIL (expected > +35 dB improvement)")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
