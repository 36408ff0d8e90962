"""A/B benchmark: visual conv stem implementations on the real chip.

Times the ISOLATED stem (conv+BN+ReLU x3 + pool + frame projection, train
BN) fwd and fwd+bwd for each impl at a config's frame shapes, with the
barrier-scan + scalar-fetch methodology (tools/profile_breakdown.py) that
is the only valid timing on the relay-attached backend.

The stem is 37% of the demo train step and 36% of lrs2
(bench_results/profile_{demo,lrs2}_auto.jsonl); this tool produces the
evidence rows that set `resolve_stem`'s 'auto' choice (ops/policy.py).

Usage: python tools/bench_stem.py [--config demo] [--batch 128]
       [--impls xla,s2d] [--json-out bench_results/stem_ab.jsonl]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from av_separation_tpu import get_config
from av_separation_tpu.utils.cache import enable_compilation_cache


class Stem(nn.Module):
    """Stem section with an impl switch, same parameter tree as the model
    (models/model.py VisualEncoder)."""

    cfg: object
    impl: str = "xla"
    train_bn: bool = True

    @nn.compact
    def __call__(self, fr):
        from av_separation_tpu.models.layers import TorchBatchNorm, dense
        from av_separation_tpu.models.model import (
            _cdt, _conv, _Conv2dParams)
        bsz, n, hh, ww = fr.shape
        x = fr.reshape(bsz * n, hh, ww, 1)
        dt = _cdt(self.cfg)
        if self.impl == "s2d":
            from av_separation_tpu.ops.s2d_stem import conv3x3s2_s2d
            for i, (ci, co) in enumerate(((1, 32), (32, 64), (64, 128))):
                w, cb = _Conv2dParams(ci, co, name=f"conv{i + 1}")()
                if dt is not None:
                    x, w, cb = x.astype(dt), w.astype(dt), cb.astype(dt)
                x = conv3x3s2_s2d(x, w) + cb
                x = TorchBatchNorm(co, name=f"bn{i + 1}")(
                    x, use_running_average=not self.train_bn)
                x = nn.relu(x)
        else:
            for i, ch in enumerate((32, 64, 128)):
                x = _conv(ch, (3, 3), (2, 2), [(1, 1), (1, 1)],
                          f"conv{i + 1}", dt)(x)
                x = TorchBatchNorm(ch, name=f"bn{i + 1}")(
                    x, use_running_average=not self.train_bn)
                x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        return dense(self.cfg.d_model, 128, "frame_proj", dt)(x)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="demo")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--impls", default="xla,s2d")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    enable_compilation_cache()
    from tools.profile_breakdown import RESULTS, timed, timed_grad

    cfg = get_config(args.config)
    mcfg = cfg.model.replace(compute_dtype=args.dtype)
    d = cfg.data
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.normal(size=(
        args.batch, d.total_lip_frames, d.frame_h, d.frame_w))
        .astype(np.float32))

    rows = []
    for impl in args.impls.split(","):
        stem = Stem(mcfg.replace(stem_impl=impl), impl=impl, train_bn=True)
        svars = jax.jit(stem.init)(jax.random.PRNGKey(0), frames)

        def fwd(svars, frames, stem=stem):
            out, _ = stem.apply(svars, frames, mutable=["batch_stats"])
            return (jnp.sum(out.astype(jnp.float32)),)

        t_f = timed(f"stem[{impl}] fwd (train BN)", fwd, svars, frames,
                    k=args.k)
        t_fb = timed_grad(f"stem[{impl}] fwd+bwd (train BN)", fwd, svars,
                          frames, k=args.k)
        rows.append({"config": args.config, "impl": impl,
                     "batch": args.batch, "dtype": args.dtype,
                     "frame_hw": [d.frame_h, d.frame_w],
                     "frames_per_step": args.batch * d.total_lip_frames,
                     "fwd_ms": round(t_f * 1e3, 3),
                     "fwd_bwd_ms": round(t_fb * 1e3, 3)})

    for r in rows:
        print(json.dumps(r), flush=True)
    if args.json_out:
        os.makedirs(os.path.dirname(args.json_out), exist_ok=True)
        with open(args.json_out, "a") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
