"""Benchmark harness: prints ONE JSON line with the headline metric.

Metric: audio-seconds of mixture processed per second per chip by the jitted
fwd+bwd+update training step (demo config: d_model=128, B=8, 1 s utterances
@ 8 kHz -> T=63, F=257), on the default JAX backend (the real TPU chip under
the driver; CPU when forced).

vs_baseline compares against the reference PyTorch implementation's training
throughput measured on this host's CPU (the only hardware the pure-Python
reference supports here): 36.08 audio-seconds/s (torch 2.13.0+cpu, demo
config, batch=8, steady-state over 20 steps; see BASELINE.md — the reference
publishes no throughput numbers of its own).

Usage: python bench.py [--config demo] [--steps 50] [--batch 8] [--impl xla]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

# Reference torch CPU training throughput on this host (audio-seconds/s);
# measured 2026-08-17, see module docstring.
REFERENCE_AUDIO_S_PER_S = 36.08


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="demo")
    # Default sized so the fused path dispatches 50-step segments: this
    # rig's tunneled backend costs ~28 ms per dispatch+sync round trip
    # (a relay artifact; real TPU hosts pay ~0.1 ms), which at demo-config
    # step times is ~30% of a 10-step segment.  50-step segments amortize
    # it to <3%, matching what a production run (log_every-sized segments
    # or larger) actually sees.
    ap.add_argument("--steps", type=int, default=250)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--impl", default=None,
                    help="kernel impl override: xla | pallas")
    ap.add_argument("--dtype", default="bfloat16",
                    help="compute dtype: float32 | bfloat16 (default bf16 — "
                         "verified to reach the same +38 dB demo quality)")
    ap.add_argument("--mode", choices=("fused", "per_step"), default="fused",
                    help="fused: on-device data gen + K steps per dispatch "
                         "(device-true throughput); per_step: one dispatch "
                         "per step with a host-fed batch")
    ap.add_argument("--mesh-data", type=int, default=1,
                    help="data-parallel mesh axis size (scaling harness)")
    ap.add_argument("--mesh-fsdp", type=int, default=1)
    ap.add_argument("--mesh-seq", type=int, default=1)
    ap.add_argument("--mesh-model", type=int, default=1)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (env JAX_PLATFORMS alone "
                         "is not reliable under the axon site hook)")
    args = ap.parse_args()

    if args.cpu:
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from av_separation_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from av_separation_tpu import get_config
    from av_separation_tpu.train import create_train_state, make_train_step

    cfg = get_config(args.config)
    model_kw = {}
    if args.impl:
        model_kw.update(attn_impl=args.impl, decoder_impl=args.impl,
                        proj_impl=args.impl)
    if args.dtype:
        model_kw.update(compute_dtype=args.dtype)
    if model_kw:
        cfg = dataclasses.replace(cfg, model=cfg.model.replace(**model_kw))
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_size=args.batch))

    mesh = None
    n_mesh = (args.mesh_data * args.mesh_fsdp * args.mesh_seq
              * args.mesh_model)
    if n_mesh > 1:
        import dataclasses as _dc

        from av_separation_tpu.config import MeshConfig
        from av_separation_tpu.parallel.mesh import make_mesh
        cfg = _dc.replace(cfg, mesh=MeshConfig(data=args.mesh_data,
                                               fsdp=args.mesh_fsdp,
                                               seq=args.mesh_seq,
                                               model=args.mesh_model))
        mesh = make_mesh(cfg.mesh)

    d = cfg.data
    b = args.batch
    model, state = create_train_state(cfg, mesh)
    compiled_cost = {}

    if args.mode == "fused":
        # Whole pipeline on device: synthetic data gen + STFT + fwd + bwd +
        # update, K steps per dispatch (lax.scan) — measures device-true
        # throughput without host dispatch latency in the loop.
        #
        # Sync via np.asarray(loss), NOT block_until_ready: the final loss
        # value transitively depends on every step (donated state chain), so
        # fetching it is a true end-to-end barrier.  (On this rig's tunneled
        # TPU backend block_until_ready was observed to return early,
        # inflating throughput ~60x.)
        from av_separation_tpu.train import make_fused_train_steps
        from av_separation_tpu.utils.roofline import xla_cost_analysis
        k = max(10, args.steps // 5)
        fused = make_fused_train_steps(model, cfg, k, mesh)
        # Read XLA's own cost analysis for the roofline report.  The AOT
        # objects are used ONLY for cost_analysis — executing them hangs
        # on the axon-tunneled backend, so the timed loop runs the
        # ordinary jit call (the compile is shared via the cache).
        #
        # COST-ANALYSIS SEMANTICS CALIBRATION (r5 finding): on this
        # backend the analysis prices the scan BODY ONCE regardless of
        # trip count (k=10 and k=20 programs return byte-identical
        # analyses), so r4's "per-call / k" numbers understated per-step
        # transcendentals by k (2.72M reported vs 135.8M true at demo).
        # Calibrate against the ANALYTIC per-step matmul FLOPs: the
        # divisor is round(ca_flops / analytic_step_flops), clamped >= 1
        # — robust whether a backend prices the body once (ratio ~1) or
        # x k (ratio ~k).  Separately, 'bytes accessed' is NOT HBM
        # traffic (9.96 GB/step at demo would need 12 ms at 819 GB/s vs
        # the 7.5 ms measured step — it counts fusion operand bytes per
        # use); it is recorded as a diagnostic and the roofline's
        # bandwidth floor uses the analytic activation/param model
        # instead.
        try:
            from av_separation_tpu.utils.roofline import train_step_flops
            ca = xla_cost_analysis(fused.lower(state).compile())
            if ca.get("flops"):
                step_flops = train_step_flops(cfg, b, include_data_gen=True)
                div = max(1, round(ca["flops"] / step_flops))
                compiled_cost = {
                    "cost_analysis_body_divisor": div,
                    "xla_bytes_accessed_per_step":
                        ca.get("bytes accessed", 0) / div,
                }
                if ca.get("transcendentals") is not None:
                    compiled_cost["transcendentals_per_step"] = (
                        ca["transcendentals"] / div)
        except Exception:
            pass
        state, loss = fused(state)  # compile + warm
        float(np.asarray(loss))
        n_calls = max(1, args.steps // k)
        t0 = time.perf_counter()
        for _ in range(n_calls):
            state, loss = fused(state)
        assert np.isfinite(float(np.asarray(loss)))
        dt = time.perf_counter() - t0
        total_steps = n_calls * k
    else:
        rng = np.random.default_rng(0)
        batch = {
            "mixed_spec": jnp.asarray(rng.normal(
                size=(b, d.freq_bins, d.num_stft_frames))
                .astype(np.float32)),
            "lip_frames": jnp.asarray(rng.normal(
                size=(b, d.total_lip_frames, d.frame_h, d.frame_w))
                .astype(np.float32)),
            "clean_specs": jnp.asarray(rng.normal(
                size=(b, d.num_speakers, d.freq_bins, d.num_stft_frames))
                .astype(np.float32)),
        }
        step_fn = make_train_step(model, cfg, mesh)
        from av_separation_tpu.utils.roofline import xla_cost_analysis
        try:
            ca = xla_cost_analysis(step_fn.lower(state, batch).compile())
            if ca.get("bytes accessed"):
                compiled_cost = {
                    "xla_bytes_accessed_per_step": ca["bytes accessed"],
                    "transcendentals_per_step": ca.get("transcendentals"),
                }
        except Exception:
            pass
        for _ in range(3):
            state, metrics = step_fn(state, batch)
        float(np.asarray(metrics["loss"]))
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, metrics = step_fn(state, batch)
        assert np.isfinite(float(np.asarray(metrics["loss"])))
        dt = time.perf_counter() - t0
        total_steps = args.steps

    audio_seconds = total_steps * b * d.duration
    value = audio_seconds / dt
    # Per-chip normalization: the devices actually participating (the mesh),
    # not jax.device_count() — a 1x1x1 run on an 8-virtual-device CPU host
    # is still a single-"chip" measurement.
    n_chips = cfg.mesh.num_devices
    result = {
        "metric": (f"audio-seconds/s/chip (fwd+bwd train step, "
                   f"{args.config} config, batch={b}, "
                   f"{cfg.model.compute_dtype})"),
        "value": round(value / n_chips, 2),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(value / n_chips / REFERENCE_AUDIO_S_PER_S, 2),
    }
    if n_mesh > 1:
        result["mesh"] = (f"data={args.mesh_data} fsdp={args.mesh_fsdp} "
                          f"seq={args.mesh_seq} model={args.mesh_model}")
    if jax.default_backend() == "tpu":
        from av_separation_tpu.utils.roofline import (
            roofline, train_step_bytes, train_step_flops)
        flops = train_step_flops(cfg, b, include_data_gen=(
            args.mode == "fused")) * total_steps
        # HBM floor from the analytic activation/param model: XLA's
        # 'bytes accessed' counts fusion operand bytes per USE, not HBM
        # traffic (see the calibration comment above), so it cannot set
        # a roofline floor — it is reported as a diagnostic instead.
        bytes_total = train_step_bytes(
            cfg, b, attn_impl=cfg.model.attn_impl) * total_steps
        bytes_src = "analytic_model"
        # VPU-side exp/sin work (softmax, on-device sine data gen) that
        # matmul-FLOP accounting misses — a third roofline term, so a
        # softmax/sine-heavy step can be labeled VPU-bound rather than
        # pretending the MXU/HBM floor is the whole story.
        trans_per_step = compiled_cost.get("transcendentals_per_step")
        rl = roofline(flops, bytes_total, dt, cfg.model.compute_dtype,
                      jax.devices()[0].device_kind,
                      transcendentals=(trans_per_step * total_steps
                                       if trans_per_step else None))
        if rl:
            rl["bytes_source"] = bytes_src
            if trans_per_step is not None:
                rl["transcendentals_per_step"] = round(trans_per_step)
            if compiled_cost.get("xla_bytes_accessed_per_step"):
                rl["xla_bytes_accessed_per_step"] = round(
                    compiled_cost["xla_bytes_accessed_per_step"])
            result.update(rl)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
