"""Command-line driver: train / evaluate / benchmark.

The reference has no CLI at all — its only entry point is `python demo.py`
(SURVEY.md §3.1).  This driver exposes the five named BASELINE configs plus
every TPU-native knob (mesh shape, kernel impls, compute dtype, data
pipeline, checkpointing).

    avsep train --config demo --steps 100
    avsep train --config multihost --mesh-data 2 --mesh-model 4
    avsep eval  --config demo --checkpoint-dir ckpts
    avsep bench --config scaled --impl pallas --dtype bfloat16
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--config", default="demo",
                   help="named config: demo|scaled|three_speaker|lrs2|multihost")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--mesh-data", type=int, default=None)
    p.add_argument("--mesh-fsdp", type=int, default=None,
                   help="ZeRO axis: shard params + Adam state over this "
                        "many devices")
    p.add_argument("--mesh-seq", type=int, default=None,
                   help="sequence-parallel axis: shard the audio time axis "
                        "T over this many devices (long utterances)")
    p.add_argument("--mesh-model", type=int, default=None)
    p.add_argument("--impl", choices=("auto", "xla", "pallas"), default=None,
                   help="kernel implementation for attention/projection/"
                        "decoder; 'auto' picks by measured shape crossover "
                        "(ops/policy.py)")
    p.add_argument("--mode", choices=("fused", "per_step"), default=None,
                   help="bench only: fused scan-train vs per-step dispatch")
    p.add_argument("--dtype", choices=("float32", "bfloat16"), default=None)
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--pit", choices=("global", "per_sample"), default=None)
    p.add_argument("--data", choices=("host", "device", "native", "files"),
                   default=None,
                   help="batch pipeline: host NumPy generator, on-device "
                        "JAX generator, the native C++ engine, or a "
                        "file-backed corpus (--data-root)")
    p.add_argument("--data-root", default=None,
                   help="corpus directory for --data files")
    p.add_argument("--dynamic-mix", action="store_true",
                   help="on-the-fly speaker remixing for --data files")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--checkpoint-every", type=int, default=None)
    p.add_argument("--profile-dir", default=None,
                   help="write a jax.profiler trace of the training loop")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--coordinator", default=None,
                   help="multi-host: coordinator address host:port "
                        "(or set JAX_COORDINATOR_ADDRESS); on TPU pods "
                        "jax.distributed auto-detects and this is not "
                        "needed")
    p.add_argument("--num-processes", type=int, default=None,
                   help="multi-host: total process count")
    p.add_argument("--process-id", type=int, default=None,
                   help="multi-host: this process's id")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans: any NaN produced inside a "
                        "jitted step re-runs it op-by-op and raises "
                        "FloatingPointError at the producing op")
    p.add_argument("--fused", action="store_true",
                   help="scan-fused training: on-device data generation + K "
                        "steps per XLA dispatch (the bench-class fast path), "
                        "with host sync between segments for logging, eval "
                        "and checkpointing")
    p.add_argument("--eval-every", type=int, default=None,
                   help="run the SNR eval every N steps (between fused "
                        "segments when --fused)")


def _build_config(args):
    from av_separation_tpu.config import NAMED_CONFIGS, get_config

    if args.config not in NAMED_CONFIGS:
        sys.exit(f"avsep: unknown config '{args.config}'. "
                 f"Available: {', '.join(sorted(NAMED_CONFIGS))}")
    cfg = get_config(args.config)
    model_kw = {}
    if args.impl:
        model_kw.update(attn_impl=args.impl, decoder_impl=args.impl,
                        proj_impl=args.impl)
    if args.dtype:
        model_kw.update(compute_dtype=args.dtype)
    if model_kw:
        cfg = dataclasses.replace(cfg, model=cfg.model.replace(**model_kw))

    train_kw = {}
    for field, attr in (("batch_size", "batch"), ("steps", "steps"),
                        ("checkpoint_dir", "checkpoint_dir"),
                        ("checkpoint_every", "checkpoint_every"),
                        ("data_pipeline", "data"), ("data_root", "data_root"),
                        ("seed", "seed")):
        v = getattr(args, attr)
        if v is not None:
            train_kw[field] = v
    if args.dynamic_mix:
        train_kw["dynamic_mix"] = True
    if train_kw:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, **train_kw))

    if args.pit:
        cfg = dataclasses.replace(
            cfg, loss=dataclasses.replace(cfg.loss, pit_mode=args.pit))

    if (args.mesh_data or args.mesh_fsdp or args.mesh_seq
            or args.mesh_model):
        from av_separation_tpu.config import MeshConfig
        cfg = dataclasses.replace(
            cfg, mesh=MeshConfig(data=args.mesh_data or 1,
                                 fsdp=args.mesh_fsdp or 1,
                                 seq=args.mesh_seq or 1,
                                 model=args.mesh_model or 1))
    return cfg


def _force_cpu_if(args) -> None:
    if args.cpu:
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    if getattr(args, "debug_nans", False):
        import jax
        jax.config.update("jax_debug_nans", True)


def _init_multihost(args) -> None:
    """Join a multi-host job when coordinator flags/env are present.  Must
    run BEFORE any jax device access.  No-op for single-process runs."""
    import os
    if (args.coordinator or args.num_processes is not None
            or os.environ.get("JAX_COORDINATOR_ADDRESS")):
        from av_separation_tpu.parallel.distributed import initialize
        initialize(coordinator_address=args.coordinator,
                   num_processes=args.num_processes,
                   process_id=args.process_id)


def _mesh_or_none(cfg, args=None):
    """Build the device mesh: the flag/config mesh on a single host; on a
    multi-process job, a global mesh over every host's devices (defaulting
    to pure DP over all devices when no mesh was configured)."""
    import jax

    from av_separation_tpu.parallel.mesh import make_mesh
    if jax.process_count() > 1:
        import dataclasses

        from av_separation_tpu.config import MeshConfig
        from av_separation_tpu.parallel.distributed import global_mesh
        mesh_cfg = cfg.mesh
        if mesh_cfg.num_devices != jax.device_count():
            if mesh_cfg.num_devices == 1:  # unconfigured: DP over the job
                mesh_cfg = MeshConfig(data=jax.device_count())
            else:
                sys.exit(f"avsep: mesh {mesh_cfg} needs "
                         f"{mesh_cfg.num_devices} devices but the job has "
                         f"{jax.device_count()}")
        return global_mesh(mesh_cfg), mesh_cfg
    if cfg.mesh.num_devices > 1:
        return make_mesh(cfg.mesh), cfg.mesh
    return None, cfg.mesh


def _batches(cfg, start_step: int = 0):
    """Batch stream for the per-step train loop.  `start_step` makes a
    checkpoint-resumed run replay the same stream an uninterrupted run
    would see from that step (deterministic resume — each pipeline
    fast-forwards statelessly, no batches are generated to skip)."""
    if cfg.train.data_pipeline == "device":
        from av_separation_tpu.data.device_synthetic import (
            device_batch_iterator)
        return device_batch_iterator(cfg.data, cfg.train.batch_size,
                                     seed=cfg.train.seed,
                                     start_step=start_step)
    if cfg.train.data_pipeline == "files":
        from av_separation_tpu.data.files import (
            FileAVDataset, PrefetchIterator)
        if not cfg.train.data_root:
            sys.exit("avsep: --data files requires --data-root")
        ds = FileAVDataset(cfg.train.data_root, cfg.data,
                           dynamic_mix=cfg.train.dynamic_mix,
                           seed=cfg.train.seed)
        return PrefetchIterator(ds, cfg.train.batch_size,
                                seed=cfg.train.seed, start_step=start_step)
    if cfg.train.data_pipeline == "native":
        from av_separation_tpu.data.native_loader import NativeBatchIterator
        return NativeBatchIterator(cfg.data, cfg.train.batch_size,
                                   seed=cfg.train.seed,
                                   start_step=start_step)
    from av_separation_tpu.data.loader import batch_iterator
    from av_separation_tpu.data.synthetic import SyntheticAVDataset
    ds = SyntheticAVDataset(cfg.data)
    return batch_iterator(ds, cfg.train.batch_size, seed=cfg.train.seed,
                          start_step=start_step)


def _eval_runner(cfg, model, mesh=None):
    """Lazily-built SNR eval over 20 deterministic host samples; returns a
    closure (state) -> metrics dict."""
    import jax.numpy as jnp

    from av_separation_tpu.data.loader import eval_batch
    from av_separation_tpu.data.synthetic import SyntheticAVDataset
    from av_separation_tpu.train import make_eval_step

    ds = SyntheticAVDataset(cfg.data)
    batch = {k: jnp.asarray(v) for k, v in eval_batch(ds, 20).items()}
    eval_fn = make_eval_step(model, mesh)

    def run(state):
        m = eval_fn(state.params, state.batch_stats, batch)
        out = {k: round(float(v), 4) for k, v in m.items()}
        out["snr_improvement_db"] = round(
            float(m["output_snr"]) - float(m["input_snr"]), 4)
        return out

    return run


def cmd_train(args) -> int:
    _force_cpu_if(args)
    _init_multihost(args)
    import contextlib

    import jax
    import jax.numpy as jnp

    from av_separation_tpu.train import create_train_state, make_train_step
    from av_separation_tpu.utils.profiling import (
        Timer, step_metrics_line, trace)

    cfg = _build_config(args)
    mesh, mesh_cfg = _mesh_or_none(cfg, args)
    nproc = jax.process_count()
    pid = jax.process_index()
    is_main = pid == 0

    def say(*a, **kw):
        if is_main:
            print(*a, **kw)

    say(f"config={cfg.name} backend={jax.default_backend()} "
        f"devices={jax.device_count()} processes={nproc} "
        f"mesh={'%dx%dx%dx%d' % (mesh_cfg.data, mesh_cfg.fsdp, mesh_cfg.seq, mesh_cfg.model) if mesh else '1'}",
        file=sys.stderr)

    model, state = create_train_state(cfg, mesh)
    start_step = 0
    if cfg.train.checkpoint_dir:
        from av_separation_tpu.utils.checkpoint import restore_checkpoint
        state = restore_checkpoint(cfg.train.checkpoint_dir, state)
        start_step = int(state.step)
        if start_step:
            say(f"resumed from step {start_step}", file=sys.stderr)

    evaluate = _eval_runner(cfg, model, mesh) if args.eval_every else None
    ctx = trace(args.profile_dir) if args.profile_dir and is_main \
        else contextlib.nullcontext()

    with ctx, (mesh or contextlib.nullcontext()):
        if args.fused:
            state, metrics = _fused_train(args, cfg, mesh, model, state,
                                          start_step, evaluate, say)
        else:
            step_fn = make_train_step(model, cfg, mesh)
            batches = _batches(cfg, start_step)
            if nproc > 1:
                from av_separation_tpu.parallel.distributed import (
                    host_local_batch_to_global)
                if cfg.train.batch_size % nproc:
                    sys.exit(f"avsep: batch_size {cfg.train.batch_size} "
                             f"not divisible by {nproc} processes")
                local_b = cfg.train.batch_size // nproc

                def to_device(batch):
                    # Every process iterates the same deterministic global
                    # stream and keeps only its rows; make_array_from_
                    # process_local_data stitches them without any
                    # cross-host transfer.
                    local = {k: v[pid * local_b:(pid + 1) * local_b]
                             for k, v in batch.items()}
                    return host_local_batch_to_global(local, mesh)
            else:
                def to_device(batch):
                    return {k: jnp.asarray(v) for k, v in batch.items()}
            timer = Timer()
            for i in range(start_step, cfg.train.steps):
                batch = to_device(next(batches))
                state, metrics = step_fn(state, batch)
                if cfg.train.log_every and (i + 1) % cfg.train.log_every == 0:
                    dt = timer.elapsed(metrics["loss"])
                    audio_s = ((i + 1 - start_step) * cfg.train.batch_size
                               * cfg.data.duration)
                    say(step_metrics_line(
                        i + 1, metrics,
                        {"audio_s_per_s": round(audio_s / dt, 2)}))
                if evaluate and (i + 1) % args.eval_every == 0:
                    say(step_metrics_line(i + 1, evaluate(state)))
                if (cfg.train.checkpoint_dir and cfg.train.checkpoint_every
                        and (i + 1) % cfg.train.checkpoint_every == 0):
                    from av_separation_tpu.utils.checkpoint import (
                        save_checkpoint)
                    save_checkpoint(cfg.train.checkpoint_dir, i + 1, state)

            if cfg.train.steps > start_step:
                # Always end with a summary line, even when
                # steps < log_every.
                dt = timer.elapsed(metrics["loss"])
                audio_s = ((cfg.train.steps - start_step)
                           * cfg.train.batch_size * cfg.data.duration)
                # Printed by every process in multi-host tests so each
                # worker's loss can be compared; is_main gates the rest.
                print(json.dumps({
                    "final_step": cfg.train.steps,
                    "loss": round(float(metrics["loss"]), 4),
                    "audio_s_per_s": round(audio_s / max(dt, 1e-9), 2),
                }))

    if cfg.train.checkpoint_dir:
        from av_separation_tpu.utils.checkpoint import save_checkpoint
        save_checkpoint(cfg.train.checkpoint_dir, int(state.step), state,
                        wait=True)
        print(f"saved checkpoint at step {int(state.step)}", file=sys.stderr)
    if nproc > 1:
        # Sync all processes before teardown, then shut the coordination
        # service down explicitly: without this, the first process to exit
        # kills the coordinator while peers are still draining and they
        # stall in connection-retry loops (observed on the 2-process CPU
        # job; same pattern as tests/distributed_worker.py:85).
        from av_separation_tpu.parallel.distributed import barrier
        try:
            barrier(timeout_s=120.0)
        finally:
            jax.distributed.shutdown()
    return 0


def _fused_train(args, cfg, mesh, model, state, start_step, evaluate,
                 say=print):
    """Scan-fused training: K steps per XLA dispatch with on-device data
    generation (train.py make_fused_train_steps — the path that makes
    bench.py's throughput), syncing with the host only at segment
    boundaries for logging/eval/async checkpointing."""
    import math

    from av_separation_tpu.train import make_fused_train_steps
    from av_separation_tpu.utils.profiling import Timer, step_metrics_line

    # Segment length: the largest stride that still hits every log/eval/
    # checkpoint boundary exactly.
    seg = cfg.train.log_every or 20
    for every in (cfg.train.checkpoint_every, args.eval_every):
        if every:
            seg = math.gcd(seg, every)

    fused_cache = {}

    def fused_for(k):
        if k not in fused_cache:
            fused_cache[k] = make_fused_train_steps(model, cfg, k, mesh)
        return fused_cache[k]

    step = start_step
    timer = Timer()
    metrics = {"loss": float("nan")}
    while step < cfg.train.steps:
        k = min(seg, cfg.train.steps - step)
        state, loss = fused_for(k)(state)
        step += k
        metrics = {"loss": loss}
        if cfg.train.log_every and step % cfg.train.log_every == 0:
            dt = timer.elapsed(loss)  # host sync point
            audio_s = (step - start_step) * cfg.train.batch_size \
                * cfg.data.duration
            say(step_metrics_line(
                step, metrics, {"audio_s_per_s": round(audio_s / dt, 2),
                                "fused_segment": k}))
        if evaluate and args.eval_every and step % args.eval_every == 0:
            say(step_metrics_line(step, evaluate(state)))
        if (cfg.train.checkpoint_dir and cfg.train.checkpoint_every
                and step % cfg.train.checkpoint_every == 0):
            from av_separation_tpu.utils.checkpoint import save_checkpoint
            save_checkpoint(cfg.train.checkpoint_dir, step, state)

    if step > start_step:
        dt = timer.elapsed(metrics["loss"])
        audio_s = (step - start_step) * cfg.train.batch_size \
            * cfg.data.duration
        print(json.dumps({
            "final_step": step,
            "loss": round(float(metrics["loss"]), 4),
            "audio_s_per_s": round(audio_s / max(dt, 1e-9), 2),
        }))
    return state, metrics


def cmd_eval(args) -> int:
    _force_cpu_if(args)
    import jax.numpy as jnp

    from av_separation_tpu.data.loader import eval_batch
    from av_separation_tpu.data.synthetic import SyntheticAVDataset
    from av_separation_tpu.train import create_train_state, make_eval_step

    cfg = _build_config(args)
    model, state = create_train_state(cfg)
    if cfg.train.checkpoint_dir:
        from av_separation_tpu.utils.checkpoint import restore_checkpoint
        state = restore_checkpoint(cfg.train.checkpoint_dir, state)

    ds = SyntheticAVDataset(cfg.data)
    batch = {k: jnp.asarray(v) for k, v in eval_batch(ds, 20).items()}
    eval_fn = make_eval_step(model)
    m = eval_fn(state.params, state.batch_stats, batch)
    out = {k: round(float(v), 4) for k, v in m.items()}
    out["snr_improvement_db"] = round(
        float(m["output_snr"]) - float(m["input_snr"]), 4)
    print(json.dumps(out))
    return 0


def cmd_separate(args) -> int:
    """Serving-path smoke: waveform in -> per-speaker waveforms out.

    Separates synthetic mixtures (deterministic per index) through the
    Separator API — on-device STFT -> model -> mixture-phase masked iSTFT —
    and reports waveform-domain SI-SNR vs the clean sources.  Loads trained
    variables from --checkpoint-dir when given, else uses fresh init.
    """
    _force_cpu_if(args)
    import numpy as np

    from av_separation_tpu.data.synthetic import SyntheticAVDataset
    from av_separation_tpu.inference import Separator
    from av_separation_tpu.ops.istft import permutation_si_snr_waveform

    cfg = _build_config(args)
    if cfg.train.checkpoint_dir:
        sep = Separator.from_checkpoint(cfg.train.checkpoint_dir, cfg.model,
                                        cfg.data)
    else:
        import jax
        import jax.numpy as jnp

        from av_separation_tpu.models.model import AVSeparationTransformer
        model = AVSeparationTransformer(cfg.model)
        d = cfg.data
        variables = model.init(
            jax.random.PRNGKey(cfg.train.seed),
            jnp.zeros((1, d.freq_bins, d.num_stft_frames)),
            jnp.zeros((1, d.total_lip_frames, d.frame_h, d.frame_w)))
        sep = Separator(cfg.model, dict(variables), cfg.data)
        print("separate: no --checkpoint-dir, using untrained init",
              file=sys.stderr)

    ds = SyntheticAVDataset(cfg.data)
    n = args.batch or 4
    cleans = np.stack([ds.clean_audios(i)[0] for i in range(n)])  # (B, S, N)
    mixed = cleans.sum(axis=1)
    lips = np.stack([ds[i]["lip_frames"] for i in range(n)])
    out = sep.separate_waveform(mixed, lips)
    snr = permutation_si_snr_waveform(out["waveforms"], cleans)
    print(json.dumps({
        "batch": n,
        "waveform_shape": list(out["waveforms"].shape),
        "si_snr_waveform_db": round(float(np.mean(np.asarray(snr))), 3),
        "mask_min": round(float(out["masks"].min()), 4),
        "mask_max": round(float(out["masks"].max()), 4),
    }))
    return 0


def cmd_serve(args) -> int:
    """Micro-batching HTTP separation server (serving.py): coalesces
    concurrent POST /separate requests into batched device dispatches."""
    _force_cpu_if(args)
    import jax
    import jax.numpy as jnp

    from av_separation_tpu.inference import Separator
    from av_separation_tpu.models.model import AVSeparationTransformer
    from av_separation_tpu.serving import serve_forever

    cfg = _build_config(args)
    if cfg.train.checkpoint_dir:
        sep = Separator.from_checkpoint(cfg.train.checkpoint_dir, cfg.model,
                                        cfg.data)
    else:
        model = AVSeparationTransformer(cfg.model)
        d = cfg.data
        variables = model.init(
            jax.random.PRNGKey(cfg.train.seed),
            jnp.zeros((1, d.freq_bins, d.num_stft_frames)),
            jnp.zeros((1, d.total_lip_frames, d.frame_h, d.frame_w)))
        sep = Separator(cfg.model, dict(variables), cfg.data)
        print("serve: no --checkpoint-dir, serving untrained init",
              file=sys.stderr)
    warmup = tuple(int(b) for b in args.serve_warmup.split(",") if b) \
        if args.serve_warmup else ()
    serve_forever(sep, host=args.serve_host, port=args.serve_port,
                  max_batch=args.serve_max_batch,
                  max_delay_ms=args.serve_max_delay_ms,
                  auth_token=args.serve_auth_token
                  or os.environ.get("AVSEP_AUTH_TOKEN"),
                  max_request_bytes=args.serve_max_request_mb * 1024 * 1024,
                  certfile=args.serve_certfile, keyfile=args.serve_keyfile,
                  warmup_batches=warmup,
                  max_pending=args.serve_max_pending)
    return 0


def cmd_bench(args) -> int:
    _force_cpu_if(args)
    import subprocess
    cmd = [sys.executable, "bench.py", "--config", args.config]
    if args.steps:
        cmd += ["--steps", str(args.steps)]
    if args.batch:
        cmd += ["--batch", str(args.batch)]
    if args.impl:
        cmd += ["--impl", args.impl]
    if args.dtype:
        cmd += ["--dtype", args.dtype]
    if args.mode:
        cmd += ["--mode", args.mode]
    for axis in ("data", "fsdp", "seq", "model"):
        v = getattr(args, f"mesh_{axis}")
        if v:
            cmd += [f"--mesh-{axis}", str(v)]
    if args.cpu:
        # Forward explicitly: env JAX_PLATFORMS inheritance is not reliable
        # under this rig's site hook; bench.py --cpu pins it in-process.
        cmd += ["--cpu"]
    return subprocess.call(cmd)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="avsep")
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name, fn in (("train", cmd_train), ("eval", cmd_eval),
                     ("separate", cmd_separate), ("bench", cmd_bench),
                     ("serve", cmd_serve)):
        p = sub.add_parser(name)
        _add_common(p)
        if name == "serve":
            p.add_argument("--serve-host", default="0.0.0.0")
            p.add_argument("--serve-port", type=int, default=8571)
            p.add_argument("--serve-max-batch", type=int, default=32)
            p.add_argument("--serve-max-delay-ms", type=float, default=5.0)
            p.add_argument("--serve-auth-token", default=None,
                           help="bearer token required on every endpoint "
                                "except /healthz (or env AVSEP_AUTH_TOKEN)")
            p.add_argument("--serve-max-request-mb", type=int, default=64,
                           help="reject request bodies above this size "
                                "(413) before reading them")
            p.add_argument("--serve-certfile", default=None,
                           help="PEM certificate: serve TLS")
            p.add_argument("--serve-keyfile", default=None)
            p.add_argument("--serve-max-pending", type=int, default=1024,
                           help="pending-request queue depth; beyond it "
                                "requests are shed with 503 + Retry-After")
            p.add_argument("--serve-warmup", default="",
                           help="comma-separated batch sizes to pre-compile "
                                "(both APIs) before accepting traffic, "
                                "e.g. '1,8,32'")
        p.set_defaults(fn=fn)
    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
