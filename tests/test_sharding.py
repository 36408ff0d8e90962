"""Mesh/sharding tests on the 8-virtual-device CPU backend — the distributed
test tier the reference entirely lacks (SURVEY.md §2.4, §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from av_separation_tpu.config import (
    DataConfig, ExperimentConfig, MeshConfig, ModelConfig, TrainConfig)
from av_separation_tpu.parallel.mesh import (
    make_mesh, param_shardings, spec_for_path)
from av_separation_tpu.train import create_train_state, make_train_step


TINY = ExperimentConfig(
    name="tiny",
    model=ModelConfig(freq_bins=65, d_model=64, nhead=4,
                      num_encoder_layers=1, num_fusion_layers=1,
                      num_speakers=2, dropout=0.0),
    data=DataConfig(num_samples=8, sample_rate=2048, duration=1.0,
                    n_fft=128, hop_length=128, num_frames=5,
                    frame_h=16, frame_w=16),
    train=TrainConfig(batch_size=8, steps=1),
)


def tiny_batch(b=8):
    d = TINY.data
    rng = np.random.default_rng(0)
    return {
        "mixed_spec": jnp.asarray(rng.normal(
            size=(b, d.freq_bins, d.num_stft_frames)).astype(np.float32)),
        "lip_frames": jnp.asarray(rng.normal(
            size=(b, d.total_lip_frames, d.frame_h, d.frame_w))
            .astype(np.float32)),
        "clean_specs": jnp.asarray(rng.normal(
            size=(b, 2, d.freq_bins, d.num_stft_frames)).astype(np.float32)),
    }


class TestPartitionRules:
    def test_attention_rules(self):
        assert spec_for_path(
            "fusion/layer_0/cross_attn/q_proj/kernel") == P("fsdp", "model")
        assert spec_for_path(
            "fusion/layer_0/cross_attn/out_proj/kernel") == P("model", "fsdp")

    def test_ffn_rules(self):
        assert spec_for_path(
            "audio_encoder/transformer/layer_1/linear1/kernel"
        ) == P("fsdp", "model")
        assert spec_for_path("decoder/fc2/kernel") == P("model", "fsdp")

    def test_norms_replicated(self):
        assert spec_for_path(
            "fusion/layer_0/norm1/scale") == P()
        assert spec_for_path("visual_encoder/bn1/scale") == P()

    def test_indivisible_dim_dropped_not_whole_spec(self):
        """conv1 kernel (3, 257, d): 257 can't take 'fsdp', but d keeps
        'model' — the guard drops per-dim, not the whole spec."""
        from av_separation_tpu.parallel.mesh import param_shardings
        mesh = make_mesh(MeshConfig(data=1, fsdp=2, model=4))
        tree = {"audio_encoder": {"conv1": {
            "kernel": jnp.zeros((3, 257, 64))}}}
        sh = param_shardings(mesh, tree)
        spec = sh["audio_encoder"]["conv1"]["kernel"].spec
        assert spec == P(None, None, "model")


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
class TestMeshExecution:
    def test_dp_train_step(self):
        import dataclasses
        cfg = dataclasses.replace(TINY, mesh=MeshConfig(data=8, model=1))
        mesh = make_mesh(cfg.mesh)
        model, state = create_train_state(cfg, mesh)
        step = make_train_step(model, cfg, mesh)
        with mesh:
            state, metrics = step(state, tiny_batch())
        assert np.isfinite(float(metrics["loss"]))

    def test_tp_train_step(self):
        import dataclasses
        cfg = dataclasses.replace(TINY, mesh=MeshConfig(data=2, model=4))
        mesh = make_mesh(cfg.mesh)
        model, state = create_train_state(cfg, mesh)
        step = make_train_step(model, cfg, mesh)
        with mesh:
            state, metrics = step(state, tiny_batch())
        assert np.isfinite(float(metrics["loss"]))

    def test_params_actually_sharded(self):
        import dataclasses
        cfg = dataclasses.replace(TINY, mesh=MeshConfig(data=2, model=4))
        mesh = make_mesh(cfg.mesh)
        _, state = create_train_state(cfg, mesh)
        k = state.params["fusion"]["layer_0"]["cross_attn"]["q_proj"]["kernel"]
        # Each device holds 1/4 of the columns (fsdp axis is size 1 here).
        shard_shape = k.sharding.shard_shape(k.shape)
        assert shard_shape == (k.shape[0], k.shape[1] // 4)

    def test_fsdp_shards_params_and_adam_moments(self):
        """ZeRO axis: params AND Adam mu/nu live sharded over 'fsdp' — the
        per-device footprint of a (d,d) kernel drops by the axis size."""
        import dataclasses
        cfg = dataclasses.replace(TINY, mesh=MeshConfig(data=2, fsdp=4,
                                                        model=1))
        mesh = make_mesh(cfg.mesh)
        _, state = create_train_state(cfg, mesh)
        k = state.params["fusion"]["layer_0"]["cross_attn"]["q_proj"]["kernel"]
        assert k.sharding.shard_shape(k.shape) == (k.shape[0] // 4,
                                                   k.shape[1])
        # Adam moments mirror the param shardings (ZeRO optimizer sharding).
        mu = state.opt_state[1][0].mu
        mu_k = mu["fusion"]["layer_0"]["cross_attn"]["q_proj"]["kernel"]
        assert mu_k.sharding.shard_shape(mu_k.shape) == (
            mu_k.shape[0] // 4, mu_k.shape[1])

    def test_fsdp_matches_single_device(self):
        """data=2 x fsdp=4 loss == single-device loss (same data/init)."""
        import dataclasses
        model1, state1 = create_train_state(TINY)
        step1 = make_train_step(model1, TINY)

        cfgF = dataclasses.replace(TINY, mesh=MeshConfig(data=2, fsdp=4,
                                                         model=1))
        mesh = make_mesh(cfgF.mesh)
        modelF, stateF = create_train_state(cfgF, mesh)
        stepF = make_train_step(modelF, cfgF, mesh)

        batch = tiny_batch()
        _, m1 = step1(state1, batch)
        with mesh:
            _, mF = stepF(stateF, batch)
        np.testing.assert_allclose(float(m1["loss"]), float(mF["loss"]),
                                   atol=1e-4, rtol=1e-5)

    def test_sharded_matches_single_device(self):
        """DP-sharded loss == single-device loss (same data, same init)."""
        import dataclasses
        cfg1 = TINY
        model1, state1 = create_train_state(cfg1)
        step1 = make_train_step(model1, cfg1)

        cfg8 = dataclasses.replace(TINY, mesh=MeshConfig(data=8, model=1))
        mesh = make_mesh(cfg8.mesh)
        model8, state8 = create_train_state(cfg8, mesh)
        step8 = make_train_step(model8, cfg8, mesh)

        batch = tiny_batch()
        _, m1 = step1(state1, batch)
        with mesh:
            _, m8 = step8(state8, batch)
        np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                                   atol=1e-4, rtol=1e-5)

    def test_pallas_attention_sharded_train_step(self):
        """Flash attention under a DP x TP mesh routes through shard_map
        (ops/attention.py `_flash_sharded`) and the sharded train-step loss
        matches the single-device XLA loss — the path the multihost config
        runs when 'auto' resolves to pallas on real chips."""
        import dataclasses

        from jax.experimental.pallas import tpu as pltpu

        model1, state1 = create_train_state(TINY)
        step1 = make_train_step(model1, TINY)
        batch = tiny_batch()
        _, m1 = step1(state1, batch)

        cfgP = dataclasses.replace(
            TINY,
            model=TINY.model.replace(attn_impl="pallas"),
            mesh=MeshConfig(data=2, fsdp=1, model=2))
        mesh = make_mesh(cfgP.mesh)
        with pltpu.force_tpu_interpret_mode():
            modelP, stateP = create_train_state(cfgP, mesh)
            stepP = make_train_step(modelP, cfgP, mesh)
            with mesh:
                _, mP = stepP(stateP, batch)
            loss = float(mP["loss"])
        np.testing.assert_allclose(float(m1["loss"]), loss,
                                   atol=1e-4, rtol=1e-5)


class TestFallbackWarnings:
    """A sharded run that silently demotes flash/fused kernels to XLA loses
    the measured +25%/+56% win with no signal (VERDICT r4 weak #7) — the
    policy layer now logs a trace-time warning."""

    def test_flash_indivisible_batch_warns(self, caplog):
        import logging

        from av_separation_tpu.ops import policy
        from av_separation_tpu.ops.attention import multi_head_attention

        mesh = make_mesh(MeshConfig(data=8))
        q = jnp.zeros((2, 16, 64))  # batch 2 not divisible by data=8
        with policy.use_mesh(mesh), caplog.at_level(
                logging.WARNING, logger="av_separation_tpu.ops.attention"):
            jax.eval_shape(
                lambda x: multi_head_attention(x, x, x, 4, impl="pallas"), q)
        assert any("demoted to XLA dense" in r.message
                   for r in caplog.records)

    def test_fused_sharded_mesh_warns(self, caplog):
        import logging

        from av_separation_tpu.ops import policy

        mesh = make_mesh(MeshConfig(data=2))
        with policy.use_mesh(mesh), policy.target_platform("tpu"), \
                caplog.at_level(logging.WARNING,
                                logger="av_separation_tpu.ops.policy"):
            assert policy.resolve_fused("auto", 512) == "xla"
        assert any("demoted to XLA" in r.message for r in caplog.records)


class TestGraftEntry:
    def test_entry_compiles(self):
        import sys
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge
        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        sep, masks = out
        assert bool(jnp.isfinite(sep).all())

    @pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
    def test_dryrun_multichip(self):
        import sys
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge
        ge.dryrun_multichip(8)
