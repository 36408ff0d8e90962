"""Training-layer tests: step semantics, scan-fused steps, checkpointing,
mixed precision — all on tiny shapes (CPU backend)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from av_separation_tpu.config import (
    DataConfig, ExperimentConfig, ModelConfig, TrainConfig)
from av_separation_tpu.train import (
    TrainState, create_train_state, make_eval_step, make_fused_train_steps,
    make_train_step)

TINY = ExperimentConfig(
    name="tiny",
    model=ModelConfig(freq_bins=65, d_model=32, nhead=2,
                      num_encoder_layers=1, num_fusion_layers=1,
                      num_speakers=2, dropout=0.1),
    data=DataConfig(num_samples=16, sample_rate=2048, duration=1.0,
                    n_fft=128, hop_length=64, num_frames=5,
                    frame_h=16, frame_w=16),
    train=TrainConfig(batch_size=4, steps=3, log_every=0),
)


def tiny_batch(seed=0):
    d = TINY.data
    rng = np.random.default_rng(seed)
    b = TINY.train.batch_size
    return {
        "mixed_spec": jnp.asarray(np.abs(rng.normal(
            size=(b, d.freq_bins, d.num_stft_frames))).astype(np.float32)),
        "lip_frames": jnp.asarray(rng.uniform(
            size=(b, d.total_lip_frames, d.frame_h, d.frame_w))
            .astype(np.float32)),
        "clean_specs": jnp.asarray(np.abs(rng.normal(
            size=(b, 2, d.freq_bins, d.num_stft_frames)))
            .astype(np.float32)),
    }


class TestTrainStep:
    def test_step_decreases_loss_on_fixed_batch(self):
        model, state = create_train_state(TINY)
        step = make_train_step(model, TINY)
        batch = tiny_batch()
        losses = []
        for _ in range(8):
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]
        assert int(state.step) == 8

    def test_grad_clip_bounds_update(self):
        model, state = create_train_state(TINY)
        step = make_train_step(model, TINY)
        _, m = step(state, tiny_batch())
        assert np.isfinite(float(m["grad_norm"]))

    def test_deterministic_given_seed(self):
        model1, s1 = create_train_state(TINY)
        model2, s2 = create_train_state(TINY)
        step1 = make_train_step(model1, TINY)
        step2 = make_train_step(model2, TINY)
        b = tiny_batch()
        _, m1 = step1(s1, b)
        _, m2 = step2(s2, b)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-6)


class TestFusedScanSteps:
    def test_matches_stepwise_loss_trend(self):
        model, state = create_train_state(TINY)
        fused = make_fused_train_steps(model, TINY, steps_per_call=4)
        state, loss1 = fused(state)
        state, loss2 = fused(state)
        assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
        assert int(state.step) == 8
        assert float(loss2) < float(loss1)


class TestMixedPrecision:
    def test_bfloat16_forward_close_to_f32(self):
        cfg16 = dataclasses.replace(
            TINY, model=TINY.model.replace(compute_dtype="bfloat16"))
        model32, s32 = create_train_state(TINY)
        model16 = type(model32)(cfg16.model)
        batch = tiny_batch()
        sep32, _ = model32.apply(
            {"params": s32.params, "batch_stats": s32.batch_stats},
            batch["mixed_spec"], batch["lip_frames"], deterministic=True)
        sep16, masks16 = model16.apply(
            {"params": s32.params, "batch_stats": s32.batch_stats},
            batch["mixed_spec"], batch["lip_frames"], deterministic=True)
        assert sep16.dtype == jnp.float32  # outputs are upcast
        # bf16 has ~3 decimal digits; mask-level agreement should be loose
        # but bounded.
        assert float(jnp.abs(sep16 - sep32).max()) < 0.5

    def test_bfloat16_trains(self):
        cfg16 = dataclasses.replace(
            TINY, model=TINY.model.replace(compute_dtype="bfloat16"))
        model, state = create_train_state(cfg16)
        step = make_train_step(model, cfg16)
        batch = tiny_batch()
        losses = []
        for _ in range(6):
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all() if hasattr(
            np.isfinite(losses), "all") else all(map(np.isfinite, losses))
        assert losses[-1] < losses[0]


class TestCheckpoint:
    def test_round_trip(self, tmp_path):
        pytest.importorskip("orbax.checkpoint")
        from av_separation_tpu.utils.checkpoint import (
            latest_step, restore_checkpoint, save_checkpoint)
        model, state = create_train_state(TINY)
        step = make_train_step(model, TINY)
        state, _ = step(state, tiny_batch())
        save_checkpoint(str(tmp_path / "ck"), 1, state, wait=True)
        assert latest_step(str(tmp_path / "ck")) == 1

        _, fresh = create_train_state(TINY)
        restored = restore_checkpoint(str(tmp_path / "ck"), fresh)
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(restored.step) == 1

    def test_resume_replays_uninterrupted_stream(self, tmp_path):
        """Deterministic resume (VERDICT r3 #7): restore at step 3 and
        fast-forward the batch stream by state.step — the resumed loss
        trajectory must equal the uninterrupted run's bitwise (same jitted
        step, same batches, same restored state; crosses an epoch boundary
        so the epoch fast-forward path is exercised too)."""
        pytest.importorskip("orbax.checkpoint")
        from av_separation_tpu.data.loader import batch_iterator
        from av_separation_tpu.data.synthetic import SyntheticAVDataset
        from av_separation_tpu.utils.checkpoint import (
            restore_checkpoint, save_checkpoint)

        ds = SyntheticAVDataset(TINY.data)

        def dev(b):
            return {k: jnp.asarray(v) for k, v in b.items()}

        model, state = create_train_state(TINY)
        step = make_train_step(model, TINY)
        losses = []
        it = batch_iterator(ds, TINY.train.batch_size, seed=0)
        for _ in range(6):
            state, m = step(state, dev(next(it)))
            losses.append(float(m["loss"]))

        _, s2 = create_train_state(TINY)
        it2 = batch_iterator(ds, TINY.train.batch_size, seed=0)
        for _ in range(3):
            s2, _ = step(s2, dev(next(it2)))
        save_checkpoint(str(tmp_path / "ck"), 3, s2, wait=True)

        _, fresh = create_train_state(TINY)
        s3 = restore_checkpoint(str(tmp_path / "ck"), fresh)
        it3 = batch_iterator(ds, TINY.train.batch_size, seed=0,
                             start_step=int(s3.step))
        resumed = []
        for _ in range(3):
            s3, m3 = step(s3, dev(next(it3)))
            resumed.append(float(m3["loss"]))
        np.testing.assert_array_equal(np.asarray(resumed),
                                      np.asarray(losses[3:]))

    def test_device_iterator_start_step_is_stateless(self):
        from av_separation_tpu.data.device_synthetic import (
            device_batch_iterator)
        full = device_batch_iterator(TINY.data, 2, seed=5)
        skipped = [next(full) for _ in range(4)][2:]
        resumed_it = device_batch_iterator(TINY.data, 2, seed=5,
                                           start_step=2)
        for want, got in zip(skipped, (next(resumed_it) for _ in range(2))):
            for k in want:
                np.testing.assert_array_equal(np.asarray(want[k]),
                                              np.asarray(got[k]))

    def test_restore_missing_dir_returns_input(self, tmp_path):
        pytest.importorskip("orbax.checkpoint")
        from av_separation_tpu.utils.checkpoint import restore_checkpoint
        _, state = create_train_state(TINY)
        out = restore_checkpoint(str(tmp_path / "nonexistent"), state)
        assert out is state

    def test_manager_is_persistent_per_directory(self, tmp_path):
        # The async win depends on one CheckpointManager living for the whole
        # run: a fresh manager + close() per save would block on the async
        # write (close waits), serializing every save.
        pytest.importorskip("orbax.checkpoint")
        from av_separation_tpu.utils import checkpoint as ckpt
        a = ckpt._manager(str(tmp_path / "ck"))
        b = ckpt._manager(str(tmp_path / "ck"))
        assert a is b
        c = ckpt._manager(str(tmp_path / "other"))
        assert c is not a

    def test_async_save_overlaps_training(self, tmp_path):
        # Save WITHOUT wait, keep training through the donated-state step
        # (which reuses the saved buffers' memory), then wait and restore:
        # the restored params must equal the snapshot AT SAVE TIME — proving
        # save() copied device arrays out synchronously and wrote them in the
        # background while steps 2..3 ran.
        pytest.importorskip("orbax.checkpoint")
        from av_separation_tpu.utils.checkpoint import (
            restore_checkpoint, save_checkpoint, wait_until_finished)
        model, state = create_train_state(TINY)
        step = make_train_step(model, TINY)
        state, _ = step(state, tiny_batch())
        snapshot = jax.device_get(state.params)
        save_checkpoint(str(tmp_path / "ck"), 1, state)  # async, no wait
        for seed in (1, 2):  # keep training while the write is in flight
            state, _ = step(state, tiny_batch(seed))
        wait_until_finished(str(tmp_path / "ck"))

        _, fresh = create_train_state(TINY)
        restored = restore_checkpoint(str(tmp_path / "ck"), fresh, step=1)
        for a, b in zip(jax.tree_util.tree_leaves(snapshot),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestEvalStep:
    def test_metrics_contract(self):
        model, state = create_train_state(TINY)
        eval_fn = make_eval_step(model)
        m = eval_fn(state.params, state.batch_stats, tiny_batch())
        for key in ("input_snr", "output_snr", "mask_min", "mask_max"):
            assert np.isfinite(float(m[key])), key
        assert 0.0 <= float(m["mask_min"]) <= float(m["mask_max"]) <= 1.0


class TestRemat:
    def test_remat_trains_and_matches_no_remat_loss(self):
        cfg_r = dataclasses.replace(
            TINY, model=TINY.model.replace(remat=True, dropout=0.0))
        cfg_n = dataclasses.replace(
            TINY, model=TINY.model.replace(remat=False, dropout=0.0))
        model_r, s_r = create_train_state(cfg_r)
        model_n, s_n = create_train_state(cfg_n)
        step_r = make_train_step(model_r, cfg_r)
        step_n = make_train_step(model_n, cfg_n)
        b = tiny_batch()
        _, m_r = step_r(s_r, b)
        _, m_n = step_n(s_n, b)
        # Rematerialization must not change the math.
        np.testing.assert_allclose(float(m_r["loss"]), float(m_n["loss"]),
                                   rtol=1e-5)
