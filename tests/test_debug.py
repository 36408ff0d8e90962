"""NaN-debugging tier (SURVEY.md §5 race-detection/sanitizers row): under
`jax_debug_nans`, a NaN produced anywhere inside the jitted train step is
re-run op-by-op and surfaces as FloatingPointError at the producing op —
instead of silently corrupting the run."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from av_separation_tpu.config import (
    DataConfig, ExperimentConfig, ModelConfig, TrainConfig)
from av_separation_tpu.train import create_train_state, make_train_step

TINY = ExperimentConfig(
    name="tiny",
    model=ModelConfig(freq_bins=65, d_model=32, nhead=2,
                      num_encoder_layers=1, num_fusion_layers=1,
                      num_speakers=2, dropout=0.0),
    data=DataConfig(num_samples=8, sample_rate=2048, duration=1.0,
                    n_fft=128, hop_length=64, num_frames=5,
                    frame_h=16, frame_w=16),
    train=TrainConfig(batch_size=2, steps=1),
)


def _batch(poison: bool):
    d = TINY.data
    rng = np.random.default_rng(0)
    b = TINY.train.batch_size
    mixed = np.abs(rng.normal(
        size=(b, d.freq_bins, d.num_stft_frames))).astype(np.float32)
    if poison:
        mixed[0, 0, 0] = np.nan  # a single rotten input value
    return {
        "mixed_spec": jnp.asarray(mixed),
        "lip_frames": jnp.asarray(rng.uniform(
            size=(b, d.total_lip_frames, d.frame_h, d.frame_w))
            .astype(np.float32)),
        "clean_specs": jnp.asarray(np.abs(rng.normal(
            size=(b, 2, d.freq_bins, d.num_stft_frames)))
            .astype(np.float32)),
    }


class TestDebugNans:
    @pytest.fixture()
    def debug_nans(self):
        jax.config.update("jax_debug_nans", True)
        try:
            yield
        finally:
            jax.config.update("jax_debug_nans", False)

    def test_nan_input_raises(self, debug_nans):
        model, state = create_train_state(TINY)
        step = make_train_step(model, TINY)
        with pytest.raises(FloatingPointError):
            _, m = step(state, _batch(poison=True))
            jax.block_until_ready(m["loss"])

    def test_clean_input_passes(self, debug_nans):
        model, state = create_train_state(TINY)
        step = make_train_step(model, TINY)
        state, m = step(state, _batch(poison=False))
        assert np.isfinite(float(m["loss"]))
