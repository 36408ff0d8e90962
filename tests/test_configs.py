"""All five BASELINE.json named configs must construct, shape-check, and
abstractly compile a training step (jax.eval_shape — no FLOPs spent)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from av_separation_tpu.config import NAMED_CONFIGS, get_config
from av_separation_tpu.models.model import AVSeparationTransformer
from av_separation_tpu.utils.roofline import (
    model_forward_flops, train_step_flops)


@pytest.mark.parametrize("name", sorted(NAMED_CONFIGS))
class TestNamedConfigs:
    def test_constructs_and_is_consistent(self, name):
        cfg = get_config(name)
        assert cfg.name == name
        assert cfg.model.d_model % cfg.model.nhead == 0
        assert cfg.model.num_speakers == cfg.data.num_speakers
        assert cfg.data.freq_bins == cfg.model.freq_bins
        assert cfg.mesh.num_devices >= 1

    def test_forward_shapes_abstract(self, name):
        cfg = get_config(name)
        model = AVSeparationTransformer(cfg.model)
        d = cfg.data
        mixed = jax.ShapeDtypeStruct((2, d.freq_bins, d.num_stft_frames),
                                     jnp.float32)
        frames = jax.ShapeDtypeStruct(
            (2, d.total_lip_frames, d.frame_h, d.frame_w), jnp.float32)

        def init_and_fwd(key):
            variables = model.init(key, jnp.zeros(mixed.shape),
                                   jnp.zeros(frames.shape))
            return model.apply(variables, jnp.zeros(mixed.shape),
                               jnp.zeros(frames.shape), deterministic=True)

        sep, masks = jax.eval_shape(init_and_fwd, jax.random.PRNGKey(0))
        s = cfg.model.num_speakers
        assert sep.shape == (2, s, d.freq_bins, d.num_stft_frames)
        assert masks.shape == (2, s, d.freq_bins, d.num_stft_frames)

    def test_roofline_prices_it(self, name):
        cfg = get_config(name)
        f = model_forward_flops(cfg)
        assert 1e8 < f < 1e13
        assert train_step_flops(cfg, cfg.train.batch_size) > 3 * f


def test_multihost_config_mesh_shape():
    cfg = get_config("multihost")
    assert cfg.mesh.data * cfg.mesh.model == 8
    assert cfg.model.remat  # big model trains with rematerialization
