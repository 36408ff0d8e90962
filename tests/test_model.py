"""Component behavior tests, mirroring the reference test contract
(reference tests/test_model.py:58-363, 30 tests — see SURVEY.md §4) plus
JAX-specific additions (jit-ability, vmap/grad coherence).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from av_separation_tpu.config import ModelConfig
from av_separation_tpu.models.layers import (
    PositionalEncoding,
    TorchBatchNorm,
    sinusoidal_pe,
)
from av_separation_tpu.models.model import (
    AudioEncoder,
    AVSeparationTransformer,
    CrossModalFusion,
    SeparationDecoder,
    VisualEncoder,
)

from conftest import BATCH, D_MODEL, FREQ_BINS, H, NHEAD, NUM_FRAMES, T, W


def _init_apply(module, *args, **kwargs):
    variables = module.init(jax.random.PRNGKey(0), *args, **kwargs)
    out = module.apply(variables, *args, **kwargs)
    return variables, out


class TestPositionalEncoding:
    def test_output_shape(self):
        pe = PositionalEncoding(D_MODEL, dropout=0.1)
        x = jnp.zeros((BATCH, T, D_MODEL))
        _, out = _init_apply(pe, x, deterministic=True)
        assert out.shape == (BATCH, T, D_MODEL)

    def test_pe_added(self):
        pe = PositionalEncoding(D_MODEL, dropout=0.1)
        x = jnp.zeros((BATCH, T, D_MODEL))
        _, out = _init_apply(pe, x, deterministic=True)
        assert float(jnp.abs(out).sum()) > 0.0

    def test_no_length_cap(self):
        # The reference caps PE at max_len=5000 (reference model.py:286);
        # the on-the-fly table has no cap.
        table = sinusoidal_pe(6000, D_MODEL)
        assert table.shape == (6000, D_MODEL)
        assert bool(jnp.isfinite(table).all())


class TestAudioEncoder:
    def test_output_shape(self, small_cfg, audio_batch):
        enc = AudioEncoder(small_cfg)
        _, out = _init_apply(enc, jnp.asarray(audio_batch),
                             deterministic=True)
        assert out.shape == (BATCH, T, D_MODEL)

    @pytest.mark.parametrize("t", [16, 32, 64])
    def test_variable_length(self, small_cfg, t):
        enc = AudioEncoder(small_cfg)
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(BATCH, FREQ_BINS, t)).astype(np.float32))
        _, out = _init_apply(enc, x, deterministic=True)
        assert out.shape == (BATCH, t, D_MODEL)

    def test_gradient_flow(self, small_cfg, audio_batch):
        enc = AudioEncoder(small_cfg)
        x = jnp.asarray(audio_batch)
        variables = enc.init(jax.random.PRNGKey(0), x, deterministic=True)

        def loss(params):
            return jnp.sum(enc.apply({"params": params}, x,
                                     deterministic=True))

        grads = jax.grad(loss)(variables["params"])
        norms = [float(jnp.abs(g).sum())
                 for g in jax.tree_util.tree_leaves(grads)]
        assert all(np.isfinite(norms))
        assert sum(n > 0 for n in norms) == len(norms), \
            "every parameter should receive gradient"


class TestVisualEncoder:
    @pytest.mark.parametrize("target_len", [20, 32, 50])
    def test_output_shape_resampling(self, small_cfg, visual_batch,
                                     target_len):
        enc = VisualEncoder(small_cfg)
        x = jnp.asarray(visual_batch)
        _, out = _init_apply(enc, x, target_len, deterministic=True)
        assert out.shape == (BATCH, target_len, D_MODEL)

    def test_gradient_flow(self, small_cfg, visual_batch):
        enc = VisualEncoder(small_cfg)
        x = jnp.asarray(visual_batch)
        variables = enc.init(jax.random.PRNGKey(0), x, T,
                             deterministic=True)

        def loss(params):
            return jnp.sum(enc.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                x, T, deterministic=True))

        grads = jax.grad(loss)(variables["params"])
        assert all(np.isfinite(float(jnp.abs(g).sum()))
                   for g in jax.tree_util.tree_leaves(grads))

    @pytest.mark.parametrize("deterministic", [True, False])
    def test_s2d_stem_matches_xla(self, small_cfg, visual_batch,
                                  deterministic):
        """stem_impl='s2d' (space-to-depth restructure, ops/s2d_stem.py)
        computes exactly the same stem as the XLA conv path — identical
        parameter tree, float-tolerance outputs, both BN modes."""
        x = jnp.asarray(visual_batch)
        enc_x = VisualEncoder(small_cfg.replace(stem_impl="xla"))
        enc_s = VisualEncoder(small_cfg.replace(stem_impl="s2d"))
        variables = enc_x.init(jax.random.PRNGKey(0), x, T,
                               deterministic=True)
        kw = {} if deterministic else {
            "mutable": ["batch_stats"],
            "rngs": {"dropout": jax.random.PRNGKey(1)}}
        out_x = enc_x.apply(variables, x, T, deterministic=deterministic,
                            **kw)
        out_s = enc_s.apply(variables, x, T, deterministic=deterministic,
                            **kw)
        if not deterministic:
            (out_x, bs_x), (out_s, bs_s) = out_x, out_s
            for a, b in zip(jax.tree_util.tree_leaves(bs_x),
                            jax.tree_util.tree_leaves(bs_s)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_x), np.asarray(out_s),
                                   rtol=1e-4, atol=1e-5)

    def test_s2d_stem_gradients_match_xla(self, small_cfg, visual_batch):
        x = jnp.asarray(visual_batch)
        enc_x = VisualEncoder(small_cfg.replace(stem_impl="xla"))
        enc_s = VisualEncoder(small_cfg.replace(stem_impl="s2d"))
        variables = enc_x.init(jax.random.PRNGKey(0), x, T,
                               deterministic=True)

        def loss(enc, params):
            out, _ = enc.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                x, T, deterministic=False, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1)})
            return jnp.sum(out ** 2)

        gx = jax.grad(lambda p: loss(enc_x, p))(variables["params"])
        gs = jax.grad(lambda p: loss(enc_s, p))(variables["params"])
        for a, b in zip(jax.tree_util.tree_leaves(gx),
                        jax.tree_util.tree_leaves(gs)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=1e-4)

    def test_batch_stats_update_in_training(self, small_cfg, visual_batch):
        enc = VisualEncoder(small_cfg)
        x = jnp.asarray(visual_batch)
        variables = enc.init(jax.random.PRNGKey(0), x, T,
                             deterministic=True)
        _, updated = enc.apply(variables, x, T, deterministic=False,
                               rngs={"dropout": jax.random.PRNGKey(1)},
                               mutable=["batch_stats"])
        before = variables["batch_stats"]["bn1"]["mean"]
        after = updated["batch_stats"]["bn1"]["mean"]
        assert not np.allclose(np.asarray(before), np.asarray(after))


class TestCrossModalFusion:
    def test_shape_preserved(self, small_cfg):
        fusion = CrossModalFusion(small_cfg)
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.normal(size=(BATCH, T, D_MODEL))
                        .astype(np.float32))
        v = jnp.asarray(rng.normal(size=(BATCH, T, D_MODEL))
                        .astype(np.float32))
        _, out = _init_apply(fusion, a, v, deterministic=True)
        assert out.shape == (BATCH, T, D_MODEL)

    def test_visual_stream_used(self, small_cfg):
        fusion = CrossModalFusion(small_cfg)
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.normal(size=(BATCH, T, D_MODEL))
                        .astype(np.float32))
        v1 = jnp.asarray(rng.normal(size=(BATCH, T, D_MODEL))
                         .astype(np.float32))
        v2 = jnp.asarray(rng.normal(size=(BATCH, T, D_MODEL))
                         .astype(np.float32))
        variables = fusion.init(jax.random.PRNGKey(0), a, v1,
                                deterministic=True)
        o1 = fusion.apply(variables, a, v1, deterministic=True)
        o2 = fusion.apply(variables, a, v2, deterministic=True)
        assert not np.allclose(np.asarray(o1), np.asarray(o2))


class TestSeparationDecoder:
    def test_mask_shape(self, small_cfg):
        dec = SeparationDecoder(small_cfg)
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(BATCH, T, D_MODEL)).astype(np.float32))
        _, masks = _init_apply(dec, x, deterministic=True)
        assert masks.shape == (BATCH, small_cfg.num_speakers, FREQ_BINS, T)

    def test_mask_bounds(self, small_cfg):
        dec = SeparationDecoder(small_cfg)
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(BATCH, T, D_MODEL)).astype(np.float32) * 10)
        _, masks = _init_apply(dec, x, deterministic=True)
        assert float(masks.min()) >= 0.0 and float(masks.max()) <= 1.0

    def test_separate_shape(self, small_cfg, audio_batch):
        masks = jnp.asarray(np.random.default_rng(0).uniform(
            size=(BATCH, 2, FREQ_BINS, T)).astype(np.float32))
        sep = SeparationDecoder.separate(masks, jnp.asarray(audio_batch))
        assert sep.shape == (BATCH, 2, FREQ_BINS, T)


class TestAVSeparationTransformer:
    @pytest.fixture(scope="class")
    def model_and_vars(self, small_cfg):
        model = AVSeparationTransformer(small_cfg)
        rng = np.random.default_rng(0)
        mixed = jnp.asarray(rng.normal(size=(BATCH, FREQ_BINS, T))
                            .astype(np.float32))
        frames = jnp.asarray(rng.normal(
            size=(BATCH, NUM_FRAMES, H, W)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), mixed, frames,
                               deterministic=True)
        return model, variables, mixed, frames

    def test_e2e_shapes(self, model_and_vars, small_cfg):
        model, variables, mixed, frames = model_and_vars
        sep, masks = model.apply(variables, mixed, frames,
                                 deterministic=True)
        s = small_cfg.num_speakers
        assert sep.shape == (BATCH, s, FREQ_BINS, T)
        assert masks.shape == (BATCH, s, FREQ_BINS, T)

    def test_mask_bounds(self, model_and_vars):
        model, variables, mixed, frames = model_and_vars
        _, masks = model.apply(variables, mixed, frames,
                               deterministic=True)
        assert float(masks.min()) >= 0.0 and float(masks.max()) <= 1.0

    def test_backward_produces_grads(self, model_and_vars):
        model, variables, mixed, frames = model_and_vars

        def loss(params):
            sep, _ = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                mixed, frames, deterministic=True)
            return jnp.sum(jnp.square(sep))

        grads = jax.grad(loss)(variables["params"])
        total = sum(float(jnp.abs(g).sum())
                    for g in jax.tree_util.tree_leaves(grads))
        assert np.isfinite(total) and total > 0

    def test_training_mode_with_dropout(self, model_and_vars):
        model, variables, mixed, frames = model_and_vars
        (sep, masks), updated = model.apply(
            variables, mixed, frames, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])
        assert bool(jnp.isfinite(sep).all())
        assert "batch_stats" in updated

    def test_param_count_in_range(self, model_and_vars):
        _, variables, _, _ = model_and_vars
        n = sum(x.size
                for x in jax.tree_util.tree_leaves(variables["params"]))
        assert 10_000 < n < 100_000_000

    def test_jit_forward(self, model_and_vars):
        model, variables, mixed, frames = model_and_vars
        fwd = jax.jit(lambda v, m, f: model.apply(v, m, f,
                                                  deterministic=True))
        sep, masks = fwd(variables, mixed, frames)
        sep2, masks2 = model.apply(variables, mixed, frames,
                                   deterministic=True)
        np.testing.assert_allclose(np.asarray(sep), np.asarray(sep2),
                                   atol=1e-5, rtol=1e-5)


class TestTorchBatchNorm:
    def test_eval_uses_running_stats(self):
        bn = TorchBatchNorm(4)
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(8, 3, 3, 4)).astype(np.float32) * 5 + 2)
        variables = bn.init(jax.random.PRNGKey(0), x,
                            use_running_average=False)
        out = bn.apply(variables, x, use_running_average=True)
        # With fresh running stats (mean 0, var 1), eval output == input.
        np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                                   atol=1e-4, rtol=1e-4)

    def test_train_normalizes(self):
        bn = TorchBatchNorm(4)
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(64, 3, 3, 4)).astype(np.float32) * 5 + 2)
        variables = bn.init(jax.random.PRNGKey(0), x,
                            use_running_average=False)
        out, updated = bn.apply(variables, x, use_running_average=False,
                                mutable=["batch_stats"])
        out = np.asarray(out)
        assert abs(out.mean()) < 1e-3 and abs(out.std() - 1.0) < 1e-2
        # Torch-style running update: (1-0.1)*init + 0.1*batch.
        batch_mean = np.asarray(x).mean(axis=(0, 1, 2))
        np.testing.assert_allclose(
            np.asarray(updated["batch_stats"]["mean"]),
            0.9 * 0.0 + 0.1 * batch_mean, atol=1e-5, rtol=1e-4)
