"""Pallas kernel vs XLA-reference allclose gates (SURVEY.md §7.1 step 5).

On the CPU test backend the kernels run through the Pallas TPU interpreter
(`force_tpu_interpret_mode`); the same code paths compile natively on TPU and
are exercised there by bench.py --impl pallas.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from av_separation_tpu.ops.attention import attention_xla


def rand(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(
        size=shape).astype(np.float32))


@pytest.fixture(autouse=True)
def interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


class TestFlashAttention:
    @pytest.mark.parametrize("tq,tk,dh", [
        (63, 50, 32),    # demo cross-attention shape
        (63, 63, 32),    # demo self-attention
        (128, 128, 64),  # aligned
        (200, 37, 64),   # unaligned both axes
    ])
    def test_forward_allclose(self, tq, tk, dh):
        from av_separation_tpu.ops.pallas.attention import flash_attention
        q = rand((2, 4, tq, dh), 0)
        k = rand((2, 4, tk, dh), 1)
        v = rand((2, 4, tk, dh), 2)
        ours = flash_attention(q, k, v)
        ref = attention_xla(q, k, v)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)

    def test_backward_allclose(self):
        from av_separation_tpu.ops.pallas.attention import flash_attention
        q = rand((1, 2, 63, 32), 0)
        k = rand((1, 2, 50, 32), 1)
        v = rand((1, 2, 50, 32), 2)
        g = rand((1, 2, 63, 32), 3)

        def f_pallas(q, k, v):
            return jnp.vdot(flash_attention(q, k, v), g)

        def f_ref(q, k, v):
            return jnp.vdot(attention_xla(q, k, v), g)

        gp = jax.grad(f_pallas, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        for name, a, b in zip("qkv", gp, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3,
                err_msg=f"d{name} mismatch")

    def test_packed_matches_blockwise_path(self):
        # The head-packed single-block path (grid (BH/hp,), fused 1-kernel
        # backward) must match the generic blockwise path bit-for-float:
        # same shapes routed through both by forcing small blocks.
        from av_separation_tpu.ops.pallas.attention import flash_attention
        q = rand((2, 4, 96, 32), 0)
        k = rand((2, 4, 80, 32), 1)
        v = rand((2, 4, 80, 32), 2)
        g = rand((2, 4, 96, 32), 3)

        def loss(fn):
            return lambda q, k, v: jnp.vdot(fn(q, k, v), g)

        packed = lambda q, k, v: flash_attention(q, k, v)
        blockwise = lambda q, k, v: flash_attention(
            q, k, v, block_q=48, block_k=128)
        np.testing.assert_allclose(
            np.asarray(packed(q, k, v)), np.asarray(blockwise(q, k, v)),
            atol=2e-6, rtol=1e-5)
        gp = jax.grad(loss(packed), argnums=(0, 1, 2))(q, k, v)
        gb = jax.grad(loss(blockwise), argnums=(0, 1, 2))(q, k, v)
        for name, a, b in zip("qkv", gp, gb):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-6, rtol=1e-4,
                err_msg=f"d{name} packed vs blockwise")

    def test_long_sequence_blockwise(self):
        # Multiple q and k blocks exercise the online-softmax carry.
        from av_separation_tpu.ops.pallas.attention import flash_attention
        q = rand((1, 1, 384, 64), 0)
        k = rand((1, 1, 300, 64), 1)
        v = rand((1, 1, 300, 64), 2)
        ours = flash_attention(q, k, v, block_q=128, block_k=128)
        ref = attention_xla(q, k, v)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)


class TestFusedDecoder:
    def _setup(self, b=2, t=63, d=128, s=2, f=257, seed=0):
        r = np.random.default_rng(seed)
        fused = jnp.asarray(r.normal(size=(b, t, d)).astype(np.float32))
        w1 = jnp.asarray(r.normal(size=(d, 2 * d)).astype(np.float32) * 0.05)
        b1 = jnp.asarray(r.normal(size=(2 * d,)).astype(np.float32) * 0.05)
        w2 = jnp.asarray(r.normal(size=(2 * d, s * f)).astype(np.float32) * 0.05)
        b2 = jnp.asarray(r.normal(size=(s * f,)).astype(np.float32) * 0.05)
        mixed = jnp.asarray(r.normal(size=(b, f, t)).astype(np.float32))
        return fused, w1, b1, w2, b2, mixed, s, f

    def _reference(self, fused, w1, b1, w2, b2, mixed, s, f):
        bsz, t, _ = fused.shape
        h = jax.nn.gelu(fused @ w1 + b1, approximate=False)
        logits = h @ w2 + b2
        masks = jax.nn.sigmoid(
            logits.reshape(bsz, t, s, f).transpose(0, 2, 3, 1))
        return masks * mixed[:, None], masks

    def test_forward_allclose(self):
        from av_separation_tpu.ops.pallas.decoder import fused_mask_decoder
        fused, w1, b1, w2, b2, mixed, s, f = self._setup()
        sep_p, mask_p = fused_mask_decoder(fused, w1, b1, w2, b2, mixed, s, f)
        sep_r, mask_r = self._reference(fused, w1, b1, w2, b2, mixed, s, f)
        np.testing.assert_allclose(np.asarray(mask_p), np.asarray(mask_r),
                                   atol=2e-6, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(sep_p), np.asarray(sep_r),
                                   atol=2e-5, rtol=1e-5)

    def test_backward_allclose(self):
        from av_separation_tpu.ops.pallas.decoder import fused_mask_decoder
        fused, w1, b1, w2, b2, mixed, s, f = self._setup(t=37)

        def loss_p(*args):
            sep, masks = fused_mask_decoder(*args, s, f)
            return jnp.sum(sep * sep) + jnp.sum(masks)

        def loss_r(*args):
            sep, masks = self._reference(*args, s, f)
            return jnp.sum(sep * sep) + jnp.sum(masks)

        gp = jax.grad(loss_p, argnums=tuple(range(6)))(
            fused, w1, b1, w2, b2, mixed)
        gr = jax.grad(loss_r, argnums=tuple(range(6)))(
            fused, w1, b1, w2, b2, mixed)
        for name, a, b in zip(("fused", "w1", "b1", "w2", "b2", "mixed"),
                              gp, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-4,
                err_msg=f"grad {name}")

    def test_model_with_pallas_decoder_matches_golden(self, golden_model):
        import os
        import jax.tree_util as jtu
        from av_separation_tpu.config import ModelConfig
        from av_separation_tpu.models.model import AVSeparationTransformer
        from av_separation_tpu.utils.transplant import (
            from_reference_state_dict, load_golden_state_dict)
        sd = load_golden_state_dict(os.path.join(
            os.path.dirname(__file__), "golden", "golden_model.npz"))
        params, stats = from_reference_state_dict(sd)
        cfg = ModelConfig(freq_bins=257, d_model=128, nhead=4,
                          num_encoder_layers=2, num_fusion_layers=2,
                          num_speakers=2, dropout=0.1,
                          decoder_impl="pallas")
        model = AVSeparationTransformer(cfg)
        sep, masks = model.apply(
            {"params": jtu.tree_map(jnp.asarray, params),
             "batch_stats": jtu.tree_map(jnp.asarray, stats)},
            jnp.asarray(golden_model["mixed"]),
            jnp.asarray(golden_model["frames"]), deterministic=True)
        np.testing.assert_allclose(np.asarray(masks), golden_model["masks"],
                                   atol=2e-5, rtol=1e-4)


class TestPallasStft:
    def test_matches_host_reference(self):
        from av_separation_tpu.data.synthetic import stft_magnitude_np
        from av_separation_tpu.ops.pallas.stft import stft_magnitude_pallas
        rng = np.random.default_rng(0)
        audio = rng.normal(size=(3, 8000)).astype(np.float32)
        host = np.stack([stft_magnitude_np(a, 512, 128, 63) for a in audio])
        dev = stft_magnitude_pallas(jnp.asarray(audio), 512, 128, 63)
        assert dev.shape == (3, 257, 63)
        np.testing.assert_allclose(np.asarray(dev), host, atol=5e-4,
                                   rtol=1e-4)

    def test_odd_config_1d(self):
        from av_separation_tpu.data.synthetic import stft_magnitude_np
        from av_separation_tpu.ops.pallas.stft import stft_magnitude_pallas
        rng = np.random.default_rng(1)
        audio = rng.normal(size=2000).astype(np.float32)
        host = stft_magnitude_np(audio, 128, 64, 32)
        dev = stft_magnitude_pallas(jnp.asarray(audio), 128, 64, 32)
        np.testing.assert_allclose(np.asarray(dev), host, atol=5e-4,
                                   rtol=1e-4)


class TestFusedAudioProjection:
    def _setup(self, b=2, t=63, f=65, d=64, seed=0):
        r = np.random.default_rng(seed)
        x = jnp.asarray(r.normal(size=(b, t, f)).astype(np.float32))
        w1 = jnp.asarray(r.normal(size=(3, f, d)).astype(np.float32) * 0.1)
        b1 = jnp.asarray(r.normal(size=(d,)).astype(np.float32) * 0.1)
        w2 = jnp.asarray(r.normal(size=(3, d, d)).astype(np.float32) * 0.1)
        b2 = jnp.asarray(r.normal(size=(d,)).astype(np.float32) * 0.1)
        return x, w1, b1, w2, b2

    def test_forward_allclose(self):
        from av_separation_tpu.ops.pallas.audio_proj import (
            _xla_reference, fused_audio_projection)
        args = self._setup()
        ours = fused_audio_projection(*args)
        ref = _xla_reference(*args)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)

    def test_unaligned_t(self):
        from av_separation_tpu.ops.pallas.audio_proj import (
            _xla_reference, fused_audio_projection)
        args = self._setup(t=37)
        np.testing.assert_allclose(
            np.asarray(fused_audio_projection(*args)),
            np.asarray(_xla_reference(*args)), atol=2e-5, rtol=1e-4)

    def test_backward_allclose(self):
        from av_separation_tpu.ops.pallas.audio_proj import (
            _xla_reference, fused_audio_projection)
        args = self._setup(t=31)

        gp = jax.grad(lambda *a: jnp.sum(
            jnp.square(fused_audio_projection(*a))), argnums=(0, 1, 3))(*args)
        gr = jax.grad(lambda *a: jnp.sum(
            jnp.square(_xla_reference(*a))), argnums=(0, 1, 3))(*args)
        for name, a, b in zip(("x", "w1", "w2"), gp, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3, rtol=1e-4,
                                       err_msg=f"grad {name}")

    def test_audio_encoder_pallas_matches_golden(self, golden_model):
        import os
        import jax.tree_util as jtu
        from av_separation_tpu.config import ModelConfig
        from av_separation_tpu.models.model import AVSeparationTransformer
        from av_separation_tpu.utils.transplant import (
            from_reference_state_dict, load_golden_state_dict)
        sd = load_golden_state_dict(os.path.join(
            os.path.dirname(__file__), "golden", "golden_model.npz"))
        params, stats = from_reference_state_dict(sd)
        cfg = ModelConfig(freq_bins=257, d_model=128, nhead=4,
                          num_encoder_layers=2, num_fusion_layers=2,
                          num_speakers=2, dropout=0.1, proj_impl="pallas")
        model = AVSeparationTransformer(cfg)
        sep, masks = model.apply(
            {"params": jtu.tree_map(jnp.asarray, params),
             "batch_stats": jtu.tree_map(jnp.asarray, stats)},
            jnp.asarray(golden_model["mixed"]),
            jnp.asarray(golden_model["frames"]), deterministic=True)
        np.testing.assert_allclose(np.asarray(masks), golden_model["masks"],
                                   atol=2e-5, rtol=1e-4)


class TestPallasBf16Training:
    def test_full_train_step_all_pallas_bf16(self):
        """Regression: every Pallas kernel on the fwd+bwd path under
        bfloat16 mixed precision (the production bench configuration).
        Caught a custom-VJP cotangent dtype mismatch in audio_proj where the
        Pallas forward emits bf16 but the XLA backward graph promotes to
        f32 via the f32 biases."""
        import dataclasses

        from av_separation_tpu.config import (
            DataConfig, ExperimentConfig, ModelConfig, TrainConfig)
        from av_separation_tpu.train import create_train_state, \
            make_train_step

        cfg = ExperimentConfig(
            name="tiny_pallas_bf16",
            model=ModelConfig(freq_bins=65, d_model=32, nhead=2,
                              num_encoder_layers=1, num_fusion_layers=1,
                              num_speakers=2, dropout=0.1,
                              attn_impl="pallas", decoder_impl="pallas",
                              proj_impl="pallas", compute_dtype="bfloat16"),
            data=DataConfig(num_samples=8, sample_rate=2048, duration=1.0,
                            n_fft=128, hop_length=64, num_frames=5,
                            frame_h=16, frame_w=16),
            train=TrainConfig(batch_size=4, steps=1))
        d = cfg.data
        rng = np.random.default_rng(0)
        batch = {
            "mixed_spec": jnp.asarray(np.abs(rng.normal(
                size=(4, d.freq_bins, d.num_stft_frames))
            ).astype(np.float32)),
            "lip_frames": jnp.asarray(rng.uniform(
                size=(4, d.total_lip_frames, d.frame_h, d.frame_w)
            ).astype(np.float32)),
            "clean_specs": jnp.asarray(np.abs(rng.normal(
                size=(4, 2, d.freq_bins, d.num_stft_frames))
            ).astype(np.float32)),
        }
        model, state = create_train_state(cfg)
        step = make_train_step(model, cfg)
        state, m = step(state, batch)
        assert np.isfinite(float(m["loss"]))
        assert np.isfinite(float(m["grad_norm"]))


class TestFlashAttentionDropout:
    """In-kernel probability dropout (ops/pallas/attention.py): mask drawn
    from the hardware PRNG per (bh, q-block, k-block) tile, regenerated
    identically in the backward kernels."""

    def _qkv(self, tq=63, tk=50, dh=32, bh=(1, 2)):
        return (rand(bh + (tq, dh), 0), rand(bh + (tk, dh), 1),
                rand(bh + (tk, dh), 2))

    def test_rate_zero_matches_no_dropout(self):
        from av_separation_tpu.ops.pallas.attention import flash_attention
        q, k, v = self._qkv()
        seed = jnp.asarray([7], jnp.int32)
        a = flash_attention(q, k, v)
        b = flash_attention(q, k, v, dropout_rate=0.0, dropout_seed=seed)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_same_seed_deterministic_different_seed_differs(self):
        from av_separation_tpu.ops.pallas.attention import flash_attention
        q, k, v = self._qkv()
        s1 = jnp.asarray([3], jnp.int32)
        s2 = jnp.asarray([4], jnp.int32)
        a = flash_attention(q, k, v, dropout_rate=0.5, dropout_seed=s1)
        b = flash_attention(q, k, v, dropout_rate=0.5, dropout_seed=s1)
        c = flash_attention(q, k, v, dropout_rate=0.5, dropout_seed=s2)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert not np.allclose(np.asarray(a), np.asarray(c))

    def test_drop_fraction(self):
        # With V = I, out[q, j] = dropped_probs[q, j] / (1-r): zeros mark
        # dropped positions, so the zero fraction estimates the rate.
        from av_separation_tpu.ops.pallas.attention import flash_attention
        tk = dh = 128
        q = rand((1, 1, 128, dh), 0)
        k = rand((1, 1, tk, dh), 1)
        v = jnp.eye(tk, dh)[None, None]
        out = flash_attention(q, k, v, dropout_rate=0.3,
                              dropout_seed=jnp.asarray([11], jnp.int32))
        frac = float(np.mean(np.asarray(out) == 0.0))
        assert 0.25 < frac < 0.35, frac

    def test_unbiased_expectation(self):
        # E over seeds of dropped attention == undropped attention.
        from av_separation_tpu.ops.pallas.attention import flash_attention
        q, k, v = self._qkv(tq=16, tk=32, dh=32, bh=(1, 1))
        base = np.asarray(flash_attention(q, k, v))
        acc = np.zeros_like(base)
        n = 64
        for s in range(n):
            acc += np.asarray(flash_attention(
                q, k, v, dropout_rate=0.3,
                dropout_seed=jnp.asarray([s], jnp.int32)))
        np.testing.assert_allclose(acc / n, base, atol=0.25)

    def test_gradient_matches_finite_difference(self):
        # The mask is a fixed function of the seed, so the dropped attention
        # is a deterministic differentiable function; the backward kernels
        # must regenerate the identical mask (directional derivative check).
        from av_separation_tpu.ops.pallas.attention import flash_attention
        q, k, v = self._qkv(tq=16, tk=24, dh=32, bh=(1, 1))
        g = rand((1, 1, 16, 32), 3)
        seed = jnp.asarray([5], jnp.int32)

        def f(q, k, v):
            return jnp.vdot(flash_attention(
                q, k, v, dropout_rate=0.4, dropout_seed=seed), g)

        grads = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        rng = np.random.default_rng(9)
        for name, x, gx in zip("qkv", (q, k, v), grads):
            d = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
            eps = 1e-2
            fd = (float(f(*[a + eps * d if a is x else a
                            for a in (q, k, v)]))
                  - float(f(*[a - eps * d if a is x else a
                              for a in (q, k, v)]))) / (2 * eps)
            an = float(jnp.vdot(gx, d))
            np.testing.assert_allclose(an, fd, rtol=2e-2,
                                       err_msg=f"d{name}")


class TestAutoImplResolution:
    """The 'auto' selector must resolve to 'xla' off-TPU (this CPU suite)
    and respect explicit selectors unchanged; threshold logic is pure."""

    def test_explicit_passthrough(self):
        from av_separation_tpu.ops.attention import resolve_attn_impl
        assert resolve_attn_impl("xla", 10_000, 10_000) == "xla"
        assert resolve_attn_impl("pallas", 8, 8) == "pallas"

    def test_auto_is_xla_on_cpu(self):
        from av_separation_tpu.ops.attention import resolve_attn_impl
        assert jax.default_backend() == "cpu"
        assert resolve_attn_impl("auto", 501, 501) == "xla"

    def test_fused_impl_auto_cpu(self):
        from av_separation_tpu.models.model import _resolve_fused_impl
        assert _resolve_fused_impl("auto", 501) == "xla"
        assert _resolve_fused_impl("pallas", 8) == "pallas"
        assert _resolve_fused_impl("xla", 501) == "xla"

    def test_auto_threshold_logic(self):
        from av_separation_tpu.ops import attention as attn_mod
        from av_separation_tpu.ops import policy
        with policy.target_platform("tpu"):
            assert attn_mod.resolve_attn_impl("auto", 501, 501) == "pallas"
            assert attn_mod.resolve_attn_impl("auto", 63, 63) == "xla"
            from av_separation_tpu.models import model as model_mod
            assert model_mod._resolve_fused_impl("auto", 501) == "pallas"
            assert model_mod._resolve_fused_impl("auto", 63) == "xla"

    def test_policy_single_source_of_truth(self):
        """Both consumers resolve through ops/policy.py: moving a threshold
        there must move both behaviors (the round-2 drift bug)."""
        from av_separation_tpu.models import model as model_mod
        from av_separation_tpu.ops import attention as attn_mod
        from av_separation_tpu.ops import policy
        with policy.target_platform("tpu"):
            edge = policy.AUTO_MIN_SCORE_ELEMS
            assert attn_mod.resolve_attn_impl("auto", 1, edge) == "pallas"
            assert attn_mod.resolve_attn_impl("auto", 1, edge - 1) == "xla"
            t = policy.FUSED_MIN_SEQ
            assert model_mod._resolve_fused_impl("auto", t) == "pallas"
            assert model_mod._resolve_fused_impl("auto", t - 1) == "xla"

    def test_fused_auto_falls_back_under_sharded_mesh(self):
        """GSPMD can't partition the fused proj/decoder pallas_calls; under
        any sharded mesh 'auto' must resolve them to 'xla'."""
        from jax.sharding import Mesh

        from av_separation_tpu.ops import policy
        devices = np.asarray(jax.devices()[:4]).reshape(2, 1, 2)
        mesh = Mesh(devices, ("data", "fsdp", "model"))
        with policy.target_platform("tpu"), policy.use_mesh(mesh):
            assert policy.resolve_fused("auto", 501) == "xla"
        with policy.target_platform("tpu"):
            assert policy.resolve_fused("auto", 501) == "pallas"


class TestShardedFlashAttention:
    """The flash kernel under a sharded mesh runs through shard_map — batch
    over ('data','fsdp'), heads over 'model' — and must match dense XLA
    attention (ops/attention.py `_flash_sharded`)."""

    def _mesh(self, shape):
        from jax.sharding import Mesh
        n = int(np.prod(shape))
        return Mesh(np.asarray(jax.devices()[:n]).reshape(shape),
                    ("data", "fsdp", "model"))

    @pytest.mark.parametrize("shape", [(2, 1, 2), (4, 1, 1), (1, 2, 2)])
    def test_matches_dense(self, shape):
        from av_separation_tpu.ops import policy
        from av_separation_tpu.ops.attention import multi_head_attention
        mesh = self._mesh(shape)
        q = rand((4, 48, 64), 0)
        k = rand((4, 40, 64), 1)
        v = rand((4, 40, 64), 2)
        ref = multi_head_attention(q, k, v, nhead=4, impl="xla")
        with policy.use_mesh(mesh):
            out = multi_head_attention(q, k, v, nhead=4, impl="pallas")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)

    def test_indivisible_heads_fall_back_to_xla(self):
        """3 heads can't shard over model=2: the resolver must fall back to
        the XLA path (bit-identical here) instead of a broken shard_map."""
        from av_separation_tpu.ops import policy
        from av_separation_tpu.ops.attention import multi_head_attention
        mesh = self._mesh((2, 1, 2))
        q = rand((4, 48, 48), 0)
        k = rand((4, 40, 48), 1)
        v = rand((4, 40, 48), 2)
        ref = multi_head_attention(q, k, v, nhead=3, impl="xla")
        with policy.use_mesh(mesh):
            out = multi_head_attention(q, k, v, nhead=3, impl="pallas")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=0, rtol=0)

    def test_sharded_dropout_grads_finite(self):
        """Training path: in-kernel dropout under shard_map — grads flow and
        the per-shard seed decorrelation compiles (axis_index inside
        shard_map)."""
        from av_separation_tpu.ops import policy
        from av_separation_tpu.ops.attention import multi_head_attention
        mesh = self._mesh((2, 1, 2))
        q = rand((4, 48, 64), 0)
        k = rand((4, 40, 64), 1)
        v = rand((4, 40, 64), 2)
        rng = jax.random.PRNGKey(0)

        def loss(q):
            with policy.use_mesh(mesh):
                out = multi_head_attention(q, k, v, nhead=4, impl="pallas",
                                           dropout_rate=0.1, dropout_rng=rng)
            return jnp.sum(out ** 2)

        val, g = jax.value_and_grad(loss)(q)
        assert np.isfinite(float(val))
        assert np.all(np.isfinite(np.asarray(g)))


class TestStemPolicy:
    """The visual stem 'auto' resolution is a CLOSED measured question:
    three alternatives (Pallas v1/v2, s2d) lost to the XLA conv emitter on
    v5e (docs/kernels.md, bench_results/stem_ab.jsonl); 'pallas' is
    removed and raises."""

    def test_resolver_auto_is_xla(self):
        from av_separation_tpu.ops import policy
        assert policy.resolve_stem("auto", 32, 32) == "xla"
        with policy.target_platform("tpu"):
            assert policy.resolve_stem("auto", 32, 32) == "xla"
        assert policy.resolve_stem("s2d", 32, 32) == "s2d"

    def test_pallas_stem_removed(self):
        from av_separation_tpu.ops import policy
        with pytest.raises(ValueError, match="removed"):
            policy.resolve_stem("pallas", 32, 32)


class TestRegenDropout:
    """fast_dropout regenerates its keep mask in the backward pass from
    the rng key (custom VJP) — the gradient must equal mask*scale with
    the SAME mask the forward applied, for both key impls."""

    @pytest.mark.parametrize("impl", [None, "rbg"])
    def test_bwd_mask_matches_fwd(self, impl):
        from av_separation_tpu.ops.dropout import fast_dropout
        rng = jax.random.key(3, impl=impl) if impl \
            else jax.random.PRNGKey(3)
        x = rand((64, 128), 0) + 1.0  # bounded away from exact zero
        o = jax.jit(lambda x: fast_dropout(x, 0.1, rng))(x)
        g = jax.jit(jax.grad(
            lambda x: jnp.sum(fast_dropout(x, 0.1, rng))))(x)
        mask = np.asarray(o != 0)
        assert 0.03 < 1 - mask.mean() < 0.2
        want = np.where(mask, 1.0 / (1.0 - 26 / 256.0), 0.0)
        np.testing.assert_allclose(np.asarray(g), want, atol=1e-6)

    def test_deterministic_passthrough(self):
        from av_separation_tpu.ops.dropout import Dropout
        x = rand((4, 8), 1)
        y = Dropout(0.5).apply({}, x, deterministic=True)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
