"""Round-5 fused-op gates: packed-layout flash attention, fused
activation+dropout, slice-based STFT framing, outer-product sine bank.

Each new fast path is gated against the formulation it replaced (which the
earlier rounds in turn gated against the torch reference).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu


def rand(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(
        size=shape).astype(np.float32))


class TestPackedLayoutFlash:
    """flash_attention_packed_qkv: (B, T, H*dh) in/out, no head transpose."""

    @pytest.mark.parametrize("tq,tk,nh", [
        (501, 501, 4),   # scaled self-attention
        (501, 100, 4),   # scaled cross-attention (audio q, visual kv)
        (128, 128, 8),   # multihost head count
    ])
    def test_matches_split_heads_path(self, tq, tk, nh):
        from av_separation_tpu.ops.attention import merge_heads, split_heads
        from av_separation_tpu.ops.pallas.attention import (
            flash_attention, flash_attention_packed_qkv)
        dh = 128
        q = rand((2, tq, nh * dh), 0)
        k = rand((2, tk, nh * dh), 1)
        v = rand((2, tk, nh * dh), 2)
        with pltpu.force_tpu_interpret_mode():
            packed = flash_attention_packed_qkv(q, k, v, nh)
            qh, kh, vh = (split_heads(x, nh) for x in (q, k, v))
            ref = merge_heads(flash_attention(qh, kh, vh))
        assert packed is not None
        np.testing.assert_allclose(np.asarray(packed), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)

    def test_backward_matches_split_heads_path(self):
        from av_separation_tpu.ops.attention import merge_heads, split_heads
        from av_separation_tpu.ops.pallas.attention import (
            flash_attention, flash_attention_packed_qkv)
        nh, dh = 4, 128
        q = rand((1, 200, nh * dh), 0)
        k = rand((1, 160, nh * dh), 1)
        v = rand((1, 160, nh * dh), 2)
        g = rand((1, 200, nh * dh), 3)

        def f_packed(q, k, v):
            return jnp.vdot(flash_attention_packed_qkv(q, k, v, nh), g)

        def f_ref(q, k, v):
            qh, kh, vh = (split_heads(x, nh) for x in (q, k, v))
            return jnp.vdot(merge_heads(flash_attention(qh, kh, vh)), g)

        with pltpu.force_tpu_interpret_mode():
            gp = jax.grad(f_packed, argnums=(0, 1, 2))(q, k, v)
            gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        for name, a, b in zip("qkv", gp, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5, rtol=1e-4, err_msg=name)

    def test_dropout_mask_stream_matches_unpacked(self):
        """Same seed must draw the same per-(b*H+h) tile mask stream as the
        head-packed path (the two paths share _keep_mask seeding)."""
        from av_separation_tpu.ops.attention import merge_heads, split_heads
        from av_separation_tpu.ops.pallas.attention import (
            flash_attention, flash_attention_packed_qkv)
        nh, dh = 4, 128
        q, k, v = (rand((2, 96, nh * dh), i) for i in range(3))
        seed = jnp.asarray([777], jnp.int32)
        with pltpu.force_tpu_interpret_mode():
            packed = flash_attention_packed_qkv(
                q, k, v, nh, dropout_rate=0.3, dropout_seed=seed)
            qh, kh, vh = (split_heads(x, nh) for x in (q, k, v))
            ref = merge_heads(flash_attention(
                qh, kh, vh, dropout_rate=0.3, dropout_seed=seed))
        np.testing.assert_allclose(np.asarray(packed), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)

    def test_returns_none_for_narrow_heads(self):
        from av_separation_tpu.ops.pallas.attention import (
            flash_attention_packed_qkv)
        q = rand((2, 63, 128), 0)  # demo: dh=32 — not a lane multiple
        assert flash_attention_packed_qkv(q, q, q, 4) is None

    def test_sharded_packed_matches_unsharded(self):
        """TP shards whole head groups along the packed last dim
        (ops/attention.py `_flash_sharded_packed`): a data=2 x model=2
        mesh must reproduce the single-device result."""
        from av_separation_tpu.config import MeshConfig
        from av_separation_tpu.ops import policy
        from av_separation_tpu.ops.attention import multi_head_attention
        from av_separation_tpu.parallel.mesh import make_mesh
        nh, dh = 4, 128
        q = rand((4, 96, nh * dh), 0)
        k = rand((4, 80, nh * dh), 1)
        v = rand((4, 80, nh * dh), 2)
        mesh = make_mesh(MeshConfig(data=2, model=2))
        with pltpu.force_tpu_interpret_mode():
            ref = multi_head_attention(q, k, v, nh, impl="pallas")
            with policy.use_mesh(mesh), mesh:
                sharded = multi_head_attention(q, k, v, nh, impl="pallas")
        np.testing.assert_allclose(np.asarray(sharded), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)


class TestPackedLaneAutoPolicy:
    def test_lane_multiple_head_dim_picks_pallas_below_crossover(self):
        from av_separation_tpu.ops import policy
        from av_separation_tpu.ops.attention import resolve_attn_impl
        with policy.target_platform("tpu"):
            # scaled visual self-attention: T=100, dh=128 — packed wins
            assert resolve_attn_impl("auto", 100, 100, d_head=128) \
                == "pallas"
            # scaled fusion cross-attention: (501, 100), dh=128
            assert resolve_attn_impl("auto", 501, 100, d_head=128) \
                == "pallas"
            # three_speaker audio self-attention: T=63 — measured xla win
            assert resolve_attn_impl("auto", 63, 63, d_head=128) == "xla"
            # demo shape: dh=32 — no packed path, below crossover
            assert resolve_attn_impl("auto", 100, 100, d_head=32) == "xla"
            # no d_head info: legacy crossover behavior
            assert resolve_attn_impl("auto", 100, 100) == "xla"
        # CPU: always xla
        assert resolve_attn_impl("auto", 100, 100, d_head=128) == "xla"


class TestFusedActivationDropout:
    def test_relu_dropout_matches_unfused(self):
        from av_separation_tpu.ops.activations import relu_dropout
        from av_separation_tpu.ops.dropout import fast_dropout
        x = rand((32, 257), 0)
        rng = jax.random.PRNGKey(5)
        out = relu_dropout(x, 0.1, rng)
        ref = fast_dropout(jnp.maximum(x, 0), 0.1, rng)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_relu_dropout_grad_matches_unfused(self):
        from av_separation_tpu.ops.activations import relu_dropout
        from av_separation_tpu.ops.dropout import fast_dropout
        x = rand((16, 64), 1)
        rng = jax.random.PRNGKey(9)
        g1 = jax.grad(lambda v: relu_dropout(v, 0.25, rng).sum())(x)
        g2 = jax.grad(
            lambda v: fast_dropout(jnp.maximum(v, 0), 0.25, rng).sum())(x)
        np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))

    def test_gelu_dropout_matches_unfused(self):
        from av_separation_tpu.ops.activations import gelu_dropout
        from av_separation_tpu.ops.dropout import fast_dropout
        x = rand((32, 257), 2)
        rng = jax.random.PRNGKey(6)
        out = gelu_dropout(x, 0.1, rng)
        ref = fast_dropout(jax.nn.gelu(x, approximate=False), 0.1, rng)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6)

    def test_gelu_dropout_grad_matches_unfused(self):
        from av_separation_tpu.ops.activations import gelu_dropout
        from av_separation_tpu.ops.dropout import fast_dropout
        x = rand((16, 64), 3)
        rng = jax.random.PRNGKey(7)
        g1 = jax.grad(lambda v: gelu_dropout(v, 0.25, rng).sum())(x)
        g2 = jax.grad(lambda v: fast_dropout(
            jax.nn.gelu(v, approximate=False), 0.25, rng).sum())(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=1e-6)

    def test_rate_zero_is_plain_activation(self):
        from av_separation_tpu.ops.activations import (gelu_dropout, relu,
                                                       relu_dropout)
        x = rand((8, 32), 4)
        np.testing.assert_array_equal(
            np.asarray(relu_dropout(x, 0.0, None)),
            np.asarray(jnp.maximum(x, 0)))
        np.testing.assert_allclose(
            np.asarray(gelu_dropout(x, 0.0, None)),
            np.asarray(jax.nn.gelu(x, approximate=False)), atol=1e-6)
        # save-output relu gradient convention matches jax.nn.relu at 0.
        g1 = jax.grad(lambda v: relu(v).sum())(x)
        g2 = jax.grad(lambda v: jax.nn.relu(v).sum())(x)
        np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


class TestSliceFraming:
    @pytest.mark.parametrize("n,n_fft,hop,frames", [
        (2000, 128, 64, 32),    # hop | n_fft: slice path
        (2000, 128, 48, 42),    # hop does not divide n_fft: gather path
        (100, 128, 64, 3),      # tail zero-pad
    ])
    def test_matches_gather_formulation(self, n, n_fft, hop, frames):
        from av_separation_tpu.ops.stft import frame_signal
        audio = rand((3, n), 0)
        got = frame_signal(audio, n_fft, hop, frames)
        pad = max(0, (frames - 1) * hop + n_fft - n)
        padded = np.pad(np.asarray(audio), ((0, 0), (0, pad)))
        idx = np.arange(frames)[:, None] * hop + np.arange(n_fft)[None, :]
        ref = padded[:, idx]
        np.testing.assert_array_equal(np.asarray(got), ref)


class TestSineBank:
    def test_outer_product_matches_direct_sin(self):
        from av_separation_tpu.data.device_synthetic import _sine_factor_split
        n, dur = 8000, 1.0
        L = _sine_factor_split(n)
        assert L > 1 and n % L == 0
        freqs = jnp.asarray([[220.0, 441.3]])
        phase = jnp.asarray([[0.3, 4.1]])
        dt = dur / n
        a_idx = jnp.arange(n // L, dtype=jnp.float32) * float(L)
        b_idx = jnp.arange(L, dtype=jnp.float32)
        w = (2.0 * np.pi * dt) * freqs
        th_a = w[..., None] * a_idx + phase[..., None]
        th_b = w[..., None] * b_idx
        bank = (jnp.sin(th_a)[..., :, None] * jnp.cos(th_b)[..., None, :]
                + jnp.cos(th_a)[..., :, None] * jnp.sin(th_b)[..., None, :]
                ).reshape(1, 2, n)
        t = np.linspace(0.0, dur, n, endpoint=False).astype(np.float32)
        direct = np.sin(2.0 * np.pi * np.asarray(freqs)[..., None] * t
                        + np.asarray(phase)[..., None])
        np.testing.assert_allclose(np.asarray(bank), direct, atol=5e-4)
