"""Dataset behavior contract (reference tests/test_model.py:237-290)."""

import numpy as np

from av_separation_tpu.config import DataConfig
from av_separation_tpu.data.synthetic import SyntheticAVDataset


def small_ds(**kw):
    base = dict(num_samples=10, sample_rate=2000, duration=1.0, n_fft=128,
                hop_length=64, num_frames=5, frame_h=16, frame_w=16,
                speaker_freqs=(220.0, 440.0))
    base.update(kw)
    return SyntheticAVDataset(DataConfig(**base))


class TestSyntheticAVDataset:
    def test_len(self):
        assert len(small_ds()) == 10

    def test_shapes(self):
        ds = small_ds()
        s = ds[0]
        f = 128 // 2 + 1
        t = 1 + 2000 // 64
        assert s["mixed_spec"].shape == (f, t)
        assert s["lip_frames"].shape == (2 * 5, 16, 16)
        assert s["clean_specs"].shape == (2, f, t)

    def test_lip_pixels_in_range(self):
        s = small_ds()[3]
        assert s["lip_frames"].min() >= 0.0
        assert s["lip_frames"].max() <= 1.0

    def test_per_index_determinism(self):
        ds = small_ds()
        a, b = ds[4], ds[4]
        for k in a:
            assert np.array_equal(a[k], b[k])

    def test_distinct_samples_differ(self):
        ds = small_ds()
        a, b = ds[0], ds[1]
        assert not np.array_equal(a["mixed_spec"], b["mixed_spec"])

    def test_mixture_is_sum_in_time_domain(self):
        ds = small_ds()
        audios, _ = ds.clean_audios(0)
        mixed_spec = ds[0]["mixed_spec"]
        from av_separation_tpu.data.synthetic import stft_magnitude_np
        expect = stft_magnitude_np(audios.sum(0).astype(np.float32),
                                   128, 64, ds.T)
        assert np.array_equal(mixed_spec, expect)

    def test_three_speakers(self):
        ds = small_ds(speaker_freqs=(220.0, 330.0, 440.0))
        s = ds[0]
        assert s["clean_specs"].shape[0] == 3
        assert s["lip_frames"].shape[0] == 3 * 5

    def test_materialize_matches_getitem(self):
        ds = small_ds()
        cache = ds.materialize()
        s3 = ds[3]
        for k in s3:
            assert np.array_equal(cache[k][3], s3[k])


class TestDeviceStft:
    """On-device matmul-DFT STFT vs the host NumPy reference path."""

    def test_stft_allclose(self):
        import jax.numpy as jnp
        from av_separation_tpu.data.synthetic import stft_magnitude_np
        from av_separation_tpu.ops.stft import stft_magnitude
        rng = np.random.default_rng(0)
        audio = rng.normal(size=2000).astype(np.float32)
        host = stft_magnitude_np(audio, 128, 64, 1 + 2000 // 64)
        dev = stft_magnitude(jnp.asarray(audio), 128, 64)
        np.testing.assert_allclose(np.asarray(dev), host,
                                   atol=5e-4, rtol=1e-4)

    def test_stft_batched(self):
        import jax.numpy as jnp
        from av_separation_tpu.ops.stft import stft_magnitude
        rng = np.random.default_rng(1)
        audio = rng.normal(size=(3, 2, 2000)).astype(np.float32)
        out = stft_magnitude(jnp.asarray(audio), 128, 64)
        assert out.shape == (3, 2, 65, 1 + 2000 // 64)


class TestDeviceGenerator:
    def test_shapes_and_ranges(self):
        import jax
        from av_separation_tpu.data.device_synthetic import generate_batch
        cfg = DataConfig(num_samples=8, sample_rate=2000, duration=1.0,
                         n_fft=128, hop_length=64, num_frames=5,
                         frame_h=16, frame_w=16)
        batch = generate_batch(jax.random.PRNGKey(0), cfg, 4)
        assert batch["mixed_spec"].shape == (4, 65, 32)
        assert batch["lip_frames"].shape == (4, 10, 16, 16)
        assert batch["clean_specs"].shape == (4, 2, 65, 32)
        lips = np.asarray(batch["lip_frames"])
        assert lips.min() >= 0.0 and lips.max() <= 1.0

    def test_distribution_matches_host(self):
        """Spectral energy statistics should match the host generator's."""
        import jax
        from av_separation_tpu.data.device_synthetic import generate_batch
        cfg = DataConfig(num_samples=64, sample_rate=2000, duration=1.0,
                         n_fft=128, hop_length=64, num_frames=5,
                         frame_h=16, frame_w=16)
        host = SyntheticAVDataset(cfg)
        host_energy = np.mean([np.square(host[i]["mixed_spec"]).mean()
                               for i in range(64)])
        dev = generate_batch(jax.random.PRNGKey(0), cfg, 64)
        dev_energy = float(np.square(np.asarray(dev["mixed_spec"])).mean())
        assert abs(dev_energy - host_energy) / host_energy < 0.15

    def test_mixture_is_sum_of_sines(self):
        import jax
        from av_separation_tpu.data.device_synthetic import generate_batch
        cfg = DataConfig(num_samples=8, sample_rate=2000, duration=1.0,
                         n_fft=128, hop_length=64, num_frames=5,
                         frame_h=16, frame_w=16)
        b = generate_batch(jax.random.PRNGKey(1), cfg, 2)
        # Mixed spectrogram energy >= each clean's (triangle-ish check) and
        # clean specs each show a single dominant frequency band.
        clean = np.asarray(b["clean_specs"])
        for s in range(2):
            prof = clean[0, s].sum(axis=1)
            peak = prof.argmax()
            assert prof[peak] > 5 * np.median(prof + 1e-6)
