"""Native C++ data-engine tests (builds native/avsep_native.cpp on demand)."""

import numpy as np
import pytest

from av_separation_tpu.config import DataConfig
from av_separation_tpu.data.synthetic import SyntheticAVDataset

native = pytest.importorskip("av_separation_tpu.data.native_loader")


@pytest.fixture(scope="module")
def lib_ok():
    try:
        native.load_library()
    except native.NativeUnavailable as e:
        pytest.skip(f"native engine unavailable: {e}")


SMALL = DataConfig(num_samples=100, sample_rate=2048, duration=1.0,
                   n_fft=128, hop_length=64, num_frames=5,
                   frame_h=16, frame_w=16)


class TestNativeGenerator:
    def test_shapes_and_ranges(self, lib_ok):
        out = native.generate_range(SMALL, 0, 6)
        assert out["mixed_spec"].shape == (6, 65, 33)
        assert out["lip_frames"].shape == (6, 10, 16, 16)
        assert out["clean_specs"].shape == (6, 2, 65, 33)
        assert np.isfinite(out["mixed_spec"]).all()
        assert out["lip_frames"].min() >= 0.0
        assert out["lip_frames"].max() <= 1.0

    def test_per_index_deterministic(self, lib_ok):
        a = native.generate_range(SMALL, 5, 4)
        b = native.generate_range(SMALL, 5, 4)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])

    def test_index_range_consistency(self, lib_ok):
        # Sample 7 must be identical whether generated in [0,10) or [7,8).
        wide = native.generate_range(SMALL, 0, 10)
        single = native.generate_range(SMALL, 7, 1)
        for k in wide:
            np.testing.assert_array_equal(wide[k][7], single[k][0])

    def test_stft_matches_reference_semantics(self, lib_ok):
        """The native FFT must equal the reference's NumPy STFT on the same
        waveform: reconstruct the native sample's sine parameters is
        impractical, so instead check spectra statistics + mixture
        consistency: mixed spectrum has peaks where clean spectra do."""
        out = native.generate_range(SMALL, 0, 4)
        clean = out["clean_specs"]
        for b in range(4):
            for s in range(2):
                prof = clean[b, s].sum(axis=1)
                assert prof.argmax() > 0
                assert prof.max() > 5 * np.median(prof + 1e-6)

    def test_distribution_matches_host_generator(self, lib_ok):
        host = SyntheticAVDataset(SMALL)
        host_e = np.mean([np.square(host[i]["mixed_spec"]).mean()
                          for i in range(64)])
        nat = native.generate_range(SMALL, 0, 64)
        nat_e = float(np.square(nat["mixed_spec"]).mean())
        assert abs(nat_e - host_e) / host_e < 0.2

    def test_batch_iterator_recycles_buffers(self, lib_ok):
        it = native.NativeBatchIterator(SMALL, 4)
        b1 = next(it)
        m1 = b1["mixed_spec"].copy()
        b2 = next(it)
        assert not np.array_equal(m1, b2["mixed_spec"])
        b3 = next(it)  # slot 0 again — data must be fresh
        assert not np.array_equal(m1, b3["mixed_spec"])

    def test_non_power_of_two_nfft_rejected(self, lib_ok):
        cfg = DataConfig(num_samples=10, sample_rate=2048, duration=1.0,
                         n_fft=96, hop_length=64, num_frames=5,
                         frame_h=16, frame_w=16)
        with pytest.raises(native.NativeUnavailable):
            native.generate_range(cfg, 0, 2)
