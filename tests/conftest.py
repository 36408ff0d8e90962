"""Test harness configuration.

All unit tests run on the CPU backend with 8 virtual devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8) so that:
  - multi-device mesh/sharding tests run without TPU hardware (the pattern
    the reference entirely lacks — it has no distributed tests at all,
    SURVEY.md §4);
  - numerical parity tests against the committed reference goldens see
    full-precision float32 matmuls (the TPU MXU's bf16 passes would add
    ~1e-3 noise).

Pallas kernels run in interpreter mode on CPU (see tests/test_kernels.py);
they are additionally exercised compiled on real TPU by bench.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

# Small shapes mirroring the reference test constants
# (reference tests/test_model.py:29-36).
FREQ_BINS = 65
T = 32
D_MODEL = 64
NHEAD = 4
BATCH = 2
NUM_FRAMES = 10
H = W = 16
NUM_SPEAKERS = 2


@pytest.fixture(scope="session")
def small_cfg():
    from av_separation_tpu.config import ModelConfig
    return ModelConfig(freq_bins=FREQ_BINS, d_model=D_MODEL, nhead=NHEAD,
                       num_encoder_layers=2, num_fusion_layers=2,
                       num_speakers=NUM_SPEAKERS, dropout=0.1)


@pytest.fixture()
def audio_batch():
    rng = np.random.default_rng(0)
    return rng.normal(size=(BATCH, FREQ_BINS, T)).astype(np.float32)


@pytest.fixture()
def visual_batch():
    rng = np.random.default_rng(1)
    return rng.normal(size=(BATCH, NUM_FRAMES, H, W)).astype(np.float32)


@pytest.fixture(scope="session")
def golden_model():
    return np.load(os.path.join(GOLDEN_DIR, "golden_model.npz"))


@pytest.fixture(scope="session")
def golden_dataset():
    return np.load(os.path.join(GOLDEN_DIR, "golden_dataset.npz"))


@pytest.fixture(scope="session")
def golden_loss():
    return np.load(os.path.join(GOLDEN_DIR, "golden_loss.npz"))
