"""av_separation_tpu — TPU-native audio-visual speech separation framework.

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of the
reference danieleschmidt/AV-Separation-Transformer (see SURVEY.md).  Public
API mirrors the reference's six exported symbols
(reference src/av_separation/__init__.py:15-22) plus the loss functions, and
adds the framework tiers the reference lacks: configs, mesh/sharding, Pallas
kernels, train/eval drivers, checkpointing and benchmarking.
"""

from av_separation_tpu.config import (
    DataConfig,
    ExperimentConfig,
    LossConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
    get_config,
)
from av_separation_tpu.data.synthetic import SyntheticAVDataset
from av_separation_tpu.inference import Separator
from av_separation_tpu.losses import separation_loss, si_snr
from av_separation_tpu.ops.istft import (
    masked_istft,
    si_snr_waveform,
)
from av_separation_tpu.models.model import (
    AudioEncoder,
    AVSeparationTransformer,
    CrossModalFusion,
    SeparationDecoder,
    VisualEncoder,
)

__version__ = "0.1.0"

__all__ = [
    "AudioEncoder",
    "VisualEncoder",
    "CrossModalFusion",
    "SeparationDecoder",
    "AVSeparationTransformer",
    "SyntheticAVDataset",
    "separation_loss",
    "si_snr",
    "Separator",
    "masked_istft",
    "si_snr_waveform",
    "ModelConfig",
    "DataConfig",
    "LossConfig",
    "MeshConfig",
    "TrainConfig",
    "ExperimentConfig",
    "get_config",
]
