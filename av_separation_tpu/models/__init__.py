from av_separation_tpu.models.model import (
    AudioEncoder,
    AVSeparationTransformer,
    CrossAttentionLayer,
    CrossModalFusion,
    SeparationDecoder,
    VisualEncoder,
)
from av_separation_tpu.models.layers import (
    MultiHeadAttention,
    PositionalEncoding,
    TorchBatchNorm,
    TransformerEncoder,
    TransformerEncoderLayer,
    sinusoidal_pe,
)
