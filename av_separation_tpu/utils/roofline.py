"""Analytic FLOP accounting and roofline reporting.

The reference has no performance tooling at all (SURVEY.md §5); this module
prices a training step analytically from the config so bench.py can report
achieved FLOP/s against the chip's peak — the "speed-of-light" yardstick for
kernel work.

Counts matmul/conv MACs only (elementwise work is noise next to them) and
uses the standard fwd+bwd = 3x fwd multiplier.
"""

from __future__ import annotations

from av_separation_tpu.config import ExperimentConfig

# Per-chip peak FLOP/s (dense). TPU v5e: ~197 TFLOP/s bf16; f32 runs as
# multi-pass bf16 on the MXU at roughly 1/4 of that.
PEAK_FLOPS = {
    "tpu_v5e_bfloat16": 197e12,
    "tpu_v5e_float32": 49e12,
}


def model_forward_flops(cfg: ExperimentConfig) -> float:
    """Forward-pass FLOPs for ONE sample (batch=1)."""
    m, d_cfg = cfg.model, cfg.data
    t = d_cfg.num_stft_frames
    n = d_cfg.total_lip_frames
    f = m.freq_bins
    d = m.d_model
    s = m.num_speakers

    def attn_block(seq_q, seq_kv):
        """MACs of one pre-norm attention block: q/out projections run over
        seq_q rows, k/v over seq_kv rows, QK^T + PV score matmuls, and the
        4*d FFN.  Doubled at the end for MAC -> FLOP."""
        proj = 2 * seq_q * d * d        # q and out projections
        kv = 2 * seq_kv * d * d         # k and v projections
        scores = 2 * seq_q * seq_kv * d  # QK^T + PV
        ffn = 2 * seq_q * d * 4 * d     # up + down
        return 2 * (proj + kv + scores + ffn)

    total = 0.0
    # Audio input projection: two k=3 convs.
    total += 2 * 3 * t * (f * d + d * d)
    # Audio transformer.
    total += m.num_encoder_layers * attn_block(t, t)
    # Visual conv stem per frame (stride-2 convs, k=3).
    h, w = d_cfg.frame_h, d_cfg.frame_w
    stem = (h // 2) * (w // 2) * 9 * 1 * 32 \
        + (h // 4) * (w // 4) * 9 * 32 * 64 \
        + (h // 8) * (w // 8) * 9 * 64 * 128
    total += 2 * n * stem
    total += 2 * n * 128 * d  # frame projection
    # Visual transformer over N frames.
    total += m.num_encoder_layers * attn_block(n, n)
    # Fusion: audio queries over the T-resampled visual stream.
    total += m.num_fusion_layers * attn_block(t, t)
    # Decoder MLP.
    total += 2 * t * (d * 2 * d + 2 * d * f * s)
    return total


def data_gen_flops(cfg: ExperimentConfig) -> float:
    """On-device synthetic generation: (S+1) STFTs as matmul-DFTs."""
    d_cfg = cfg.data
    t = d_cfg.num_stft_frames
    return 2 * (d_cfg.num_speakers + 1) * t * d_cfg.n_fft \
        * d_cfg.freq_bins * 2


def train_step_flops(cfg: ExperimentConfig, batch_size: int,
                     include_data_gen: bool = True) -> float:
    """Total FLOPs for one fwd+bwd+update step at `batch_size`."""
    per_sample = 3.0 * model_forward_flops(cfg)  # fwd + bwd
    if include_data_gen:
        per_sample += data_gen_flops(cfg)
    return per_sample * batch_size


def pct_of_peak(flops_per_s: float, dtype: str = "float32",
                chip: str = "tpu_v5e") -> float:
    peak = PEAK_FLOPS.get(f"{chip}_{dtype}")
    if not peak:
        return 0.0
    return 100.0 * flops_per_s / peak
