"""The four model components and the end-to-end AVSeparationTransformer.

Behavioral contract mirrors the reference (reference model.py:22-301):

  AudioEncoder      (B, F, T)    -> (B, T, d)   conv1d stack + pre-norm transformer
  VisualEncoder     (B, N, H, W) -> (B, T, d)   per-frame conv2d + transformer + resample
  CrossModalFusion  audio x visual -> (B, T, d) audio-query / visual-KV cross-attention
  SeparationDecoder (B, T, d)    -> masks (B, S, F, T) in [0, 1]

but the implementation is TPU-first: channels-last layouts throughout (XLA's
preferred conv/matmul layout), per-frame visual conv folded into the batch
dimension so the MXU sees one large conv, on-the-fly positional encodings, and
kernel implementation switches (`attn_impl`, `decoder_impl`) that swap fused
Pallas kernels into the hot paths.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from av_separation_tpu.ops.activations import gelu_dropout
from av_separation_tpu.ops.activations import relu as relu_saveout
from av_separation_tpu.config import ModelConfig
from av_separation_tpu.models.layers import (
    MultiHeadAttention,
    PositionalEncoding,
    TorchBatchNorm,
    TransformerEncoder,
    dense,
    torch_bias_init,
    torch_linear_kernel_init,
)
from av_separation_tpu.ops.interpolate import interpolate_time_linear


def _cdt(cfg: ModelConfig):
    """Computation dtype for flax modules: None keeps pure float32."""
    return None if cfg.compute_dtype == "float32" else cfg.compute_dtype


def _resolve_fused_impl(impl: str, seq_len: int) -> str:
    """Trace-time resolution of the 'auto' selector for the fused Pallas
    projection/decoder kernels — delegates to ops/policy.py, the single
    owner of the measured FUSED_MIN_SEQ crossover."""
    from av_separation_tpu.ops.policy import resolve_fused
    return resolve_fused(impl, seq_len)


def _seq_constraint(x: jnp.ndarray, time_axis: int) -> jnp.ndarray:
    """Pin a tensor's time axis to the 'seq' mesh axis (sequence
    parallelism, SURVEY §2.4 SP row).  No-op unless the active mesh has a
    non-trivial 'seq' axis that divides the time dim; GSPMD propagates the
    T-sharded layout to every op between the constrained points and inserts
    the halo/gather collectives."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from av_separation_tpu.ops import policy
    mesh = policy.active_mesh()
    if mesh is None:
        return x
    n_seq = policy.mesh_axis_size(mesh, "seq")
    if n_seq <= 1 or x.shape[time_axis] % n_seq:
        return x
    spec = [None] * x.ndim
    spec[0] = ("data", "fsdp")
    spec[time_axis] = "seq"
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))


def _conv(features: int, kernel, strides, padding, name: str,
          dtype=None) -> nn.Conv:
    return nn.Conv(features, kernel, strides=strides, padding=padding,
                   name=name, dtype=dtype,
                   kernel_init=torch_linear_kernel_init,
                   bias_init=torch_bias_init(0))


class _Conv1dParams(nn.Module):
    """Raw k=3 conv1d kernel+bias holder (flax layout (3, C_in, C_out)),
    shared by the XLA lowering and the fused Pallas projection kernel."""

    in_features: int
    out_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", torch_linear_kernel_init,
                            (3, self.in_features, self.out_features))
        bias = self.param("bias", torch_bias_init(3 * self.in_features),
                          (self.out_features,))
        return kernel, bias


class AudioEncoder(nn.Module):
    """Mixed-spectrogram encoder (reference model.py:22-60).

    Input (B, freq_bins, T) -> output (B, T, d_model).  The two k=3 conv1d
    projections run in (B, T, C) channels-last layout; with C in
    {freq_bins, d_model} these are T x C x d matmuls on the MXU.  With
    `proj_impl='pallas'` both convs + ReLUs fuse into one VMEM kernel
    (ops/pallas/audio_proj.py).
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True):
        cfg = self.cfg
        h = jnp.swapaxes(x, -1, -2)  # (B, T, F): time-major, channels last
        w1, b1 = _Conv1dParams(cfg.freq_bins, cfg.d_model, name="conv1")()
        w2, b2 = _Conv1dParams(cfg.d_model, cfg.d_model, name="conv2")()
        if _resolve_fused_impl(cfg.proj_impl, h.shape[1]) == "pallas":
            from av_separation_tpu.ops.pallas.audio_proj import (
                fused_audio_projection)
            h = fused_audio_projection(h, w1, b1, w2, b2)
        else:
            for w, bias in ((w1, b1), (w2, b2)):
                h = jax.lax.conv_general_dilated(
                    h, w.astype(h.dtype), window_strides=(1,),
                    padding=[(1, 1)],
                    dimension_numbers=("NWC", "WIO", "NWC"))
                h = relu_saveout(h + bias.astype(h.dtype))
        h = _seq_constraint(h, 1)
        h = PositionalEncoding(cfg.d_model, cfg.dropout, name="pos_enc")(
            h, deterministic=deterministic)
        h = TransformerEncoder(cfg.d_model, cfg.nhead, cfg.num_encoder_layers,
                               cfg.dropout, cfg.attn_impl, cfg.remat,
                               _cdt(cfg),
                               name="transformer")(h, deterministic=deterministic)
        return h


class _Conv2dParams(nn.Module):
    """Raw 3x3 conv kernel+bias holder with the SAME param names, shapes
    and initializers as the `nn.Conv` the XLA stem path creates — so the
    s2d stem path reads the identical parameter tree (reference torch
    weights transplant into either path)."""

    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", torch_linear_kernel_init,
                            (3, 3, self.cin, self.cout))
        bias = self.param("bias", torch_bias_init(0), (self.cout,))
        return kernel, bias


class VisualEncoder(nn.Module):
    """Lip-frame encoder (reference model.py:67-117).

    Input (B, N, H, W) grayscale frames -> (B, target_len, d_model).

    All B*N frames are folded into one batch for the conv stem (stride-2 conv
    + BN + ReLU x3, channels 1->32->64->128, then global average pool), so the
    small spatial convs batch into MXU-sized work.  `stem_impl` selects the
    stem lowering ('xla' conv emitter or the 's2d' space-to-depth
    restructure), resolved through ops/policy.py — three alternatives were
    built and measured against the XLA emitter on v5e (Pallas v1/v2, s2d);
    all lost and 'auto' stays 'xla' (evidence: bench_results/stem_ab.jsonl,
    docs/kernels.md).  The frame sequence then runs through a pre-norm
    transformer and is linearly resampled to the audio frame rate with
    exact `F.interpolate(align_corners=False)` semantics.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, frames: jnp.ndarray, target_len: int, *,
                 deterministic: bool = True):
        from av_separation_tpu.ops.policy import resolve_stem
        cfg = self.cfg
        b, n, h_dim, w_dim = frames.shape
        x = frames.reshape(b * n, h_dim, w_dim, 1)
        stem = resolve_stem(cfg.stem_impl, h_dim, w_dim)
        if stem == "s2d":
            # Space-to-depth restructure (ops/s2d_stem.py): each stride-2
            # 3x3 conv runs as an exactly-equivalent stride-1 2x2 conv
            # over the S2D input — MXU-deep contractions and a dense
            # (no zero-stuffing) backward pair.  Same parameter tree as
            # the other paths (checkpoints transplant across impls).
            from av_separation_tpu.ops.s2d_stem import conv3x3s2_s2d
            dt = _cdt(cfg)
            for i, (ci, co) in enumerate(((1, 32), (32, 64), (64, 128))):
                w, cb = _Conv2dParams(ci, co, name=f"conv{i + 1}")()
                if dt is not None:
                    x, w, cb = x.astype(dt), w.astype(dt), cb.astype(dt)
                x = conv3x3s2_s2d(x, w) + cb
                x = TorchBatchNorm(co, name=f"bn{i + 1}")(
                    x, use_running_average=deterministic)
                x = relu_saveout(x)
            x = jnp.mean(x, axis=(1, 2))
        else:
            for i, ch in enumerate((32, 64, 128)):
                x = _conv(ch, (3, 3), (2, 2), [(1, 1), (1, 1)],
                          f"conv{i + 1}", _cdt(cfg))(x)
                x = TorchBatchNorm(ch, name=f"bn{i + 1}")(
                    x, use_running_average=deterministic)
                x = relu_saveout(x)
            x = jnp.mean(x, axis=(1, 2))  # global avg pool -> (B*N, 128)
        x = dense(cfg.d_model, 128, "frame_proj", _cdt(cfg))(x)
        x = x.reshape(b, n, cfg.d_model)

        x = PositionalEncoding(cfg.d_model, cfg.dropout, name="pos_enc")(
            x, deterministic=deterministic)
        x = TransformerEncoder(cfg.d_model, cfg.nhead, cfg.num_encoder_layers,
                               cfg.dropout, cfg.attn_impl, cfg.remat,
                               _cdt(cfg),
                               name="transformer")(x, deterministic=deterministic)
        return interpolate_time_linear(x, target_len)


class CrossAttentionLayer(nn.Module):
    """Pre-norm cross-attention block (reference model.py:152-173).

    Queries come from `norm1(audio)`; keys/values from the *raw* visual stream
    (the reference deliberately does not normalize the KV input).
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, audio, visual, deterministic: bool = True):
        from av_separation_tpu.ops.dropout import Dropout as FastDropout
        cfg = self.cfg
        drop = lambda name: FastDropout(cfg.dropout, name=name)
        dt = _cdt(cfg)
        normed = nn.LayerNorm(epsilon=1e-5, name="norm1", dtype=dt)(audio)
        attn = MultiHeadAttention(cfg.d_model, cfg.nhead, cfg.dropout,
                                  cfg.attn_impl, dt, name="cross_attn")(
            normed, visual, deterministic=deterministic)
        audio = audio + drop("drop1")(attn, deterministic=deterministic)

        h = nn.LayerNorm(epsilon=1e-5, name="norm2", dtype=dt)(audio)
        h = dense(4 * cfg.d_model, cfg.d_model, "ff1", dt)(h)
        # Fused gelu+dropout: saves the pre-activation only and recomputes
        # the erf GELU + uint8 keep mask in backward (ops/activations.py) —
        # same rng draw order as the unfused gelu + FastDropout("drop_ff").
        rate = 0.0 if deterministic else cfg.dropout
        ff_rng = self.make_rng("dropout") if rate > 0.0 else None
        h = gelu_dropout(h, rate, ff_rng)
        h = dense(cfg.d_model, 4 * cfg.d_model, "ff2", dt)(h)
        audio = audio + drop("drop2")(h, deterministic=deterministic)
        return audio


class CrossModalFusion(nn.Module):
    """Stack of cross-attention layers + final LayerNorm
    (reference model.py:124-149)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, audio, visual, *, deterministic: bool = True):
        layer_cls = CrossAttentionLayer
        if self.cfg.remat:
            # deterministic positional (argnum 3) => static under remat.
            layer_cls = nn.remat(CrossAttentionLayer, static_argnums=(3,))
        h = audio
        for i in range(self.cfg.num_fusion_layers):
            h = layer_cls(self.cfg, name=f"layer_{i}")(
                h, visual, deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(h)


class _LinearParams(nn.Module):
    """Raw kernel+bias parameter holder; lets the decoder share one set of
    weights between the XLA lowering and the fused Pallas kernel."""

    in_features: int
    out_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", torch_linear_kernel_init,
                            (self.in_features, self.out_features))
        bias = self.param("bias", torch_bias_init(self.in_features),
                          (self.out_features,))
        return kernel, bias


class SeparationDecoder(nn.Module):
    """Per-speaker soft mask head (reference model.py:180-220).

    (B, T, d) -> masks (B, S, F, T) via Linear(d->2d) + GELU + Linear(2d->F*S)
    + sigmoid.  With `decoder_impl='pallas'` the MLP+sigmoid+mask-apply chain
    runs as one fused Pallas kernel (ops/pallas/decoder.py); the Pallas path
    carries no inner dropout, so training with dropout falls back to XLA.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, fused: jnp.ndarray, *, deterministic: bool = True,
                 mixed_spec: jnp.ndarray | None = None):
        cfg = self.cfg
        b, t, _ = fused.shape
        w1, b1 = _LinearParams(cfg.d_model, 2 * cfg.d_model, name="fc1")()
        w2, b2 = _LinearParams(2 * cfg.d_model,
                               cfg.freq_bins * cfg.num_speakers,
                               name="fc2")()

        use_pallas = (_resolve_fused_impl(cfg.decoder_impl, t) == "pallas"
                      and mixed_spec is not None
                      and (deterministic or cfg.dropout == 0.0))
        if use_pallas:
            from av_separation_tpu.ops.pallas.decoder import (
                fused_mask_decoder)
            separated, masks = fused_mask_decoder(
                fused, w1, b1, w2, b2, mixed_spec,
                cfg.num_speakers, cfg.freq_bins)
            return separated, masks

        h = jnp.einsum("btd,dh->bth", fused, w1) + b1
        # Fused gelu+dropout (ops/activations.py): one residual tensor,
        # erf+mask recomputed in backward — same draw position as the
        # unfused FastDropout("drop") it replaces.
        rate = 0.0 if deterministic else cfg.dropout
        rng = self.make_rng("dropout") if rate > 0.0 else None
        h = gelu_dropout(h, rate, rng)
        h = jnp.einsum("bth,ho->bto", h, w2) + b2
        masks = h.reshape(b, t, cfg.num_speakers, cfg.freq_bins)
        masks = masks.transpose(0, 2, 3, 1)  # (B, S, F, T)
        masks = jax.nn.sigmoid(masks)
        if mixed_spec is None:
            return masks
        return self.separate(masks, mixed_spec), masks

    @staticmethod
    def separate(masks: jnp.ndarray, mixed_spec: jnp.ndarray) -> jnp.ndarray:
        """masks (B, S, F, T) * mixed (B, F, T) -> (B, S, F, T)."""
        return masks * mixed_spec[:, None, :, :]


class AVSeparationTransformer(nn.Module):
    """End-to-end audio-visual separation model (reference model.py:227-276).

    __call__(mixed_spec (B,F,T), lip_frames (B,N,H,W)) ->
        (separated (B,S,F,T), masks (B,S,F,T))
    """

    cfg: ModelConfig

    def setup(self):
        self.audio_encoder = AudioEncoder(self.cfg)
        self.visual_encoder = VisualEncoder(self.cfg)
        self.fusion = CrossModalFusion(self.cfg)
        self.decoder = SeparationDecoder(self.cfg)

    def __call__(self, mixed_spec: jnp.ndarray, lip_frames: jnp.ndarray, *,
                 deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        t = mixed_spec.shape[-1]
        dtype = jnp.dtype(self.cfg.compute_dtype)
        mixed_c = mixed_spec.astype(dtype)
        audio_emb = self.audio_encoder(mixed_c, deterministic=deterministic)
        visual_emb = self.visual_encoder(lip_frames.astype(dtype), t,
                                         deterministic=deterministic)
        # Sequence parallelism: keep the audio-rate time axis sharded over
        # 'seq' through fusion and the decoder (no-op on seq=1 meshes).
        visual_emb = _seq_constraint(visual_emb, 1)
        fused = self.fusion(audio_emb, visual_emb, deterministic=deterministic)
        fused = _seq_constraint(fused, 1)
        separated, masks = self.decoder(
            fused.astype(jnp.float32), deterministic=deterministic,
            mixed_spec=mixed_spec)
        return separated.astype(jnp.float32), masks.astype(jnp.float32)
