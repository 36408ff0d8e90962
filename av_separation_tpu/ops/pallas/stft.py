"""Fused STFT-magnitude Pallas TPU kernel.

One kernel fuses the whole spectral front-end that the reference runs as a
host-side Python loop (reference dataset.py:122-135): overlapping framing,
Hann windowing, rDFT and magnitude.  Per grid step it

  1. DMAs the raw audio span covering a tile of frames from HBM into VMEM
     (frames overlap because hop < n_fft, so this is a manual `pl.ds` copy,
     not a BlockSpec — each sample is fetched once per tile instead of
     n_fft/hop times);
  2. slides the window inside VMEM to build the (tile_T, n_fft) frame matrix;
  3. hits the MXU twice with the precomputed windowed cos/sin rDFT bases
     (n_fft x freq_pad) and fuses the magnitude on the VPU.

Output is (B, T_pad, F_pad); the wrapper slices/transposes to the reference's
(B, freq_bins, T) layout.  Numerics match ops/stft.py's XLA path (gated in
tests/test_kernels.py) which itself matches the reference NumPy STFT.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from av_separation_tpu.ops.stft import dft_basis


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _stft_kernel(audio_ref, cos_ref, sin_ref, out_ref, frames,
                 *, hop: int, n_fft: int, tile_t: int):
    # audio_ref: (1, N_pad) — one signal's full row, DMA'd to VMEM by the
    # BlockSpec pipeline (a few hundred KB for realistic utterances).
    t = pl.program_id(1)
    base = t * tile_t * hop

    def fill_row(i, _):
        frames[pl.ds(i, 1), :] = audio_ref[0, :, pl.ds(base + i * hop,
                                                       n_fft)]
        return 0

    jax.lax.fori_loop(0, tile_t, fill_row, 0)

    f = frames[:]
    # HIGHEST precision: the DFT runs once per utterance (data prep), and
    # full-f32 accuracy keeps the on-device spectra close to the reference's
    # float64 rfft (bf16 MXU passes would cost ~2e-3 relative error).
    re = jnp.dot(f, cos_ref[:], preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    im = jnp.dot(f, sin_ref[:], preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    out_ref[0] = jnp.sqrt(re * re + im * im).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "num_frames"))
def stft_magnitude_pallas(audio: jnp.ndarray, n_fft: int, hop: int,
                          num_frames: int | None = None) -> jnp.ndarray:
    """audio (..., N) -> magnitude (..., freq_bins, T); reference STFT
    semantics (symmetric Hann, no centering, zero-padded tail)."""
    if num_frames is None:
        num_frames = 1 + audio.shape[-1] // hop
    lead = audio.shape[:-1]
    n = audio.shape[-1]
    b = int(np.prod(lead)) if lead else 1
    flat = audio.reshape(b, n).astype(jnp.float32)

    freq_bins = n_fft // 2 + 1
    f_pad = _cdiv(freq_bins, 128) * 128
    tile_t = min(64, _cdiv(num_frames, 8) * 8)
    nt = _cdiv(num_frames, tile_t)
    t_pad = nt * tile_t

    # Pad audio so the last tile's frames are in range (covers both the
    # reference's zero-padded tail frames and tile rounding), and to a lane
    # multiple for the VMEM block.
    need = (t_pad - 1) * hop + n_fft
    n_pad = _cdiv(max(need, n), 128) * 128
    flat = jnp.pad(flat, ((0, 0), (0, n_pad - n)))
    # (B, 1, N): keeps the VMEM row block's trailing two dims equal to the
    # array dims, satisfying Mosaic's block-shape tiling rule.
    flat = flat[:, None, :]

    cos_np, sin_np = dft_basis(n_fft)
    pad_cols = ((0, 0), (0, f_pad - freq_bins))
    cos_p = jnp.asarray(np.pad(cos_np, pad_cols))
    sin_p = jnp.asarray(np.pad(sin_np, pad_cols))

    out = pl.pallas_call(
        functools.partial(_stft_kernel, hop=hop, n_fft=n_fft,
                          tile_t=tile_t),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, 1, n_pad), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),  # one signal row
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cos basis
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sin basis
        ],
        out_specs=pl.BlockSpec((1, tile_t, f_pad),
                               lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, f_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_t, n_fft), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(flat, cos_p, sin_p)

    out = out[:, :num_frames, :freq_bins]
    out = jnp.swapaxes(out, -1, -2)  # (B, F, T)
    return out.reshape(*lead, freq_bins, num_frames)
