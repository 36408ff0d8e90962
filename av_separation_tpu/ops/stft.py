"""On-device STFT magnitude front-end, formulated as a windowed matmul-DFT.

The reference computes its STFT on the host with a hand-rolled NumPy loop
(reference dataset.py:122-135): a *symmetric* Hann window (`np.hanning`),
frames starting at ``i * hop`` with **no centering**, tail frames zero-padded,
magnitude of ``np.fft.rfft``, stacked to ``(freq_bins, T)``.

On TPU the natural formulation is a dense matmul against precomputed
windowed-DFT basis matrices, which puts the FLOPs on the MXU:

    re = frames @ (window[:, None] * cos(2*pi*n*k/N))      # (T, F)
    im = frames @ (window[:, None] * -sin(2*pi*n*k/N))     # (T, F)
    mag = sqrt(re^2 + im^2)

For n_fft=512, freq_bins=257 this is a (T, 512) x (512, 257) matmul per
signal — ideal MXU shape once batched.  Framing is an overlapping gather
(hop < n_fft), done with a static index matrix so XLA lowers it to an
efficient gather; the Pallas variant (ops/pallas/stft.py) instead slides a
window over the raw audio inside the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_symmetric(n_fft: int) -> np.ndarray:
    """Symmetric Hann window, exactly `np.hanning(n_fft)` semantics.

    NOTE: this is the *symmetric* window (denominator n_fft-1), not the
    periodic one used by librosa/torch.stft — matching the reference's
    `np.hanning` call (reference dataset.py:123).
    """
    n = np.arange(n_fft)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / (n_fft - 1))).astype(np.float64)


@functools.lru_cache(maxsize=8)
def dft_basis(n_fft: int, dtype: str = "float32"):
    """Windowed rDFT basis matrices (n_fft, freq_bins), float64 precomputed.

    Returns NumPy arrays (safe to cache across jit traces — a cached jnp
    array created inside a trace would leak the tracer).
    """
    freq_bins = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None].astype(np.float64)
    k = np.arange(freq_bins)[None, :].astype(np.float64)
    ang = 2.0 * np.pi * n * k / n_fft
    w = hann_symmetric(n_fft)[:, None]
    cos_b = (w * np.cos(ang)).astype(dtype)
    sin_b = (w * -np.sin(ang)).astype(dtype)
    return cos_b, sin_b


def frame_signal(audio: jnp.ndarray, n_fft: int, hop: int, num_frames: int):
    """Extract overlapping frames: frame i = audio[i*hop : i*hop+n_fft],
    zero-padded past the end (reference dataset.py:126-133 framing rule).

    audio: (..., N) -> frames: (..., num_frames, n_fft)

    When hop divides n_fft (the shipped configs: 512/128), frame i is the
    concatenation of n_fft//hop consecutive hop-sized chunks starting at
    chunk i — so framing is r shifted reshapes of the padded signal glued
    on the last axis.  That lowers to slices + a bitcast-concat instead of
    a (num_frames*n_fft)-index gather, which on v5e was measured 6x off
    memory bandwidth for the scaled config (fusion.5054 in the r5 step
    trace: 0.98 ms against a ~0.16 ms traffic floor).  Values are
    IDENTICAL to the gather formulation.
    """
    n_audio = audio.shape[-1]
    pad = max(0, (num_frames - 1) * hop + n_fft - n_audio)
    padded = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(0, pad)])
    if n_fft % hop == 0:
        r = n_fft // hop
        lead = audio.shape[:-1]
        segs = [
            padded[..., j * hop:(j + num_frames) * hop]
            .reshape(*lead, num_frames, hop)
            for j in range(r)
        ]
        return jnp.concatenate(segs, axis=-1)
    idx = np.arange(num_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return padded[..., idx]


def stft_magnitude(audio: jnp.ndarray, n_fft: int, hop: int,
                   num_frames: int | None = None,
                   dtype=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """STFT magnitude with the reference's exact framing/window semantics.

    audio: (..., N) float -> (..., freq_bins, T) float, T = 1 + N // hop.

    `precision` prices the DFT matmul: the default HIGHEST (6-pass bf16
    emulation of f32) keeps spectra near the reference's float64 rfft and
    is right for parity paths that run once per utterance; the on-device
    training data generator passes HIGH (3-pass, ~1e-6 rel error) because
    the DFT was 1.1 ms of every scaled train step at HIGHEST — half of
    that is pure emulation passes beyond f32-level accuracy.
    """
    if num_frames is None:
        num_frames = 1 + audio.shape[-1] // hop
    frames = frame_signal(audio, n_fft, hop, num_frames).astype(dtype)
    cos_np, sin_np = dft_basis(n_fft)
    cos_b = jnp.asarray(cos_np, dtype)
    sin_b = jnp.asarray(sin_np, dtype)
    # Batched (..., T, n_fft) @ (n_fft, F) — lands on the MXU.
    re = jnp.einsum("...tn,nf->...tf", frames, cos_b,
                    preferred_element_type=jnp.float32,
                    precision=precision)
    im = jnp.einsum("...tn,nf->...tf", frames, sin_b,
                    preferred_element_type=jnp.float32,
                    precision=precision)
    mag = jnp.sqrt(re * re + im * im)
    # (..., T, F) -> (..., F, T) to match the reference layout.
    return jnp.swapaxes(mag, -1, -2).astype(dtype)
