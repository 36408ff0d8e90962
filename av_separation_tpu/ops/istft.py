"""Audio-domain reconstruction: complex STFT, masked iSTFT, waveform SI-SNR.

The reference stops at magnitude masks — `SeparationDecoder.separate`
multiplies masks against the magnitude spectrogram and the demo evaluates SNR
in the spectrogram domain (reference model.py:210-220, demo.py:24-80).  It
never reconstructs audio.  This module closes that gap TPU-natively:

  - ``stft_complex``       : the reference-semantics STFT (symmetric Hann,
                             no centering, frames at ``i*hop`` — reference
                             dataset.py:122-135) returning real/imag parts,
                             formulated as windowed matmul-DFT on the MXU.
  - ``istft_overlap_add``  : least-squares inverse STFT (Griffin & Lim
                             LSEE-MSTFT): matmul-irDFT per frame, synthesis
                             window = analysis window, overlap-add divided by
                             the summed squared window.  Static scatter-add
                             indices, fully jittable.
  - ``masked_istft``       : per-speaker waveforms from soft masks applied to
                             the complex mixture STFT — masked magnitude with
                             the *mixture phase* (masks are non-negative, so
                             scaling the complex bins preserves phase).
  - ``si_snr_waveform``    : standard waveform-domain SI-SNR (zero-mean,
                             scale-projected), plus a best-permutation
                             variant mirroring utils/metrics.permutation_snr.

All FLOPs are (T, n_fft) x (n_fft, F) class matmuls — MXU-shaped once the
batch/speaker axes are folded in — and the overlap-add is one static
``.at[idx].add`` scatter that XLA lowers without dynamic shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from av_separation_tpu.ops.stft import dft_basis, frame_signal, hann_symmetric


@functools.lru_cache(maxsize=8)
def irdft_basis(n_fft: int, dtype: str = "float32"):
    """Inverse-rDFT basis matrices (freq_bins, n_fft), NumPy (cache-safe).

    For even n_fft and a real signal, the inverse of ``rfft`` is

        x[n] = (1/N) * [ X_0
                         + 2 * sum_{k=1}^{N/2-1} (Re X_k cos(2pi k n / N)
                                                  - Im X_k sin(2pi k n / N))
                         + X_{N/2} * cos(pi n) ]

    so frames = re @ C + im @ S with C[k,n] = c_k/N cos(...),
    S[k,n] = -c_k/N sin(...), c_k = 1 for k in {0, N/2} else 2.
    """
    freq_bins = n_fft // 2 + 1
    k = np.arange(freq_bins)[:, None].astype(np.float64)
    n = np.arange(n_fft)[None, :].astype(np.float64)
    ang = 2.0 * np.pi * k * n / n_fft
    coef = np.full((freq_bins, 1), 2.0 / n_fft)
    coef[0, 0] = 1.0 / n_fft
    if n_fft % 2 == 0:
        coef[-1, 0] = 1.0 / n_fft
    cos_b = (coef * np.cos(ang)).astype(dtype)
    sin_b = (-coef * np.sin(ang)).astype(dtype)
    return cos_b, sin_b


@functools.lru_cache(maxsize=8)
def _ola_window_norm(n_fft: int, hop: int, num_frames: int,
                     out_len: int, eps: float = 1e-12) -> np.ndarray:
    """Summed squared synthesis window over the overlap-add span (out_len,)."""
    w2 = hann_symmetric(n_fft) ** 2
    total = (num_frames - 1) * hop + n_fft
    acc = np.zeros(total, dtype=np.float64)
    for i in range(num_frames):
        acc[i * hop:i * hop + n_fft] += w2
    return np.maximum(acc[:out_len], eps).astype(np.float32)


def stft_complex(audio: jnp.ndarray, n_fft: int, hop: int,
                 num_frames: int | None = None,
                 dtype=jnp.float32):
    """Reference-semantics complex STFT -> (re, im), each (..., F, T).

    Same framing/window as ops.stft.stft_magnitude (reference
    dataset.py:122-135); magnitude == sqrt(re^2 + im^2).
    """
    if num_frames is None:
        num_frames = 1 + audio.shape[-1] // hop
    frames = frame_signal(audio, n_fft, hop, num_frames).astype(dtype)
    cos_np, sin_np = dft_basis(n_fft)
    cos_b = jnp.asarray(cos_np, dtype)
    sin_b = jnp.asarray(sin_np, dtype)
    re = jnp.einsum("...tn,nf->...tf", frames, cos_b,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    im = jnp.einsum("...tn,nf->...tf", frames, sin_b,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    return (jnp.swapaxes(re, -1, -2).astype(dtype),
            jnp.swapaxes(im, -1, -2).astype(dtype))


def istft_overlap_add(re: jnp.ndarray, im: jnp.ndarray, n_fft: int, hop: int,
                      num_audio: int) -> jnp.ndarray:
    """Least-squares iSTFT: (..., F, T) complex parts -> (..., num_audio).

    Griffin-Lim LSEE-MSTFT synthesis: each frame is inverse-rDFT'd
    (matmul), multiplied by the analysis window again, overlap-added at the
    analysis positions ``i*hop``, and normalised by the summed squared
    window.  Exact for interior samples at >=2x overlap; frame edges (first/
    last ``n_fft - hop`` samples) are least-squares approximations, as in
    every standard iSTFT.
    """
    num_frames = re.shape[-1]
    cos_np, sin_np = irdft_basis(n_fft)
    cos_b = jnp.asarray(cos_np, re.dtype)
    sin_b = jnp.asarray(sin_np, re.dtype)
    # (..., F, T) -> (..., T, F) then matmul-irDFT to (..., T, n_fft).
    re_t = jnp.swapaxes(re, -1, -2)
    im_t = jnp.swapaxes(im, -1, -2)
    frames = (
        jnp.einsum("...tf,fn->...tn", re_t, cos_b,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
        + jnp.einsum("...tf,fn->...tn", im_t, sin_b,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST))
    window = jnp.asarray(hann_symmetric(n_fft), frames.dtype)
    frames = frames * window  # synthesis window = analysis window (LSEE)
    total = (num_frames - 1) * hop + n_fft
    idx = np.arange(num_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    out = jnp.zeros(frames.shape[:-2] + (total,), frames.dtype)
    out = out.at[..., idx.reshape(-1)].add(
        frames.reshape(frames.shape[:-2] + (-1,)))
    norm = jnp.asarray(
        _ola_window_norm(n_fft, hop, num_frames, num_audio), out.dtype)
    return out[..., :num_audio] / norm


def masked_istft(masks: jnp.ndarray, mixed_audio: jnp.ndarray, n_fft: int,
                 hop: int) -> jnp.ndarray:
    """Soft masks + mixture waveform -> per-speaker waveforms.

    masks: (B, S, F, T) in [0, 1] (SeparationDecoder output contract,
    reference model.py:201-208); mixed_audio: (B, N).
    Returns (B, S, N).  The mask scales the complex mixture bins, i.e.
    masked magnitude with the mixture's phase.
    """
    num_frames = masks.shape[-1]
    re, im = stft_complex(mixed_audio, n_fft, hop, num_frames,
                          dtype=masks.dtype)
    est_re = masks * re[:, None]
    est_im = masks * im[:, None]
    return istft_overlap_add(est_re, est_im, n_fft, hop,
                             mixed_audio.shape[-1])


def si_snr_waveform(estimate: jnp.ndarray, target: jnp.ndarray,
                    eps: float = 1e-8) -> jnp.ndarray:
    """Waveform-domain scale-invariant SNR in dB over the last axis.

    Standard definition (zero-mean both, project estimate onto target):
    works on any leading batch shape; returns (...,) per-item dB.
    """
    estimate = estimate - jnp.mean(estimate, axis=-1, keepdims=True)
    target = target - jnp.mean(target, axis=-1, keepdims=True)
    dot = jnp.sum(estimate * target, axis=-1, keepdims=True)
    energy = jnp.sum(target * target, axis=-1, keepdims=True)
    proj = dot / (energy + eps) * target
    noise = estimate - proj
    ratio = (jnp.sum(proj * proj, axis=-1)
             / (jnp.sum(noise * noise, axis=-1) + eps))
    return 10.0 * jnp.log10(ratio + eps)


def permutation_si_snr_waveform(estimates: jnp.ndarray,
                                targets: jnp.ndarray) -> jnp.ndarray:
    """Best-permutation mean waveform SI-SNR per sample.

    estimates/targets: (B, S, N) -> (B,).  Waveform-domain analogue of
    utils.metrics.permutation_snr (reference demo.py:67-80 pattern).
    """
    from av_separation_tpu.losses import permutation_table

    s = estimates.shape[1]
    perms = jnp.asarray(permutation_table(s))

    def for_perm(perm):
        return jnp.mean(si_snr_waveform(jnp.take(estimates, perm, axis=1),
                                        targets), axis=-1)  # (B,)

    return jnp.max(jax.vmap(for_perm)(perms), axis=0)
