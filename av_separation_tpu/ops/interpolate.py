"""Linear time-resampling of the visual stream to the audio frame rate.

Matches `torch.nn.functional.interpolate(mode='linear', align_corners=False)`
semantics exactly (reference model.py:113-116): for output index ``i`` the
source coordinate is ``(i + 0.5) * (N_in / N_out) - 0.5``, clamped at the left
edge, linearly blended between ``floor`` and ``floor+1`` (right-clamped).

Because ``N_in`` and ``N_out`` are static under jit, the gather indices and
blend weights are computed at trace time as constants — XLA lowers this to two
static gathers plus a fused multiply-add, which is bandwidth-optimal.  On a
sequence-sharded mesh the gather crosses shard boundaries only at the (at most
one) halo frame, which XLA resolves with a minimal collective-permute.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def interpolate_time_linear(x: jnp.ndarray, target_len: int) -> jnp.ndarray:
    """Resample (..., N, d) -> (..., target_len, d) along axis -2.

    Exact `F.interpolate(mode='linear', align_corners=False)` boundary
    behavior, including the asymmetric clamping at the edges.
    """
    n_in = x.shape[-2]
    if n_in == target_len:
        return x
    scale = n_in / target_len
    src = (np.arange(target_len, dtype=np.float64) + 0.5) * scale - 0.5
    # Left clamp (torch clamps negative source coords to 0 with weight 0).
    src = np.maximum(src, 0.0)
    lo = np.floor(src).astype(np.int64)
    lo = np.minimum(lo, n_in - 1)
    hi = np.minimum(lo + 1, n_in - 1)
    w_hi = (src - lo).astype(np.float32)
    w_lo = (1.0 - w_hi).astype(np.float32)

    lo_t = jnp.asarray(lo)
    hi_t = jnp.asarray(hi)
    w_lo_t = jnp.asarray(w_lo)[..., :, None]
    w_hi_t = jnp.asarray(w_hi)[..., :, None]
    gathered_lo = jnp.take(x, lo_t, axis=-2)
    gathered_hi = jnp.take(x, hi_t, axis=-2)
    return (gathered_lo * w_lo_t + gathered_hi * w_hi_t).astype(x.dtype)
