"""Space-to-depth restructuring of the stride-2 visual conv stem.

The reference's visual backbone is three 3x3 stride-2 convs at tiny spatial
shapes (32x32 -> 16 -> 8 -> 4, reference model.py:81-92).  On TPU the MXU
wants deep contractions; a stride-2 3x3 conv over few input channels gives
XLA's conv emitter a shallow, strided window (contraction depth 9*C_in with
C_in as low as 1), and its BACKWARD pair (zero-stuffed dgrad, strided
wgrad) measured 4x the forward cost (bench_results/profile_demo_auto.jsonl:
stem fwd 0.43 ms vs fwd+bwd 2.17 ms — 37% of the demo step).

This module re-expresses each stride-2 3x3 conv as an EXACTLY equivalent
stride-1 2x2 conv over the space-to-depth transform of its input:

    y(i,j) = sum_{di,dj in [-1,1]} x(2i+di, 2j+dj) . w(di,dj)

With X(I,J,(p,q,c)) = x(2I+p, 2J+q, c)  (2x2 parity -> channels), row
2i+di lands in S2D rows {i-1, i}: di=-1 -> (I=i-1, p=1), di=0 -> (i, 0),
di=+1 -> (i, 1).  So y is a 2x2 VALID conv over X padded by one row/col on
the LOW side only, with a (2,2,4*C_in,C_out) kernel scattered at trace
time from w (9 of 16 taps nonzero).  Benefits on TPU:

  - contraction depth per step becomes 4*C_in (16/128/256 for the three
    layers at the 2x2 window x4 parity channels vs the emitter's strided
    3x3 window);
  - stride-1 means the backward pair is a dense 2x2 transposed conv (no
    zero-stuffing) and a dense wgrad;
  - the S2D itself is a reshape+transpose XLA fuses into neighboring ops.

The weight scatter is linear in w, so autodiff flows through unchanged;
numerics are exactly the same sums as the direct conv (same taps, f32
accumulation), so the parity gates hold at float tolerance.

Selected via ``stem_impl='s2d'`` (model.py VisualEncoder), with the
measured crossover owned by ops/policy.py `resolve_stem`.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), parity-major channels:
    out[..., (p*2+q)*C + c] = x[..., 2I+p, 2J+q, c]."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


# (dI_or_dJ, parity) -> source 3x3 kernel row/col; the (0, 0) combo reads
# x(2i-2), outside the 3x3 window -> stays zero.
_TAP_MAP = (((0, 1), 0), ((1, 0), 1), ((1, 1), 2))


def expand_weight_s2d(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C_in, C_out) -> (2, 2, 4*C_in, C_out) kernel over the S2D
    input layout (trace-time scatter; linear in w)."""
    ci, co = w.shape[2], w.shape[3]
    w2 = jnp.zeros((2, 2, 2, 2, ci, co), w.dtype)
    for (d_i, p), r in _TAP_MAP:
        for (d_j, q), s in _TAP_MAP:
            w2 = w2.at[d_i, d_j, p, q].set(w[r, s])
    return w2.reshape(2, 2, 4 * ci, co)


def conv3x3s2_s2d(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Exact equivalent of `lax.conv(x, w, stride=2, padding=1)` for a 3x3
    kernel on even H/W, computed as S2D + stride-1 2x2 conv.

    x: (B, H, W, C_in) NHWC, H and W even; w: (3, 3, C_in, C_out) HWIO.
    Returns (B, H/2, W/2, C_out).
    """
    if x.shape[1] % 2 or x.shape[2] % 2:
        raise ValueError(
            f"s2d stem requires even spatial dims, got {x.shape[1:3]} — "
            "use stem_impl='xla' for odd frame geometries")
    xs = space_to_depth(x)
    w2 = expand_weight_s2d(w)
    return lax.conv_general_dilated(
        xs, w2, window_strides=(1, 1), padding=((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
