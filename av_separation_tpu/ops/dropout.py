"""Bandwidth-lean dropout.

`jax.random.bernoulli` draws 32 random bits per element and converts them
to floats before comparing — on (B, T, 4d) FFN activations that traffic
measurably dominates the train/eval step-time gap (v5e, scaled config:
+0.46 ms per application vs +0.0 for this path; the residual dropouts
together cost ~12.7 ms of a 76 ms step — /tmp/drop_exp r3, summarized in
docs/kernels.md).  Here the keep mask compares raw uint8 bits against a
threshold quantized to 1/256 — 4x fewer random bytes and no int->float
conversion, which XLA fuses to nothing next to the surrounding matmuls.

The keep probability is quantized to ceil/round(rate*256)/256 (e.g. 0.1 ->
26/256 = 0.1016); the survivor scale uses the *quantized* rate so the
output stays exactly mean-unbiased.  Dropout distribution is a behavioral
contract, not a bitwise one (the reference's torch RNG differs anyway —
reference model.py:44,160,199); the demo quality gate (+35 dB) covers the
training dynamics.

The mask is additionally REGENERABLE (custom VJP): the backward re-draws
the same uint8 bits from the saved (tiny) rng key instead of reading a
saved mask back from HBM.  Without this, every dropout site pays a
mask-sized HBM write in forward and read in backward — measured at
~3.7 ms/step of the scaled config across the residual/FFN dropout sites
(r3 roadmap #3 / VERDICT r3 #5).  Hardware RBG bit generation is
effectively free next to the eliminated traffic.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _keep_scale(n: int, dtype):
    return jnp.asarray(1.0 / (1.0 - n / 256.0), dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _regen_dropout(n: int, impl, x, key_data):
    bits = jax.random.bits(jax.random.wrap_key_data(key_data, impl=impl),
                           x.shape, "uint8")
    return jnp.where(bits >= jnp.uint8(n), x * _keep_scale(n, x.dtype),
                     jnp.zeros((), x.dtype))


def _regen_fwd(n, impl, x, key_data):
    return _regen_dropout(n, impl, x, key_data), key_data


def _regen_bwd(n, impl, key_data, g):
    # Re-draw the SAME bits (pure function of the key) — no saved mask.
    bits = jax.random.bits(jax.random.wrap_key_data(key_data, impl=impl),
                           g.shape, "uint8")
    dx = jnp.where(bits >= jnp.uint8(n), g * _keep_scale(n, g.dtype),
                   jnp.zeros((), g.dtype))
    return dx, np.zeros(key_data.shape, jax.dtypes.float0)


_regen_dropout.defvjp(_regen_fwd, _regen_bwd)


def fast_dropout(x: jnp.ndarray, rate: float, rng: jax.Array) -> jnp.ndarray:
    """Apply dropout with a uint8-bit keep mask.  rate quantizes to n/256.

    The keep mask is regenerated in the backward pass from the rng key
    (custom VJP above) — no mask residual travels through HBM."""
    n = min(max(int(round(rate * 256.0)), 1), 255)
    impl = str(jax.random.key_impl(rng))
    return _regen_dropout(n, impl, x, jax.random.key_data(rng))


class Dropout(nn.Module):
    """Drop-in replacement for flax.linen.Dropout on the training hot path
    (same 'dropout' rng collection and `deterministic` contract)."""

    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool) -> jnp.ndarray:
        if deterministic or self.rate == 0.0:
            return x
        return fast_dropout(x, self.rate, self.make_rng("dropout"))
