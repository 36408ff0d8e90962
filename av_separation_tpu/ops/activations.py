"""Memory-lean activations.

`relu` here is semantically identical to `jax.nn.relu` (reference model
uses torch's default ReLU in its encoder FFNs, reference model.py:48-52)
but carries a custom VJP that saves only the OUTPUT:

    y = max(x, 0);   dx = dy * (y > 0)

The sign test on y gives exactly the same gradient as the test on x
(y > 0  <=>  x > 0), including the 0-at-0 convention of `jax.nn.relu`'s
custom_jvp.  The payoff is on TPU: under plain autodiff XLA must
materialize BOTH the pre-activation (for the backward sign test) and the
post-activation (operand of the next matmul) — for a d->4d FFN that is
an extra (B, T, 4d) bf16 tensor written in forward and re-read in
backward.  Saving y (which the next matmul reads anyway) removes that
round trip; measured on v5e (scaled config, B=32, T=501, 4d=2048) each
FFN's forward fusion dropped ~0.2 ms of pure HBM traffic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@jax.custom_vjp
def relu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(x, 0)


def _relu_fwd(x):
    y = jnp.maximum(x, 0)
    return y, y


def _relu_bwd(y, g):
    return ((g * (y > 0).astype(g.dtype)),)


relu.defvjp(_relu_fwd, _relu_bwd)


# ---------------------------------------------------------------------------
# Fused activation+dropout: ONE residual tensor instead of two.
#
# In a d->4d->d FFN trained with inner dropout, plain autodiff keeps TWO
# (B, T, 4d) tensors alive across fwd->bwd: the activation output (for the
# activation's backward) and the dropout output (the next matmul's wgrad
# operand).  Fusing activation+dropout into one custom-VJP op lets a single
# residual serve both:
#
# * relu_dropout saves only its OUTPUT: out = mask/keep * max(x, 0) is
#   positive exactly where the combined backward is nonzero, so
#   dx = g * keep_scale * (out > 0) reproduces mask-and-sign in one test —
#   no mask regen, no second tensor.
# * gelu_dropout saves only its INPUT (+ the 4-word rng key) and recomputes
#   the erf GELU and the uint8 keep mask in backward — trading a (B, T, 4d)
#   bf16 HBM round trip (~0.16 ms at scaled shapes) for VPU transcendentals
#   (~0.04 ms) per fusion layer.
#
# The uint8-quantized mask stream matches ops/dropout.py exactly (same
# bits, same n/256 threshold, same survivor scale) so training dynamics are
# unchanged vs relu/gelu + FastDropout.
# ---------------------------------------------------------------------------


def _keep_scale(n: int, dtype):
    return jnp.asarray(1.0 / (1.0 - n / 256.0), dtype)


def _keep_bits(impl, key_data, shape):
    return jax.random.bits(jax.random.wrap_key_data(key_data, impl=impl),
                           shape, "uint8")


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _relu_dropout(n: int, impl, x, key_data):
    bits = _keep_bits(impl, key_data, x.shape)
    y = jnp.maximum(x, 0)
    return jnp.where(bits >= jnp.uint8(n), y * _keep_scale(n, x.dtype),
                     jnp.zeros((), x.dtype))


def _relu_dropout_fwd(n, impl, x, key_data):
    out = _relu_dropout(n, impl, x, key_data)
    return out, (out, key_data)


def _relu_dropout_bwd(n, impl, res, g):
    out, key_data = res
    dx = jnp.where(out > 0, g * _keep_scale(n, g.dtype),
                   jnp.zeros((), g.dtype))
    return dx, np.zeros(key_data.shape, jax.dtypes.float0)


_relu_dropout.defvjp(_relu_dropout_fwd, _relu_dropout_bwd)


def _gelu_exact(x):
    # erf formulation in f32, cast back — matches nn.gelu(approximate=False)
    # numerics used elsewhere in the model.
    xf = x.astype(jnp.float32)
    y = 0.5 * xf * (1.0 + jax.lax.erf(xf / np.sqrt(2.0).astype(np.float32)))
    return y.astype(x.dtype)


def _gelu_grad(x):
    xf = x.astype(jnp.float32)
    inv_sqrt2 = np.float32(1.0 / np.sqrt(2.0))
    cdf = 0.5 * (1.0 + jax.lax.erf(xf * inv_sqrt2))
    pdf = jnp.exp(-0.5 * xf * xf) * np.float32(1.0 / np.sqrt(2.0 * np.pi))
    return (cdf + xf * pdf).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _gelu_dropout(n: int, impl, x, key_data):
    bits = _keep_bits(impl, key_data, x.shape)
    y = _gelu_exact(x)
    return jnp.where(bits >= jnp.uint8(n), y * _keep_scale(n, x.dtype),
                     jnp.zeros((), x.dtype))


def _gelu_dropout_fwd(n, impl, x, key_data):
    return _gelu_dropout(n, impl, x, key_data), (x, key_data)


def _gelu_dropout_bwd(n, impl, res, g):
    x, key_data = res
    bits = _keep_bits(impl, key_data, x.shape)
    dgelu = _gelu_grad(x)
    dx = jnp.where(bits >= jnp.uint8(n),
                   g * dgelu * _keep_scale(n, g.dtype),
                   jnp.zeros((), g.dtype))
    return dx, np.zeros(key_data.shape, jax.dtypes.float0)


_gelu_dropout.defvjp(_gelu_dropout_fwd, _gelu_dropout_bwd)


def relu_dropout(x: jnp.ndarray, rate: float,
                 rng: jax.Array | None) -> jnp.ndarray:
    """relu -> dropout(rate); rate==0/None rng means plain (save-out) relu."""
    if rate == 0.0 or rng is None:
        return relu(x)
    n = min(max(int(round(rate * 256.0)), 1), 255)
    impl = str(jax.random.key_impl(rng))
    return _relu_dropout(n, impl, x, jax.random.key_data(rng))


def gelu_dropout(x: jnp.ndarray, rate: float,
                 rng: jax.Array | None) -> jnp.ndarray:
    """exact-gelu -> dropout(rate); rate==0/None rng means plain gelu."""
    if rate == 0.0 or rng is None:
        return _gelu_exact(x)
    n = min(max(int(round(rate * 256.0)), 1), 255)
    impl = str(jax.random.key_impl(rng))
    return _gelu_dropout(n, impl, x, jax.random.key_data(rng))
