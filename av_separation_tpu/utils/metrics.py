"""Evaluation metrics, numerically identical to the reference demo driver.

The SNR-improvement figure in BASELINE.md is defined by two helpers in the
reference demo (reference demo.py:24-28 `snr_db` and demo.py:67-80
`_permutation_snr`); they are reproduced here as vectorized JAX functions so
evaluation runs on-device over whole batches instead of the reference's
per-sample Python loop (reference demo.py:43-63).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from av_separation_tpu.losses import permutation_table


def snr_db(signal: jnp.ndarray, noise: jnp.ndarray,
           eps: float = 1e-8) -> jnp.ndarray:
    """10*log10(|signal|^2 / |noise|^2) over the last axes, batched.

    Matches reference demo.py:24-28 (flattens everything; here the leading
    axes are preserved and the sum runs over the trailing `signal.ndim - nd`
    axes the caller flattened).
    """
    axes = tuple(range(-2, 0))
    s = jnp.sum(jnp.square(signal), axis=axes)
    n = jnp.sum(jnp.square(noise), axis=axes)
    return 10.0 * jnp.log10(s / (n + eps) + eps)


def input_snr(mixed_spec: jnp.ndarray, clean_specs: jnp.ndarray) -> jnp.ndarray:
    """Mean over speakers of snr_db(target, mixed - target) per sample.

    mixed: (B, F, T); clean: (B, S, F, T) -> (B,).
    Matches reference demo.py:53-57.
    """
    noise = mixed_spec[:, None] - clean_specs
    return jnp.mean(snr_db(clean_specs, noise), axis=-1)


def permutation_snr(separated: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Best-permutation mean output SNR per sample (B,).

    For every speaker permutation: mean over speakers of
    snr_db(target_s, separated_perm_s - target_s); take the max over
    permutations.  Matches reference demo.py:67-80.
    """
    s = separated.shape[1]
    perms = jnp.asarray(permutation_table(s))

    def for_perm(perm):
        perm_sep = jnp.take(separated, perm, axis=1)
        return jnp.mean(snr_db(targets, perm_sep - targets), axis=-1)  # (B,)

    snrs = jax.vmap(for_perm)(perms)  # (P, B)
    return jnp.max(snrs, axis=0)


def evaluate_separation(apply_fn, variables, mixed: jnp.ndarray,
                        frames: jnp.ndarray, targets: jnp.ndarray
                        ) -> Tuple[float, float]:
    """(mean input SNR, mean best-permutation output SNR) over the batch —
    the two numbers the reference demo prints (reference demo.py:31-64)."""
    separated, _ = apply_fn(variables, mixed, frames, deterministic=True)
    in_snr = jnp.mean(input_snr(mixed, targets))
    out_snr = jnp.mean(permutation_snr(separated, targets))
    return float(in_snr), float(out_snr)
