"""Batch pipeline over the host synthetic dataset.

Replaces the reference's `torch.utils.data.DataLoader(batch_size=8,
shuffle=True)` (reference demo.py:87): the dataset is materialized once into
stacked NumPy arrays, then batches are cut by shuffled index — no worker
processes needed since generation is a one-time vectorized precompute.
"""

from __future__ import annotations

from typing import Dict, Iterator

import numpy as np

from av_separation_tpu.data.synthetic import SyntheticAVDataset


def batch_iterator(dataset: SyntheticAVDataset, batch_size: int,
                   seed: int = 0, drop_last: bool = True,
                   loop: bool = True,
                   start_step: int = 0) -> Iterator[Dict[str, np.ndarray]]:
    """Shuffled epoch batches, reshuffling each epoch; loops forever by
    default (the training loop bounds the step count).

    `start_step` fast-forwards the stream so a run resumed from a
    checkpoint at step K replays exactly the batches an uninterrupted run
    would have seen from step K on (deterministic resume — VERDICT r3 #7):
    epoch permutations before the resume point are drawn and discarded
    (cheap), never materialized into batches."""
    data = dataset.materialize()
    n = len(dataset)
    rng = np.random.default_rng(seed)
    bpe = max(1, n // batch_size) if drop_last \
        else max(1, -(-n // batch_size))
    for _ in range(start_step // bpe):
        rng.permutation(n)  # advance the epoch-shuffle stream
    skip = start_step % bpe
    while True:
        order = rng.permutation(n)
        for start in range(0, n, batch_size):
            idx = order[start:start + batch_size]
            if drop_last and len(idx) < batch_size:
                continue
            if skip:
                skip -= 1
                continue
            yield {k: v[idx] for k, v in data.items()}
        if not loop:
            return


def eval_batch(dataset: SyntheticAVDataset,
               num_samples: int = 20) -> Dict[str, np.ndarray]:
    """First `num_samples` samples stacked — the reference's eval subset
    (reference demo.py:43 uses min(20, len(ds)))."""
    data = dataset.materialize()
    n = min(num_samples, len(dataset))
    return {k: v[:n] for k, v in data.items()}
