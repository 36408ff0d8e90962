"""End-to-end quality gate (BASELINE.md): 100 training steps on the demo
config must reach >= +35 dB SNR improvement with masks in [0, 1] — the same
pass bar as the reference demo driver (reference demo.py:163-190, which gets
+37 dB; this repo's demo.py reproduces +38).

Marked slow: run with `pytest -m slow`.  Training uses the scan-fused
on-device path (the production fast path — quality and throughput are the
same code); evaluation uses the bit-matching host dataset exactly like the
reference's evaluate_separation (reference demo.py:31-64).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from av_separation_tpu.config import get_config
from av_separation_tpu.data.loader import eval_batch
from av_separation_tpu.data.synthetic import SyntheticAVDataset
from av_separation_tpu.train import (
    create_train_state, make_eval_step, make_fused_train_steps)


@pytest.mark.slow
def test_100_steps_reach_35db_improvement():
    cfg = get_config("demo")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, steps=100))
    model, state = create_train_state(cfg)

    # Eval BEFORE training (reference demo.py:163-165): untrained output.
    ds = SyntheticAVDataset(cfg.data)
    batch = {k: jnp.asarray(v) for k, v in eval_batch(ds, 20).items()}
    eval_fn = make_eval_step(model)
    pre = eval_fn(state.params, state.batch_stats, batch)

    fused = make_fused_train_steps(model, cfg, steps_per_call=50)
    state, loss = fused(state)
    state, loss = fused(state)
    assert np.isfinite(float(loss))
    assert int(state.step) == 100

    post = eval_fn(state.params, state.batch_stats, batch)
    improvement = float(post["output_snr"]) - float(post["input_snr"])
    assert improvement >= 35.0, (
        f"SNR improvement {improvement:.2f} dB < 35 dB "
        f"(untrained was {float(pre['output_snr']):.2f} dB)")
    assert 0.0 <= float(post["mask_min"]) <= float(post["mask_max"]) <= 1.0
    # Training must have actually moved the model (reference gets ~3 dB
    # untrained vs ~37 dB trained).
    assert float(post["output_snr"]) > float(pre["output_snr"]) + 20.0
