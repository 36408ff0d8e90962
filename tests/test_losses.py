"""Loss behavior contract (reference tests/test_model.py:297-325) plus
PIT-mode and differentiability coverage."""

import jax
import jax.numpy as jnp
import numpy as np

from av_separation_tpu.losses import (
    best_permutation,
    permutation_table,
    separation_loss,
    si_snr,
)


def rand(shape, seed=0, scale=1.0):
    return jnp.asarray(np.random.default_rng(seed).normal(
        size=shape).astype(np.float32) * scale)


class TestSiSnr:
    def test_identical_signals_high_snr(self):
        x = rand((2, 65, 32))
        assert float(si_snr(x, x)) > 20.0

    def test_orthogonal_signals_negative(self):
        # Orthogonal zero-mean vectors project to ~0 -> strongly negative.
        t = np.zeros((1, 64), np.float32)
        e = np.zeros((1, 64), np.float32)
        t[0, 0::2], t[0, 1::2] = 1.0, -1.0
        e[0, 0], e[0, 1] = 1.0, 1.0
        e[0, 2], e[0, 3] = -1.0, -1.0
        assert float(si_snr(jnp.asarray(e), jnp.asarray(t))) < 0.0

    def test_scale_invariance(self):
        x, y = rand((2, 65, 32), 0), rand((2, 65, 32), 1)
        a = float(si_snr(x, y))
        b = float(si_snr(3.7 * x, y))
        np.testing.assert_allclose(a, b, atol=1e-3)

    def test_per_sample_mode(self):
        x, y = rand((4, 65, 32), 0), rand((4, 65, 32), 1)
        per = si_snr(x, y, reduce_mean=False)
        assert per.shape == (4,)
        np.testing.assert_allclose(float(jnp.mean(per)), float(si_snr(x, y)),
                                   atol=1e-5)


class TestSeparationLoss:
    def test_finite_scalar(self):
        sep, tgt = rand((2, 2, 65, 32), 0), rand((2, 2, 65, 32), 1)
        loss = separation_loss(sep, tgt)
        assert loss.shape == ()
        assert np.isfinite(float(loss))

    def test_differentiable(self):
        sep, tgt = rand((2, 2, 65, 32), 0), rand((2, 2, 65, 32), 1)
        g = jax.grad(lambda s: separation_loss(s, tgt))(sep)
        assert bool(jnp.isfinite(g).all())
        assert float(jnp.abs(g).sum()) > 0

    def test_perfect_separation_low_loss(self):
        tgt = rand((2, 2, 65, 32), 0)
        loss = float(separation_loss(tgt, tgt))
        assert loss < -50.0  # -si_snr dominates, si_snr(x,x) ~ 80 dB

    def test_permutation_recovered(self):
        tgt = rand((2, 2, 65, 32), 0)
        swapped = tgt[:, ::-1]
        loss_direct = float(separation_loss(tgt, tgt))
        loss_swapped = float(separation_loss(swapped, tgt))
        np.testing.assert_allclose(loss_direct, loss_swapped, atol=1e-4)

    def test_three_speaker_six_perms(self):
        assert permutation_table(3).shape == (6, 3)
        tgt = rand((2, 3, 65, 32), 0)
        scrambled = tgt[:, [2, 0, 1]]
        assert float(separation_loss(scrambled, tgt)) < -50.0

    def test_per_sample_pit_beats_global_on_mixed_batch(self):
        # Sample 0 needs identity perm, sample 1 needs the swap: per-sample
        # PIT resolves both; batch-global must compromise.
        tgt = rand((2, 2, 65, 32), 0)
        sep = jnp.stack([tgt[0], tgt[1, ::-1]], axis=0)
        g = float(separation_loss(sep, tgt, pit_mode="global"))
        p = float(separation_loss(sep, tgt, pit_mode="per_sample"))
        assert p < g

    def test_best_permutation_search(self):
        tgt = rand((3, 2, 65, 32), 0)
        sep = jnp.stack([tgt[0], tgt[1, ::-1], tgt[2]], axis=0)
        perms, snrs = best_permutation(sep, tgt)
        np.testing.assert_array_equal(np.asarray(perms),
                                      [[0, 1], [1, 0], [0, 1]])
        assert float(jnp.min(snrs)) > 20.0


class TestMetrics:
    def test_input_snr_matches_definition(self):
        from av_separation_tpu.utils.metrics import input_snr
        mixed = rand((2, 65, 32), 0)
        clean = rand((2, 2, 65, 32), 1)
        got = np.asarray(input_snr(mixed, clean))
        # Hand-rolled reference of demo.py:53-57 math.
        m, c = np.asarray(mixed), np.asarray(clean)
        want = []
        for b in range(2):
            snrs = []
            for s in range(2):
                sig = (c[b, s] ** 2).sum()
                noi = ((m[b] - c[b, s]) ** 2).sum()
                snrs.append(10 * np.log10(sig / (noi + 1e-8) + 1e-8))
            want.append(np.mean(snrs))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_permutation_snr_picks_best(self):
        from av_separation_tpu.utils.metrics import permutation_snr
        tgt = rand((2, 2, 65, 32), 0)
        sep = jnp.stack([tgt[0], tgt[1, ::-1]], axis=0)
        out = np.asarray(permutation_snr(sep, tgt))
        assert (out > 40.0).all()


class TestPairwiseStatsPIT:
    """The production loss computes the S!-permutation search from pairwise
    speaker statistics (one MXU matmul + one S^2 L1 pass, losses.py module
    docstring); these gates pin it to the direct S!-pass oracle, values and
    gradients, for every supported speaker count and both PIT modes."""

    def _pair(self, s, seed, b=3, f=33, t=17):
        sep = rand((b, s, f, t), seed)
        # mix in correlated structure so the perms aren't degenerate
        tgt = 0.7 * jnp.roll(sep, 1, axis=1) + 0.3 * rand((b, s, f, t),
                                                          seed + 1)
        return sep, tgt

    def test_matches_direct_all_speaker_counts(self):
        from av_separation_tpu.losses import separation_loss_direct
        for s in (2, 3, 4):
            for mode in ("global", "per_sample"):
                sep, tgt = self._pair(s, seed=s)
                got = float(separation_loss(sep, tgt, l1_weight=0.5,
                                            pit_mode=mode))
                want = float(separation_loss_direct(sep, tgt, l1_weight=0.5,
                                                    pit_mode=mode))
                np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-5,
                                           err_msg=f"S={s} mode={mode}")

    def test_gradients_match_direct(self):
        from av_separation_tpu.losses import separation_loss_direct
        for s in (2, 3):
            sep, tgt = self._pair(s, seed=10 + s)
            gp = jax.grad(lambda x: separation_loss(x, tgt))(sep)
            gd = jax.grad(lambda x: separation_loss_direct(x, tgt))(sep)
            np.testing.assert_allclose(np.asarray(gp), np.asarray(gd),
                                       atol=1e-5, rtol=1e-3,
                                       err_msg=f"S={s}")

    def test_best_permutation_matches_direct_argmax(self):
        sep, tgt = self._pair(3, seed=42, b=5)
        perms, snrs = best_permutation(sep, tgt)
        # direct: evaluate per-sample si_snr for each permutation
        table = jnp.asarray(permutation_table(3))
        direct = jnp.stack([
            si_snr(jnp.take(sep, p, axis=1), tgt, reduce_mean=False)
            for p in table], axis=1)  # (B, P)
        np.testing.assert_allclose(np.asarray(snrs),
                                   np.asarray(jnp.max(direct, axis=1)),
                                   atol=1e-4, rtol=1e-5)
        np.testing.assert_array_equal(
            np.asarray(perms),
            np.asarray(table[jnp.argmax(direct, axis=1)]))
