"""Range estimator behavior on synthetic distributions (SURVEY.md §4a)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer_quantization_tpu.quant import quantizers as Q
from transformer_quantization_tpu.quant import ranges as R


def cfg(method, **kw):
    return R.RangeEstimatorConfig(method=method, **kw)


def run_updates(c, rs, batches, shape=()):
    st = R.init_range_state(shape)
    for b in batches:
        st = R.update_range_state(st, b, c, rs)
    return R.finalize_ranges(st)


class TestMinMaxFamily:
    def test_current_minmax_uses_last_batch(self):
        c = cfg(R.RangeMethod.current_minmax)
        b1 = jnp.asarray([-5.0, 5.0])
        b2 = jnp.asarray([-1.0, 2.0])
        lo, hi = run_updates(c, R.ReduceSpec(), [b1, b2])
        assert (float(lo), float(hi)) == (-1.0, 2.0)

    def test_allminmax_envelope(self):
        c = cfg(R.RangeMethod.allminmax)
        b1 = jnp.asarray([-5.0, 1.0])
        b2 = jnp.asarray([-1.0, 2.0])
        lo, hi = run_updates(c, R.ReduceSpec(), [b1, b2])
        assert (float(lo), float(hi)) == (-5.0, 2.0)

    def test_running_minmax_ema(self):
        # range_estimators.py:209-214, momentum 0.9
        c = cfg(R.RangeMethod.running_minmax, momentum=0.9)
        b1 = jnp.asarray([-1.0, 1.0])
        b2 = jnp.asarray([-2.0, 3.0])
        lo, hi = run_updates(c, R.ReduceSpec(), [b1, b2])
        assert float(lo) == pytest.approx(0.1 * -2.0 + 0.9 * -1.0)
        assert float(hi) == pytest.approx(0.1 * 3.0 + 0.9 * 1.0)

    def test_per_channel(self):
        c = cfg(R.RangeMethod.current_minmax)
        x = jnp.asarray([[-1.0, 1.0], [-4.0, 2.0]])
        lo, hi = run_updates(c, R.ReduceSpec(per_channel=True), [x], shape=(2,))
        np.testing.assert_allclose(np.asarray(lo), [-1.0, -4.0])
        np.testing.assert_allclose(np.asarray(hi), [1.0, 2.0])

    def test_axis_mode(self):
        # (B, T, d) with axis=2 -> per-embedding ranges
        c = cfg(R.RangeMethod.current_minmax)
        x = jnp.stack([jnp.full((4, 6), -1.0), jnp.full((4, 6), 7.0)], axis=-1)
        lo, hi = run_updates(c, R.ReduceSpec(axis=2), [x], shape=(2,))
        np.testing.assert_allclose(np.asarray(lo), [-1.0, 7.0])
        np.testing.assert_allclose(np.asarray(hi), [-1.0, 7.0])

    def test_groups(self):
        # 4 channels, 2 groups: channels 0-1 and 2-3 share ranges
        c = cfg(R.RangeMethod.current_minmax)
        x = jnp.asarray([[1.0, 2.0, 100.0, 200.0]])[:, None, :]  # (1,1,4)
        lo, hi = run_updates(c, R.ReduceSpec(axis=2, n_groups=2), [x], shape=(4,))
        np.testing.assert_allclose(np.asarray(hi), [2.0, 2.0, 200.0, 200.0])
        np.testing.assert_allclose(np.asarray(lo), [1.0, 1.0, 100.0, 100.0])

    def test_group_permutation(self):
        # channels with interleaved dynamic ranges; permutation groups alike
        # channels (small: 0 & 2, large: 1 & 3) before per-group min/max
        c = cfg(R.RangeMethod.current_minmax)
        x = jnp.asarray([[[1.0, 100.0, 2.0, 200.0],
                          [-1.0, -100.0, -2.0, -200.0]]])  # (1, 2, 4)
        rs = R.ReduceSpec(axis=2, n_groups=2, permute=True)
        ranges = R.channel_dynamic_ranges(x, 2)
        np.testing.assert_allclose(np.asarray(ranges), [2.0, 200.0, 4.0, 400.0])
        perm = jnp.argsort(ranges)
        st = R.init_range_state((4,))
        st = R.update_range_state(st, x, c, rs, perm=perm)
        lo, hi = R.finalize_ranges(st)
        np.testing.assert_allclose(np.asarray(hi), [2.0, 200.0, 2.0, 200.0])
        np.testing.assert_allclose(np.asarray(lo), [-2.0, -200.0, -2.0, -200.0])
        # without permutation, groups mix small and large channels
        st2 = R.init_range_state((4,))
        st2 = R.update_range_state(
            st2, x, c, R.ReduceSpec(axis=2, n_groups=2), perm=None)
        _, hi2 = R.finalize_ranges(st2)
        np.testing.assert_allclose(np.asarray(hi2), [100.0, 100.0, 200.0, 200.0])

    def test_percentile_per_tensor_quirk(self):
        # per-tensor percentile uses (p, 100) — reference quirk
        # (range_estimators.py:133-140)
        c = cfg(R.RangeMethod.current_minmax, percentile=1.0)
        x = jnp.asarray(np.linspace(-1, 1, 201), jnp.float32)
        st = R.init_range_state((1,))
        st = R.update_range_state(st, x, c, R.ReduceSpec())
        lo, hi = R.finalize_ranges(st)
        assert float(hi[0]) == pytest.approx(1.0)  # max, not 99th pct
        assert float(lo[0]) == pytest.approx(-0.98, abs=1e-2)

    def test_jit_compatible(self):
        c = cfg(R.RangeMethod.running_minmax)
        rs = R.ReduceSpec(axis=2)

        @jax.jit
        def step(st, x):
            return R.update_range_state(st, x, c, rs)

        st = R.init_range_state((8,))
        x = jnp.ones((2, 3, 8))
        st = step(st, x)
        assert bool(st["initialized"])


class TestMSE:
    def test_grid_symmetric_finds_good_clip(self):
        # heavy-tailed data: MSE clip should be well inside the data extremes
        spec = Q.QuantizerSpec(n_bits=4, method=Q.QMethod.symmetric_uniform)
        est = R.MSERangeEstimator(spec, cfg(R.RangeMethod.MSE,
                                            num_candidates=100))
        rng = np.random.RandomState(0)
        x = np.concatenate([rng.normal(0, 0.1, 10000), [1.0, -1.0]])
        est.update(jnp.asarray(x, jnp.float32))
        lo, hi = est.finalize()
        assert 0.05 < float(hi) < 0.95  # clips the two outliers
        assert float(lo) == -float(hi)

    def test_grid_one_sided(self):
        spec = Q.QuantizerSpec(n_bits=8, method=Q.QMethod.asymmetric_uniform)
        est = R.MSERangeEstimator(spec, cfg(R.RangeMethod.MSE))
        x = jnp.asarray(np.random.RandomState(0).uniform(0, 1, 1000),
                        jnp.float32)
        est.update(x)
        assert est.one_sided
        lo, hi = est.finalize()
        assert float(lo) == 0.0 and 0.5 < float(hi) < 1.6

    def test_grid_2d_asymmetric(self):
        spec = Q.QuantizerSpec(n_bits=4, method=Q.QMethod.asymmetric_uniform)
        est = R.MSERangeEstimator(spec, cfg(R.RangeMethod.MSE,
                                            num_candidates=20))
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.normal(1.0, 0.5, (64, 16)), jnp.float32)
        est.update(x)
        lo, hi = est.finalize()
        assert float(lo) < 0.6 and float(hi) > 1.4  # covers the bulk

    def test_golden_section_close_to_grid(self):
        spec = Q.QuantizerSpec(n_bits=8, method=Q.QMethod.symmetric_uniform)
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.normal(0, 1.0, 4096), jnp.float32)

        e_grid = R.MSERangeEstimator(spec, cfg(R.RangeMethod.MSE,
                                               num_candidates=200))
        e_grid.update(x)
        e_gold = R.MSERangeEstimator(
            spec, cfg(R.RangeMethod.MSE, opt_method=R.OptMethod.golden_section))
        e_gold.update(x)

        hi_grid = float(e_grid.finalize()[1])
        hi_gold = float(e_gold.finalize()[1])
        assert hi_gold == pytest.approx(hi_grid, rel=0.1)

    def test_golden_asymmetric(self):
        spec = Q.QuantizerSpec(n_bits=8, method=Q.QMethod.asymmetric_uniform)
        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.normal(2.0, 1.0, 4096), jnp.float32)
        est = R.MSERangeEstimator(
            spec, cfg(R.RangeMethod.MSE, opt_method=R.OptMethod.golden_section))
        est.update(x)
        lo, hi = est.finalize()
        assert float(lo) < 0.0 and float(hi) > 4.0  # shifted range

    def test_per_channel_grid(self):
        spec = Q.QuantizerSpec(n_bits=8, method=Q.QMethod.symmetric_uniform)
        est = R.MSERangeEstimator(spec, cfg(R.RangeMethod.MSE,
                                            num_candidates=50),
                                  per_channel=True)
        x = jnp.stack([jnp.linspace(-0.1, 0.1, 100),
                       jnp.linspace(-10.0, 10.0, 100)])
        est.update(x)
        lo, hi = est.finalize()
        assert hi.shape == (2,)
        assert float(hi[1]) > 20 * float(hi[0])

    def test_loss_accumulates_across_batches(self):
        spec = Q.QuantizerSpec(n_bits=8, method=Q.QMethod.symmetric_uniform)
        est = R.MSERangeEstimator(spec, cfg(R.RangeMethod.MSE))
        x = jnp.asarray(np.random.RandomState(5).normal(0, 1, 512), jnp.float32)
        est.update(x)
        arr1 = est.loss_array.copy()
        est.update(x)
        np.testing.assert_allclose(est.loss_array[:, 1:], 2 * arr1[:, 1:],
                                   rtol=1e-5)


class TestCrossEntropy:
    def test_prefers_logit_fidelity(self):
        spec = Q.QuantizerSpec(n_bits=8, method=Q.QMethod.asymmetric_uniform)
        est = R.MSERangeEstimator(spec, cfg(R.RangeMethod.cross_entropy,
                                            num_candidates=50),
                                  cross_entropy=True)
        logits = jnp.asarray(np.random.RandomState(6).normal(0, 3, (32, 2)),
                             jnp.float32)
        est.update(logits)
        lo, hi = est.finalize()
        assert float(hi) > 0 and float(lo) < 0


class TestGoldenSection:
    def test_minimizes_quadratic(self):
        x = R.golden_section_minimize(lambda t: (t - 2.5) ** 2, 0.0, 10.0)
        assert float(x) == pytest.approx(2.5, abs=1e-4)

    def test_vmappable(self):
        centers = jnp.asarray([1.0, 2.0, 3.0])
        xs = jax.vmap(lambda c: R.golden_section_minimize(
            lambda t: (t - c) ** 2, 0.0, 10.0))(centers)
        np.testing.assert_allclose(np.asarray(xs), [1.0, 2.0, 3.0], atol=1e-4)
