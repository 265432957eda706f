"""Quantizer math vs closed-form expectations (SURVEY.md §4a/§4b).

Golden behaviors replicated from reference quantization/quantizers.py:
round-trip exactness on grid points, zero-point rounding, signedness
inference, range clamping, STE gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer_quantization_tpu.quant import quantizers as Q


def asym_spec(bits=8, **kw):
    return Q.QuantizerSpec(n_bits=bits, method=Q.QMethod.asymmetric_uniform, **kw)


def sym_spec(bits=8, **kw):
    return Q.QuantizerSpec(n_bits=bits, method=Q.QMethod.symmetric_uniform, **kw)


class TestAsymmetric:
    def test_grid_points_roundtrip_exactly(self):
        spec = asym_spec(8)
        qp = Q.set_quant_range(spec, -1.0, 1.0)
        scale = Q.scale_of(spec, qp)
        zp = Q.zero_point_of(spec, qp)
        # all representable values must be fixed points of fake_quant
        grid = scale * (jnp.arange(256.0) - zp)
        out = Q.fake_quant(spec, qp, grid)
        np.testing.assert_allclose(np.asarray(out), np.asarray(grid), atol=1e-7)

    def test_range_clamps_to_include_zero(self):
        # quantizers.py:257-259: x_min <= 0, x_max >= eps
        spec = asym_spec(8)
        qp = Q.set_quant_range(spec, 0.3, 1.0)  # positive min clamped to 0
        xmin, xmax = Q.x_min_max_of(spec, qp)
        assert float(xmin) <= 0.0 <= float(xmax)
        # delta = (1.0 - 0.0)/255
        np.testing.assert_allclose(float(Q.scale_of(spec, qp)), 1.0 / 255,
                                   rtol=1e-6)

    def test_zero_point_formula(self):
        spec = asym_spec(8)
        qp = Q.set_quant_range(spec, -0.5, 1.5)
        delta = 2.0 / 255
        np.testing.assert_allclose(float(Q.scale_of(spec, qp)), delta, rtol=1e-6)
        np.testing.assert_allclose(float(qp.zero_float), 0.5 / delta, rtol=1e-6)
        assert float(Q.zero_point_of(spec, qp)) == round(0.5 / delta)

    def test_clipping(self):
        spec = asym_spec(8)
        qp = Q.set_quant_range(spec, -1.0, 1.0)
        x = jnp.asarray([-10.0, 10.0])
        out = Q.fake_quant(spec, qp, x)
        xmin, xmax = Q.x_min_max_of(spec, qp)
        np.testing.assert_allclose(np.asarray(out),
                                   [float(xmin), float(xmax)], rtol=1e-6)

    def test_max_error_half_scale(self):
        spec = asym_spec(8)
        qp = Q.set_quant_range(spec, -1.0, 1.0)
        x = jnp.asarray(np.random.RandomState(0).uniform(-1, 1, 4096), jnp.float32)
        err = jnp.max(jnp.abs(Q.fake_quant(spec, qp, x) - x))
        assert float(err) <= float(Q.scale_of(spec, qp)) / 2 + 1e-7

    def test_log_scale_domain(self):
        spec = asym_spec(8, scale_domain="log")
        qp = Q.set_quant_range(spec, -1.0, 1.0)
        np.testing.assert_allclose(float(qp.delta), np.log(2.0 / 255), rtol=1e-5)
        np.testing.assert_allclose(float(Q.scale_of(spec, qp)), 2.0 / 255,
                                   rtol=1e-5)

    def test_per_channel(self):
        spec = asym_spec(8)
        w = jnp.stack([jnp.linspace(-1, 1, 16), jnp.linspace(-4, 4, 16)])
        qp = Q.set_quant_range(spec, jnp.min(w, axis=1), jnp.max(w, axis=1))
        assert qp.delta.shape == (2,)
        out = Q.fake_quant(spec, qp, w, axis=0)
        assert float(jnp.max(jnp.abs(out - w))) <= 8.0 / 255 / 2 + 1e-7
        # row 0 should be much more precise than row 1's scale
        row0_err = float(jnp.max(jnp.abs(out[0] - w[0])))
        assert row0_err <= 2.0 / 255 / 2 + 1e-7


class TestSymmetric:
    def test_signed_inference(self):
        # quantizers.py:334-339
        spec = sym_spec(8)
        qp_signed = Q.set_quant_range(spec, -1.0, 1.0)
        assert float(qp_signed.signed) == 1.0
        imin, imax = Q.int_min_max(spec, qp_signed.signed)
        assert (float(imin), float(imax)) == (-128.0, 127.0)

        qp_unsigned = Q.set_quant_range(spec, 0.0, 1.0)
        assert float(qp_unsigned.signed) == 0.0
        imin, imax = Q.int_min_max(spec, qp_unsigned.signed)
        assert (float(imin), float(imax)) == (0.0, 255.0)

    def test_delta_absmax(self):
        spec = sym_spec(8)
        qp = Q.set_quant_range(spec, -2.0, 1.0)
        np.testing.assert_allclose(float(Q.scale_of(spec, qp)), 2.0 / 127,
                                   rtol=1e-6)
        assert float(Q.zero_point_of(spec, qp)) == 0.0

    def test_unsigned_grid(self):
        spec = sym_spec(8)
        qp = Q.set_quant_range(spec, 0.0, 2.55)
        np.testing.assert_allclose(float(Q.scale_of(spec, qp)), 2.55 / 255,
                                   rtol=1e-6)
        out = Q.fake_quant(spec, qp, jnp.asarray([-1.0]))
        assert float(out[0]) == 0.0  # negatives clip to 0 on unsigned grid


class TestSTE:
    def test_round_ste_gradient_identity(self):
        g = jax.grad(lambda x: jnp.sum(Q.round_ste(x)))(jnp.asarray([0.3, 1.7]))
        np.testing.assert_allclose(np.asarray(g), [1.0, 1.0])

    def test_fake_quant_gradient(self):
        spec = asym_spec(8)
        qp = Q.set_quant_range(spec, -1.0, 1.0)
        g = jax.grad(lambda x: jnp.sum(Q.fake_quant(spec, qp, x)))(
            jnp.asarray([0.123, -0.5, 2.0, -2.0]))
        # identity gradient inside the range, zero outside (clip)
        np.testing.assert_allclose(np.asarray(g), [1.0, 1.0, 0.0, 0.0])

    def test_learnable_range_gradients_flow(self):
        spec = asym_spec(8)
        qp = Q.set_quant_range(spec, -1.0, 1.0)

        def loss(delta):
            qp2 = Q.QuantParams(delta=delta, zero_float=qp.zero_float,
                                signed=qp.signed)
            x = jnp.linspace(-0.9, 0.9, 64)
            return jnp.sum((Q.fake_quant(spec, qp2, x) - x) ** 2)

        g = jax.grad(loss)(qp.delta)
        assert np.isfinite(float(g)) and float(g) != 0.0


class TestAdaRound:
    def test_hard_sigmoid_identities(self):
        x = jnp.linspace(-4, 4, 101)
        h = Q.hard_sigmoid(x)
        assert float(jnp.min(h)) >= 0.0 and float(jnp.max(h)) <= 1.0
        # hard_logit inverts hard_sigmoid strictly inside (0, 1)
        p = jnp.linspace(0.05, 0.95, 19)
        np.testing.assert_allclose(np.asarray(Q.hard_sigmoid(Q.hard_logit(p))),
                                   np.asarray(p), atol=1e-5)

    def test_alpha_init_reproduces_fp_weight(self):
        # adaround/quantizer.py:56-71: h(alpha_init) == frac(w/s), so the
        # soft-quantized weight must equal round-to-nearest-free fake quant
        spec = sym_spec(4)
        w = jnp.asarray(np.random.RandomState(1).uniform(-1, 1, (8, 16)),
                        jnp.float32)
        qp = Q.set_quant_range(spec, jnp.min(w), jnp.max(w))
        alpha = Q.adaround_init_alpha(Q.AdaRoundMode.learned_hard_sigmoid,
                                      spec, qp, w)
        soft = Q.adaround_fake_quant(Q.AdaRoundMode.learned_hard_sigmoid,
                                     spec, qp, w, alpha, soft=True)
        # soft quant with initialized alpha == clipping-only transform
        scale = Q.scale_of(spec, qp)
        imin, imax = Q.int_min_max(spec, qp.signed)
        expected = scale * jnp.clip(w / scale, imin, imax)
        np.testing.assert_allclose(np.asarray(soft), np.asarray(expected),
                                   atol=1e-5)

    def test_hard_decision_matches_nearest_at_init(self):
        spec = sym_spec(4)
        w = jnp.asarray(np.random.RandomState(2).uniform(-1, 1, (128,)),
                        jnp.float32)
        qp = Q.set_quant_range(spec, jnp.min(w), jnp.max(w))
        alpha = Q.adaround_init_alpha(Q.AdaRoundMode.learned_hard_sigmoid,
                                      spec, qp, w)
        hard = Q.adaround_fake_quant(Q.AdaRoundMode.learned_hard_sigmoid,
                                     spec, qp, w, alpha, soft=False)
        nearest = Q.fake_quant(spec, qp, w)
        # alpha >= 0 <=> rest >= 0.5 (up rounding) for hard sigmoid init;
        # ties can flip, so allow a tiny mismatch fraction
        mismatch = float(jnp.mean(jnp.abs(hard - nearest) > 1e-6))
        assert mismatch < 0.02


class TestClampedFraction:
    def test_counts_clipped(self):
        spec = asym_spec(8)
        qp = Q.set_quant_range(spec, -1.0, 1.0)
        x = jnp.asarray([-2.0, 0.0, 0.5, 2.0])
        assert float(Q.clamped_fraction(spec, qp, x)) == pytest.approx(0.5)
