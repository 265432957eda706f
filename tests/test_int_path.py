"""Real-int execution path: parity with the fake-quant simulation.

The reference has no integer kernels (all fake-quant, SURVEY.md fact 2);
the int path is this framework's addition and must match the simulation's
numerics (int32 accumulation is exact, so agreement should be tight).
"""

import functools

import jax
import jax.numpy as jnp
import pytest
import numpy as np

from transformer_quantization_tpu.models import bert as B
from transformer_quantization_tpu.ops import int_linear as IL
from transformer_quantization_tpu.quant import quantizers as Q
from transformer_quantization_tpu.quant.qconfig import QuantDefaults
from transformer_quantization_tpu.quant.quantizers import QMethod
from transformer_quantization_tpu.quant.ranges import RangeMethod
from transformer_quantization_tpu.training.calibration import (
    prepare_quantized_model,
)

CFG = B.BertConfig(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                   num_attention_heads=4, intermediate_size=64,
                   max_position_embeddings=64, num_labels=2)


def sym(bits):
    return Q.QuantizerSpec(n_bits=bits, method=QMethod.symmetric_uniform)


def asym(bits):
    return Q.QuantizerSpec(n_bits=bits, method=QMethod.asymmetric_uniform)


class TestIntLinear:
    def test_int8_matches_fake_quant_linear(self):
        rng = np.random.RandomState(0)
        w = jnp.asarray(rng.normal(0, 0.1, (24, 16)), jnp.float32)
        x = jnp.asarray(rng.normal(0, 1.0, (8, 16)), jnp.float32)
        wspec, aspec = sym(8), asym(8)
        wqp = Q.set_quant_range(wspec, jnp.min(w, 1), jnp.max(w, 1))
        aqp = Q.set_quant_range(aspec, jnp.min(x), jnp.max(x))

        x_fq = Q.fake_quant(aspec, aqp, x)
        w_fq = Q.fake_quant(wspec, wqp, w, axis=0)
        y_fake = x_fq @ w_fq.T

        packed = IL.pack_weight_int8(wspec, wqp, w)
        assert packed["w_int"].dtype == jnp.int8
        x8, s, shift = IL.quantize_activation_int8(aspec, aqp, x_fq)
        y_int = IL.int8_linear(x8, s, shift, packed, None)
        np.testing.assert_allclose(np.asarray(y_int), np.asarray(y_fake),
                                   rtol=1e-4, atol=1e-5)

    def test_int4_pack_roundtrip(self):
        rng = np.random.RandomState(1)
        w = jnp.asarray(rng.normal(0, 0.1, (8, 16)), jnp.float32)
        spec = sym(4)
        qp = Q.set_quant_range(spec, jnp.min(w), jnp.max(w))
        packed = IL.pack_weight_int4(spec, qp, w)
        assert packed["w_packed"].dtype == jnp.uint8
        assert packed["w_packed"].shape == (8, 8)  # two nibbles per byte
        w_unpacked = IL.unpack_int4(packed["w_packed"], 16)
        ref = IL.pack_weight_int8(spec, qp, w)["w_int"]
        np.testing.assert_array_equal(np.asarray(w_unpacked), np.asarray(ref))

    def test_int4_linear_matches_fake(self):
        rng = np.random.RandomState(2)
        w = jnp.asarray(rng.normal(0, 0.1, (24, 16)), jnp.float32)
        x = jnp.asarray(rng.normal(0, 1.0, (8, 16)), jnp.float32)
        wspec, aspec = sym(4), asym(8)
        wqp = Q.set_quant_range(wspec, jnp.min(w, 1), jnp.max(w, 1))
        aqp = Q.set_quant_range(aspec, jnp.min(x), jnp.max(x))
        y_fake = Q.fake_quant(aspec, aqp, x) @ Q.fake_quant(
            wspec, wqp, w, axis=0).T
        packed = IL.pack_weight_int4(wspec, wqp, w)
        x8, s, shift = IL.quantize_activation_int8(
            aspec, aqp, Q.fake_quant(aspec, aqp, x))
        y_int = IL.int8_linear(x8, s, shift, packed, None)
        np.testing.assert_allclose(np.asarray(y_int), np.asarray(y_fake),
                                   rtol=1e-4, atol=1e-5)

    def test_embedding_pack(self):
        rng = np.random.RandomState(3)
        t = jnp.asarray(rng.normal(0, 0.05, (32, 8)), jnp.float32)
        spec = sym(8)
        qp = Q.set_quant_range(spec, jnp.min(t), jnp.max(t))
        packed = IL.pack_embedding_int8(spec, qp, t)
        ids = jnp.asarray([0, 5, 31])
        got = IL.int8_embedding_lookup(ids, packed)
        want = jnp.take(Q.fake_quant(spec, qp, t), ids, axis=0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)


class TestIntBert:
    def test_engine_parity_with_fake_path(self):
        params = B.init_bert_params(jax.random.PRNGKey(0), CFG)
        d = QuantDefaults(method=QMethod.symmetric_uniform,
                          act_method=QMethod.asymmetric_uniform, n_bits=8,
                          weight_range_method=RangeMethod.current_minmax,
                          act_range_method=RangeMethod.current_minmax)
        qcfg = B.declare_bert_sites(d, CFG)
        rng = np.random.RandomState(4)
        batch = {
            "input_ids": jnp.asarray(rng.randint(0, CFG.vocab_size, (4, 16))),
            "attention_mask": jnp.ones((4, 16), jnp.float32),
            "token_type_ids": jnp.zeros((4, 16), jnp.int32),
        }
        apply_fn = functools.partial(B.bert_apply, cfg=CFG)
        qstate, mode = prepare_quantized_model(
            apply_fn, params, qcfg, [batch],
            weight_tensors=B.bert_weight_site_tensors(params))

        int_params = B.build_bert_int_params(params, qcfg, qstate)
        # the 6 matmul sites per layer + 3 embedding tables + pooler + clf
        assert len(int_params) == 6 * CFG.num_hidden_layers + 5

        out_fake, _ = B.bert_apply(params, batch, CFG, qcfg, qstate, mode)
        out_int, _ = B.bert_apply(params, batch, CFG, qcfg, qstate, mode,
                                  int_params=int_params)
        np.testing.assert_allclose(np.asarray(out_int["logits"]),
                                   np.asarray(out_fake["logits"]),
                                   rtol=1e-3, atol=1e-4)
        seq_err = float(jnp.max(jnp.abs(out_int["sequence_output"]
                                        - out_fake["sequence_output"])))
        assert seq_err < 1e-2, seq_err

    def test_engine_jits(self):
        params = B.init_bert_params(jax.random.PRNGKey(0), CFG)
        d = QuantDefaults(method=QMethod.symmetric_uniform,
                          act_method=QMethod.asymmetric_uniform, n_bits=8,
                          weight_range_method=RangeMethod.current_minmax,
                          act_range_method=RangeMethod.current_minmax)
        qcfg = B.declare_bert_sites(d, CFG)
        rng = np.random.RandomState(5)
        batch = {
            "input_ids": jnp.asarray(rng.randint(0, CFG.vocab_size, (2, 8))),
            "attention_mask": jnp.ones((2, 8), jnp.float32),
        }
        apply_fn = functools.partial(B.bert_apply, cfg=CFG)
        qstate, mode = prepare_quantized_model(
            apply_fn, params, qcfg, [batch],
            weight_tensors=B.bert_weight_site_tensors(params))
        int_params = B.build_bert_int_params(params, qcfg, qstate)

        @functools.partial(jax.jit, static_argnums=(2,))
        def step(batch, qstate, mode):
            out, _ = B.bert_apply(params, batch, CFG, qcfg, qstate, mode,
                                  int_params=int_params)
            return out["logits"]

        logits = step(batch, qstate, mode)
        assert np.all(np.isfinite(np.asarray(logits)))


class TestInt8Attention:
    """Scores/context einsums in int8 (ops/int_linear.py int8_attention_*):
    bit-faithful to the f32 einsum of the fake-quantized operands."""

    def _qkv(self, seed=0, B=2, T=8, n=2, d=4):
        rng = np.random.RandomState(seed)
        q = jnp.asarray(rng.normal(0, 1.0, (B, T, n, d)), jnp.float32)
        k = jnp.asarray(rng.normal(0, 1.2, (B, T, n, d)), jnp.float32)
        v = jnp.asarray(rng.normal(0, 0.8, (B, T, n, d)), jnp.float32)
        return q, k, v

    def test_scores_match_fake_einsum(self):
        q, k, _ = self._qkv()
        spec = asym(8)
        q_qp = Q.set_quant_range(spec, jnp.min(q), jnp.max(q))
        k_qp = Q.set_quant_range(spec, jnp.min(k), jnp.max(k))
        got = IL.int8_attention_scores(q, k, spec, q_qp, spec, k_qp)
        want = jnp.einsum("bqnd,bknd->bnqk", Q.fake_quant(spec, q_qp, q),
                          Q.fake_quant(spec, k_qp, k))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_context_match_fake_einsum(self):
        q, k, v = self._qkv(seed=1)
        scores = jnp.einsum("bqnd,bknd->bnqk", q, k)
        probs = jax.nn.softmax(scores, axis=-1)
        pspec, vspec = asym(8), asym(8)
        p_qp = Q.set_quant_range(pspec, jnp.min(probs), jnp.max(probs))
        v_qp = Q.set_quant_range(vspec, jnp.min(v), jnp.max(v))
        got = IL.int8_attention_context(probs, v, pspec, p_qp, vspec, v_qp)
        want = jnp.einsum("bnqk,bknd->bqnd", Q.fake_quant(pspec, p_qp, probs),
                          Q.fake_quant(vspec, v_qp, v))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_symmetric_operands(self):
        q, k, _ = self._qkv(seed=2)
        sspec = sym(8)
        q_qp = Q.set_quant_range(sspec, jnp.min(q), jnp.max(q))
        k_qp = Q.set_quant_range(sspec, jnp.min(k), jnp.max(k))
        got = IL.int8_attention_scores(q, k, sspec, q_qp, sspec, k_qp)
        want = jnp.einsum("bqnd,bknd->bnqk", Q.fake_quant(sspec, q_qp, q),
                          Q.fake_quant(sspec, k_qp, k))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_quant_activation_wrapper_tied():
    """QuantizedActivationWrapper tying (autoquant_utils.py:24-52): one
    site quantizes both the input and output of a param-free op."""
    import jax.numpy as jnp
    from transformer_quantization_tpu.ops.layers import (
        quant_activation_wrapper,
    )
    from transformer_quantization_tpu.quant.manager import QuantCtx
    from transformer_quantization_tpu.quant.qconfig import (
        Phase,
        QuantConfigBuilder,
        QuantDefaults,
        QuantMode,
    )

    b = QuantConfigBuilder(QuantDefaults(n_bits=8))
    b.act("pool")
    qcfg = b.build()
    x = jnp.asarray(np.linspace(-2.0, 6.0, 64).reshape(4, 16), jnp.float32)

    def avg_pool(v):
        return jnp.mean(v, axis=-1, keepdims=True)

    # estimate: the tied estimator must see BOTH tensors -> range covers
    # the input extremes, not just the pooled means
    ctx = QuantCtx(qcfg, {}, QuantMode(act_phase=Phase.estimate))
    quant_activation_wrapper(ctx, "pool", avg_pool, x)
    qs = ctx.export()
    from transformer_quantization_tpu.quant import quantizers as Q

    xmin, xmax = Q.x_min_max_of(qcfg["pool"].spec, qs["pool"]["qp"])
    assert float(xmin) < -1.8 and float(xmax) > 5.9

    # fix: both input and output ride the same grid
    ctx2 = QuantCtx(qcfg, qs, QuantMode())
    y = quant_activation_wrapper(ctx2, "pool", avg_pool, x)
    scale = float(Q.scale_of(qcfg["pool"].spec, qs["pool"]["qp"]))
    y_ref = avg_pool(Q.fake_quant(qcfg["pool"].spec, qs["pool"]["qp"], x))
    np.testing.assert_allclose(
        np.asarray(y),
        np.asarray(Q.fake_quant(qcfg["pool"].spec, qs["pool"]["qp"], y_ref)),
        atol=scale)

    # untied: input passes through unquantized
    ctx3 = QuantCtx(qcfg, qs, QuantMode())
    y_untied = quant_activation_wrapper(ctx3, "pool", avg_pool, x,
                                        tie_input=False)
    np.testing.assert_allclose(
        np.asarray(y_untied),
        np.asarray(Q.fake_quant(qcfg["pool"].spec, qs["pool"]["qp"],
                                avg_pool(x))), rtol=1e-6)


class TestDynamicIntPath:
    """--dynamic (+--per-token) executing on the real int8 path: per-batch /
    per-token input scales fold into the matmul epilogue (axis scales are
    constant along the contraction dim), so dynamic quantized inference no
    longer needs the fake-quant fallback."""

    def _setup(self, per_token: bool, per_channel: bool = False):
        params = B.init_bert_params(jax.random.PRNGKey(0), CFG)
        d = QuantDefaults(method=QMethod.symmetric_uniform,
                          act_method=QMethod.asymmetric_uniform, n_bits=8,
                          per_channel_weights=per_channel,
                          weight_range_method=RangeMethod.current_minmax,
                          act_range_method=RangeMethod.current_minmax)
        qcfg = B.declare_bert_sites(d, CFG)
        if per_token:
            qcfg = B.apply_peg_wiring(qcfg, CFG.num_hidden_layers,
                                      per_token=True)
        rng = np.random.RandomState(7)
        batch = {
            "input_ids": jnp.asarray(rng.randint(0, CFG.vocab_size, (4, 16))),
            "attention_mask": jnp.ones((4, 16), jnp.float32),
        }
        apply_fn = functools.partial(B.bert_apply, cfg=CFG)
        qstate, mode = prepare_quantized_model(
            apply_fn, params, qcfg, [batch],
            weight_tensors=B.bert_weight_site_tensors(params), dynamic=True)
        int_params = B.build_bert_int_params(params, qcfg, qstate)
        return params, qcfg, qstate, mode, int_params, batch

    @pytest.mark.parametrize("per_token,per_channel",
                             [(False, False), (True, False), (True, True)])
    def test_dynamic_int_matches_fake_quant(self, per_token, per_channel):
        params, qcfg, qstate, mode, int_params, batch = self._setup(
            per_token, per_channel)
        out_fake, _ = B.bert_apply(params, batch, CFG, qcfg, qstate, mode)
        out_int, _ = B.bert_apply(params, batch, CFG, qcfg, qstate, mode,
                                  int_params=int_params)
        np.testing.assert_allclose(np.asarray(out_int["logits"]),
                                   np.asarray(out_fake["logits"]),
                                   rtol=1e-3, atol=1e-4)

    def test_per_token_scales_are_per_position(self):
        # two sequences with very different magnitudes at different
        # positions: per-token dynamic ranges must differ along T
        params, qcfg, qstate, mode, int_params, batch = self._setup(True)
        _, qs = B.bert_apply(params, batch, CFG, qcfg, qstate, mode)
        qp = qs["L0.attn.q.out"]["qp"]
        assert qp.delta.shape == (16,)
        assert float(jnp.std(qp.delta)) > 0.0


class TestWeightOnlyIntPath:
    """Weight-only real-int execution (e.g. the paper's W4A32 AdaRound
    eval): packed int weights dequantize on load, activations stay float;
    logits must be IDENTICAL to the fake-quant path (same grid points)."""

    @pytest.mark.parametrize("n_bits", [8, 4])
    def test_w_only_matches_fake_quant(self, n_bits):
        params = B.init_bert_params(jax.random.PRNGKey(0), CFG)
        d = QuantDefaults(method=QMethod.symmetric_uniform,
                          act_method=QMethod.asymmetric_uniform,
                          n_bits=n_bits,
                          weight_range_method=RangeMethod.current_minmax,
                          act_range_method=RangeMethod.current_minmax)
        qcfg = B.declare_bert_sites(d, CFG)
        rng = np.random.RandomState(11)
        batch = {
            "input_ids": jnp.asarray(rng.randint(0, CFG.vocab_size, (4, 16))),
            "attention_mask": jnp.ones((4, 16), jnp.float32),
        }
        apply_fn = functools.partial(B.bert_apply, cfg=CFG)
        # act_quant=False => W{n}A32: no input site is int8-able, so every
        # matmul previously ran the full fake-quant weight chain
        qstate, mode = prepare_quantized_model(
            apply_fn, params, qcfg, [batch], act_quant=False,
            weight_tensors=B.bert_weight_site_tensors(params))
        int_params = B.build_bert_int_params(params, qcfg, qstate,
                                             use_int4=n_bits == 4)
        out_fake, _ = B.bert_apply(params, batch, CFG, qcfg, qstate, mode)
        out_int, _ = B.bert_apply(params, batch, CFG, qcfg, qstate, mode,
                                  int_params=int_params)
        np.testing.assert_array_equal(np.asarray(out_int["logits"]),
                                      np.asarray(out_fake["logits"]))


def test_wide_input_edges_bypass_int8_payload():
    """A >8-bit input site must NOT ride the int8 payload path: its
    levels don't fit int8 and the cast would WRAP (caught by the round-5
    real-TPU flex check — the generic path diverged from both the engine
    and the fake-quant simulation by ~30% of logit scale on {'c': 16}).
    The generic int path must agree with the pure simulation for every
    16-bit-edge recipe at a non-toy size."""
    import __graft_entry__ as G
    from transformer_quantization_tpu.models import bert as B
    from transformer_quantization_tpu.quant.manager import (
        init_weight_qstate)
    from transformer_quantization_tpu.quant.qconfig import (
        Phase, QuantMode)

    cfg = B.BertConfig(vocab_size=256, hidden_size=128,
                       num_hidden_layers=3, num_attention_heads=4,
                       intermediate_size=256, max_position_embeddings=64,
                       num_labels=2)
    params, qcfg0, _ = G._calibrated_bert(cfg, batch_size=2, seq=64)
    rng = np.random.RandomState(5)
    batch = {
        "input_ids": jnp.asarray(rng.randint(0, 256, (8, 64)), jnp.int32),
        "attention_mask": jnp.ones((8, 64), jnp.float32),
        "token_type_ids": jnp.zeros((8, 64), jnp.int32),
    }
    for qd in ({"c": 16}, {"x": 16, "h": 16, "y": 16}, {"L": 16}):
        qc = B.apply_bert_quant_dict(qcfg0, qd, cfg.num_hidden_layers)
        qs = init_weight_qstate(qc, B.bert_weight_site_tensors(params))
        _, qs = B.bert_apply(params, batch, cfg, qc, qs,
                             QuantMode(act_phase=Phase.estimate))
        ip = B.build_bert_int_params(params, qc, qs)
        sim, _ = B.bert_apply(params, batch, cfg, qc, qs, QuantMode())
        gen, _ = B.bert_apply(params, batch, cfg, qc, qs, QuantMode(),
                              int_params=ip)
        scale = float(np.max(np.abs(np.asarray(sim["logits"]))))
        d = float(np.max(np.abs(np.asarray(gen["logits"])
                                - np.asarray(sim["logits"]))))
        assert d <= max(2e-2 * scale, 2e-3), (qd, d, scale)
