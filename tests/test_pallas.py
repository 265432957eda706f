"""Pallas fused int8 kernel: parity with the XLA int path / simulation.

Runs in interpreter mode on CPU (the real Mosaic compile happens on TPU);
the kernel must reproduce the XLA int path bit-for-bit at the int8 grid
points, and the full model must agree with the fake-quant simulation.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from transformer_quantization_tpu.models import bert as B
from transformer_quantization_tpu.ops import int_linear as IL
from transformer_quantization_tpu.ops.pallas import fused_int8_linear
from transformer_quantization_tpu.quant import quantizers as Q
from transformer_quantization_tpu.quant.qconfig import QuantDefaults
from transformer_quantization_tpu.quant.quantizers import QMethod
from transformer_quantization_tpu.quant.ranges import RangeMethod
from transformer_quantization_tpu.training.calibration import (
    prepare_quantized_model,
)


def _specs(wbits=8, abits=8):
    return (Q.QuantizerSpec(n_bits=wbits, method=QMethod.symmetric_uniform),
            Q.QuantizerSpec(n_bits=abits, method=QMethod.asymmetric_uniform))


def _setup(m=16, k=32, n=24, seed=0, per_channel=True):
    rng = np.random.RandomState(seed)
    w = jnp.asarray(rng.normal(0, 0.1, (n, k)), jnp.float32)
    x = jnp.asarray(rng.normal(0, 1.0, (m, k)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.05, (n,)), jnp.float32)
    wspec, aspec = _specs()
    if per_channel:
        wqp = Q.set_quant_range(wspec, jnp.min(w, 1), jnp.max(w, 1))
    else:
        wqp = Q.set_quant_range(wspec, jnp.min(w), jnp.max(w))
    aqp = Q.set_quant_range(aspec, jnp.min(x), jnp.max(x))
    return x, w, b, wspec, aspec, wqp, aqp


class TestFusedKernel:
    def test_matches_xla_int_path(self):
        x, w, b, wspec, aspec, wqp, aqp = _setup()
        packed = IL.pack_weight_int8(wspec, wqp, w)
        y_pallas = fused_int8_linear(x, packed, aspec, aqp, bias=b,
                                     interpret=True)
        x8, s, shift = IL.quantize_activation_int8(aspec, aqp, x)
        y_xla = IL.int8_linear(x8, s, shift, packed, b, None)
        np.testing.assert_allclose(np.asarray(y_pallas), np.asarray(y_xla),
                                   rtol=1e-5, atol=1e-5)

    def test_fused_activation(self):
        x, w, b, wspec, aspec, wqp, aqp = _setup(seed=1)
        packed = IL.pack_weight_int8(wspec, wqp, w)
        y = fused_int8_linear(x, packed, aspec, aqp, bias=b,
                              activation="gelu", interpret=True)
        x8, s, shift = IL.quantize_activation_int8(aspec, aqp, x)
        y_ref = jax.nn.gelu(IL.int8_linear(x8, s, shift, packed, b, None),
                            approximate=False)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-5)

    def test_fused_output_site(self):
        x, w, b, wspec, aspec, wqp, aqp = _setup(seed=2)
        packed = IL.pack_weight_int8(wspec, wqp, w)
        x8, s, shift = IL.quantize_activation_int8(aspec, aqp, x)
        y_lin = IL.int8_linear(x8, s, shift, packed, b, None)
        out_spec = Q.QuantizerSpec(n_bits=8,
                                   method=QMethod.asymmetric_uniform)
        oqp = Q.set_quant_range(out_spec, jnp.min(y_lin), jnp.max(y_lin))
        y = fused_int8_linear(x, packed, aspec, aqp, bias=b,
                              out_spec=out_spec, out_qp=oqp, interpret=True)
        y_ref = Q.fake_quant(out_spec, oqp, y_lin)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-5)

    def test_per_tensor_weight_scale(self):
        x, w, b, wspec, aspec, wqp, aqp = _setup(seed=3, per_channel=False)
        packed = IL.pack_weight_int8(wspec, wqp, w)
        y = fused_int8_linear(x, packed, aspec, aqp, bias=b, interpret=True)
        x8, s, shift = IL.quantize_activation_int8(aspec, aqp, x)
        y_ref = IL.int8_linear(x8, s, shift, packed, b, None)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-5)

    def test_int4_matches_xla_int_path(self):
        x, w, b, wspec, aspec, wqp, aqp = _setup(seed=5)
        wspec4 = Q.QuantizerSpec(n_bits=4, method=QMethod.symmetric_uniform)
        wqp4 = Q.set_quant_range(wspec4, jnp.min(w, 1), jnp.max(w, 1))
        packed = IL.pack_weight_int4(wspec4, wqp4, w)
        y = fused_int8_linear(x, packed, aspec, aqp, bias=b, interpret=True)
        assert y is not None
        x8, s, shift = IL.quantize_activation_int8(aspec, aqp, x)
        y_ref = IL.int8_linear(x8, s, shift, packed, b, None)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-5)

    def test_rejects_unsupported(self):
        x, w, b, wspec, aspec, wqp, aqp = _setup(m=3)  # m too small/odd
        packed = IL.pack_weight_int8(wspec, wqp, w)
        assert fused_int8_linear(x, packed, aspec, aqp, interpret=True) is None
        packed4 = {"w_packed": jnp.zeros((4, 4), jnp.uint8)}
        x2, *_ = _setup()[0:1]
        assert fused_int8_linear(x2, packed4, aspec, aqp,
                                 interpret=True) is None


class TestPallasBert:
    def test_model_parity_with_fake_path(self):
        cfg = B.BertConfig(vocab_size=128, hidden_size=32,
                           num_hidden_layers=2, num_attention_heads=4,
                           intermediate_size=64, max_position_embeddings=64,
                           num_labels=2)
        params = B.init_bert_params(jax.random.PRNGKey(0), cfg)
        d = QuantDefaults(method=QMethod.symmetric_uniform,
                          act_method=QMethod.asymmetric_uniform, n_bits=8,
                          weight_range_method=RangeMethod.current_minmax,
                          act_range_method=RangeMethod.current_minmax)
        qcfg = B.declare_bert_sites(d, cfg)
        rng = np.random.RandomState(7)
        batch = {
            "input_ids": jnp.asarray(rng.randint(0, cfg.vocab_size, (4, 16))),
            "attention_mask": jnp.ones((4, 16), jnp.float32),
            "token_type_ids": jnp.zeros((4, 16), jnp.int32),
        }
        apply_fn = functools.partial(B.bert_apply, cfg=cfg)
        qstate, mode = prepare_quantized_model(
            apply_fn, params, qcfg, [batch],
            weight_tensors=B.bert_weight_site_tensors(params))
        int_params = B.build_bert_int_params(params, qcfg, qstate)

        out_fake, _ = B.bert_apply(params, batch, cfg, qcfg, qstate, mode)
        out_pl, _ = B.bert_apply(params, batch, cfg, qcfg, qstate, mode,
                                 int_params=int_params, use_pallas=True)
        np.testing.assert_allclose(np.asarray(out_pl["logits"]),
                                   np.asarray(out_fake["logits"]),
                                   rtol=1e-3, atol=1e-4)


class TestInt8Handoff:
    def test_kernel_emit_and_consume_payload(self):
        x, w, b, wspec, aspec, wqp, aqp = _setup(m=16, k=32, n=24, seed=9)
        packed = IL.pack_weight_int8(wspec, wqp, w)
        out_spec = Q.QuantizerSpec(n_bits=8,
                                   method=QMethod.asymmetric_uniform)
        x8, s, shift = IL.quantize_activation_int8(aspec, aqp, x)
        y_lin = IL.int8_linear(x8, s, shift, packed, b, None)
        oqp = Q.set_quant_range(out_spec, jnp.min(y_lin), jnp.max(y_lin))

        payload = fused_int8_linear(x, packed, aspec, aqp, bias=b,
                                    out_spec=out_spec, out_qp=oqp,
                                    emit_int8=True, interpret=True)
        assert payload.dtype == jnp.int8
        # payload must equal quantize_activation_int8(fake_quant(y))
        y_fq = Q.fake_quant(out_spec, oqp, y_lin)
        ref8, _, _ = IL.quantize_activation_int8(out_spec, oqp, y_fq)
        np.testing.assert_array_equal(np.asarray(payload), np.asarray(ref8))

        # consume the payload in a second layer: parity with float input
        rng = np.random.RandomState(10)
        w2 = jnp.asarray(rng.normal(0, 0.1, (8, 24)), jnp.float32)
        w2qp = Q.set_quant_range(wspec, jnp.min(w2, 1), jnp.max(w2, 1))
        packed2 = IL.pack_weight_int8(wspec, w2qp, w2)
        y2_pay = fused_int8_linear(payload, packed2, out_spec, oqp,
                                   interpret=True)
        y2_ref = fused_int8_linear(y_fq, packed2, out_spec, oqp,
                                   interpret=True)
        np.testing.assert_allclose(np.asarray(y2_pay), np.asarray(y2_ref),
                                   rtol=1e-5, atol=1e-5)

    def test_model_handoff_parity(self):
        cfg = B.BertConfig(vocab_size=128, hidden_size=32,
                           num_hidden_layers=2, num_attention_heads=4,
                           intermediate_size=64, max_position_embeddings=64,
                           num_labels=2)
        params = B.init_bert_params(jax.random.PRNGKey(3), cfg)
        d = QuantDefaults(method=QMethod.symmetric_uniform,
                          act_method=QMethod.asymmetric_uniform, n_bits=8,
                          weight_range_method=RangeMethod.current_minmax,
                          act_range_method=RangeMethod.current_minmax)
        qcfg = B.declare_bert_sites(d, cfg)
        rng = np.random.RandomState(11)
        batch = {
            "input_ids": jnp.asarray(rng.randint(0, 128, (4, 16))),
            "attention_mask": jnp.ones((4, 16), jnp.float32),
        }
        apply_fn = functools.partial(B.bert_apply, cfg=cfg)
        qstate, mode = prepare_quantized_model(
            apply_fn, params, qcfg, [batch],
            weight_tensors=B.bert_weight_site_tensors(params))
        int_params = B.build_bert_int_params(params, qcfg, qstate)
        out_ref, _ = B.bert_apply(params, batch, cfg, qcfg, qstate, mode,
                                  int_params=int_params)
        out_pl, ctx_state = B.bert_apply(params, batch, cfg, qcfg, qstate,
                                         mode, int_params=int_params,
                                         use_pallas=True)
        np.testing.assert_allclose(np.asarray(out_pl["logits"]),
                                   np.asarray(out_ref["logits"]),
                                   rtol=1e-4, atol=1e-5)
