"""Quantized BERT model tests on a tiny config (SURVEY.md §4)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer_quantization_tpu.models import bert as B
from transformer_quantization_tpu.quant.qconfig import (
    Phase,
    QuantDefaults,
    QuantMode,
)
from transformer_quantization_tpu.quant.quantizers import QMethod
from transformer_quantization_tpu.quant.ranges import RangeMethod
from transformer_quantization_tpu.training.calibration import (
    prepare_quantized_model,
)

CFG = B.BertConfig(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                   num_attention_heads=4, intermediate_size=64,
                   max_position_embeddings=64, num_labels=2)


@pytest.fixture(scope="module")
def params():
    return B.init_bert_params(jax.random.PRNGKey(0), CFG)


def make_batch(rng, bsz=4, seq=16, labels=True):
    batch = {
        "input_ids": jnp.asarray(rng.randint(0, CFG.vocab_size, (bsz, seq))),
        "attention_mask": jnp.asarray(
            (np.arange(seq)[None, :] < rng.randint(4, seq + 1, (bsz, 1)))
            .astype(np.float32)),
        "token_type_ids": jnp.zeros((bsz, seq), jnp.int32),
    }
    if labels:
        batch["labels"] = jnp.asarray(rng.randint(0, 2, (bsz,)))
    return batch


def defaults(**kw):
    base = dict(method=QMethod.symmetric_uniform,
                act_method=QMethod.asymmetric_uniform, n_bits=8,
                weight_range_method=RangeMethod.current_minmax,
                act_range_method=RangeMethod.current_minmax)
    base.update(kw)
    return QuantDefaults(**base)


class TestFP32Baseline:
    def test_forward_shapes_and_loss(self, params):
        rng = np.random.RandomState(0)
        out, _ = B.bert_apply(params, make_batch(rng), CFG)
        assert out["logits"].shape == (4, 2)
        assert np.isfinite(float(out["loss"]))

    def test_mask_invariance(self, params):
        # padding tokens must not affect logits
        rng = np.random.RandomState(1)
        batch = make_batch(rng, labels=False)
        out1, _ = B.bert_apply(params, batch, CFG)
        ids2 = np.asarray(batch["input_ids"]).copy()
        mask = np.asarray(batch["attention_mask"])
        ids2[mask == 0] = 7  # scribble on padding
        batch2 = dict(batch, input_ids=jnp.asarray(ids2))
        out2, _ = B.bert_apply(params, batch2, CFG)
        np.testing.assert_allclose(np.asarray(out1["logits"]),
                                   np.asarray(out2["logits"]), atol=1e-5)


class TestQuantizedBert:
    def test_w8a8_ptq_close_to_fp(self, params):
        qcfg = B.declare_bert_sites(defaults(), CFG)
        rng = np.random.RandomState(2)
        batches = [make_batch(rng, labels=False) for _ in range(2)]
        apply_fn = functools.partial(B.bert_apply, cfg=CFG)
        qstate, mode = prepare_quantized_model(
            apply_fn, params, qcfg, batches,
            weight_tensors=B.bert_weight_site_tensors(params), num_batches=2)
        test_batch = make_batch(np.random.RandomState(3), labels=False)
        out_q, _ = B.bert_apply(params, test_batch, CFG, qcfg, qstate, mode)
        out_fp, _ = B.bert_apply(params, test_batch, CFG)

        def rel(k):
            return float(jnp.linalg.norm(out_q[k] - out_fp[k])
                         / (jnp.linalg.norm(out_fp[k]) + 1e-9))

        # random-init logits are ~1e-2 in magnitude, so measure drift where
        # the scale is meaningful and bound logits by absolute error
        assert rel("sequence_output") < 0.1, rel("sequence_output")
        assert rel("pooled") < 0.25, rel("pooled")
        logit_atol = float(jnp.max(jnp.abs(out_q["logits"]
                                           - out_fp["logits"])))
        assert logit_atol < 0.02, logit_atol

    def test_all_sites_visited(self, params):
        # every declared site must appear in the calibrated qstate
        qcfg = B.declare_bert_sites(defaults(), CFG)
        rng = np.random.RandomState(4)
        apply_fn = functools.partial(B.bert_apply, cfg=CFG)
        qstate, _ = prepare_quantized_model(
            apply_fn, params, qcfg, [make_batch(rng, labels=False)],
            weight_tensors=B.bert_weight_site_tensors(params))
        missing = [n for n in qcfg.names() if n not in qstate]
        assert not missing, f"sites never exercised: {missing}"

    def test_fixed_eval_jits(self, params):
        qcfg = B.declare_bert_sites(defaults(), CFG)
        rng = np.random.RandomState(5)
        apply_fn = functools.partial(B.bert_apply, cfg=CFG)
        qstate, mode = prepare_quantized_model(
            apply_fn, params, qcfg, [make_batch(rng, labels=False)],
            weight_tensors=B.bert_weight_site_tensors(params))

        @functools.partial(jax.jit, static_argnums=(3,))
        def eval_step(params, batch, qstate, mode):
            out, _ = B.bert_apply(params, batch, CFG, qcfg, qstate, mode)
            return out["logits"]

        batch = make_batch(np.random.RandomState(6), labels=False)
        jitted = eval_step(params, batch, qstate, mode)
        eager, _ = B.bert_apply(params, batch, CFG, qcfg, qstate, mode)
        np.testing.assert_allclose(np.asarray(jitted),
                                   np.asarray(eager["logits"]), atol=1e-5)

    def test_quant_setups(self, params):
        qcfg_fp = B.declare_bert_sites(defaults(), CFG, quant_setup="FP_logits")
        assert not qcfg_fp["classifier.out"].enabled
        qcfg_mse = B.declare_bert_sites(defaults(), CFG,
                                        quant_setup="MSE_logits")
        assert qcfg_mse["classifier.out"].range_cfg.method == RangeMethod.MSE
        with pytest.raises(ValueError):
            B.declare_bert_sites(defaults(), CFG, quant_setup="bogus")


class TestQuantDict:
    def test_key_language(self):
        qcfg = B.declare_bert_sites(defaults(), CFG, quant_dict={"Et": 2})
        assert qcfg["emb.word.w"].range_cfg.method == RangeMethod.MSE
        qd = {"y": 16, "s1": "fp32", "x": "ng4", "Et": 2, "C": "fp32"}
        qcfg = B.apply_bert_quant_dict(qcfg, qd, CFG.num_hidden_layers)
        assert qcfg["L0.ffn.res"].spec.n_bits == 16
        assert qcfg["L1.ffn.res"].spec.n_bits == 16
        assert not qcfg["L1.attn.scores"].enabled
        assert qcfg["L0.attn.scores"].enabled
        assert qcfg["L0.attn_out.ln.out"].n_groups == 4
        assert qcfg["L0.attn_out.ln.out"].axis == 2
        assert qcfg["emb.word.w"].spec.n_bits == 2
        assert not qcfg["classifier.out"].enabled

    def test_global_overrides_per_layer(self):
        # reference applies per-layer then global — global wins
        qcfg = B.declare_bert_sites(defaults(), CFG)
        qcfg = B.apply_bert_quant_dict(qcfg, {"s0": 4, "s": 16},
                                       CFG.num_hidden_layers)
        assert qcfg["L0.attn.scores"].spec.n_bits == 16

    def test_unknown_key_rejected(self):
        qcfg = B.declare_bert_sites(defaults(), CFG)
        with pytest.raises(KeyError):
            B.apply_bert_quant_dict(qcfg, {"qq": 8}, CFG.num_hidden_layers)

    def test_layer_wide_key(self):
        qcfg = B.declare_bert_sites(defaults(), CFG)
        qcfg = B.apply_bert_quant_dict(qcfg, {"L0": 16},
                                       CFG.num_hidden_layers)
        assert qcfg["L0.attn.probs"].spec.n_bits == 16
        assert qcfg["L0.ffn.inter.out"].spec.n_bits == 16
        assert qcfg["L1.attn.probs"].spec.n_bits == 8


class TestPEG:
    def test_wiring(self):
        qcfg = B.declare_bert_sites(defaults(), CFG)
        qcfg = B.apply_peg_wiring(qcfg, CFG.num_hidden_layers, per_groups=4,
                                  permute=True)
        site = qcfg["L0.ffn.res"]
        assert site.axis == 2 and site.n_groups == 4 and site.permute
        assert qcfg["L0.attn.scores"].axis is None  # not wired
        assert qcfg["pooler.dense.out"].axis is None  # only for per_embd

    def test_per_token(self):
        qcfg = B.declare_bert_sites(defaults(), CFG)
        qcfg = B.apply_peg_wiring(qcfg, CFG.num_hidden_layers, per_token=True)
        assert qcfg["L0.ffn.res"].axis == 1

    def test_end_to_end_with_permutation(self, params):
        qcfg = B.declare_bert_sites(defaults(), CFG)
        qcfg = B.apply_peg_wiring(qcfg, CFG.num_hidden_layers, per_groups=4,
                                  permute=True)
        rng = np.random.RandomState(7)
        batches = [make_batch(rng, labels=False) for _ in range(2)]
        apply_fn = functools.partial(B.bert_apply, cfg=CFG)
        qstate, mode = prepare_quantized_model(
            apply_fn, params, qcfg, batches,
            weight_tensors=B.bert_weight_site_tensors(params), num_batches=2,
            shared_groups=B.shared_permutation_groups(CFG.num_hidden_layers))
        st = qstate["L0.ffn.res"]
        assert st["perm"].shape == (CFG.hidden_size,)
        assert sorted(np.asarray(st["perm"]).tolist()) == list(
            range(CFG.hidden_size))
        out, _ = B.bert_apply(params, batches[0], CFG, qcfg, qstate, mode)
        assert np.all(np.isfinite(np.asarray(out["logits"])))


class TestCapture:
    def test_adaround_style_capture(self, params):
        rng = np.random.RandomState(8)
        batch = make_batch(rng, labels=False)
        out, _ = B.bert_apply(params, batch, CFG,
                              capture_sites=["L0.ffn.inter"])
        (x, y) = out["captures"]["L0.ffn.inter"]
        assert x.shape == (4, 16, CFG.hidden_size)
        assert y.shape == (4, 16, CFG.intermediate_size)
        # captured output includes the fused GELU (include_act_func=True)
        w = params["layers"][0]["ffn"]["inter"]["kernel"]
        b = params["layers"][0]["ffn"]["inter"]["bias"]
        expect = jax.nn.gelu(jnp.einsum("bti,oi->bto", x, w) + b,
                             approximate=False)
        np.testing.assert_allclose(np.asarray(y), np.asarray(expect),
                                   atol=1e-5)


class TestDynamicQuantization:
    """--dynamic / --per-token: ranges estimated per batch inside the jitted
    eval step, never fixed (transformer_click_options.py:438-443; the
    per-token axis wiring is main.py:358-376)."""

    def test_dynamic_eval_jits_and_adapts(self, params):
        from transformer_quantization_tpu.quant.manager import (
            init_weight_qstate,
        )

        qcfg = B.declare_bert_sites(defaults(), CFG)
        qstate = init_weight_qstate(qcfg, B.bert_weight_site_tensors(params))
        mode = QuantMode(weight_quant=True, act_quant=True,
                         weight_phase=Phase.fix, act_phase=Phase.estimate)
        rng = np.random.RandomState(0)
        b1, b2 = make_batch(rng, labels=False), make_batch(rng, labels=False)
        # seed act state eagerly on one batch (shapes), then jit
        _, qstate = B.bert_apply(params, b1, CFG, qcfg, qstate, mode)

        @functools.partial(jax.jit, static_argnums=(2,))
        def step(batch, qstate, mode):
            out, qs = B.bert_apply(params, batch, CFG, qcfg, qstate, mode)
            return out["logits"], qs

        l1, qs1 = step(b1, qstate, mode)
        l2, qs2 = step(b2, qstate, mode)
        assert np.all(np.isfinite(np.asarray(l1)))
        # per-batch ranges: the dynamic state actually moved between batches
        d1 = qs1["L0.ffn.res"]["qp"].delta
        d2 = qs2["L0.ffn.res"]["qp"].delta
        assert not np.allclose(np.asarray(d1), np.asarray(d2))

    def test_per_token_dynamic(self, params):
        from transformer_quantization_tpu.quant.manager import (
            init_weight_qstate,
        )

        qcfg = B.declare_bert_sites(defaults(), CFG)
        qcfg = B.apply_peg_wiring(qcfg, CFG.num_hidden_layers, per_token=True)
        assert qcfg["L0.ffn.res"].axis == 1
        qstate = init_weight_qstate(qcfg, B.bert_weight_site_tensors(params))
        mode = QuantMode(weight_quant=True, act_quant=True,
                         weight_phase=Phase.fix, act_phase=Phase.estimate)
        batch = make_batch(np.random.RandomState(1), labels=False)
        out, qs = B.bert_apply(params, batch, CFG, qcfg, qstate, mode)
        assert np.all(np.isfinite(np.asarray(out["logits"])))
        # per-token quantization: one range per sequence position
        assert qs["L0.ffn.res"]["qp"].delta.shape == (16,)
