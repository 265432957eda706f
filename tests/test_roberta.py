"""RoBERTa family (SURVEY.md C25): position ids, head, PTQ flow."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from transformer_quantization_tpu.models import roberta as R
from transformer_quantization_tpu.models.registry import build_model, get_family
from transformer_quantization_tpu.quant.qconfig import QuantDefaults
from transformer_quantization_tpu.quant.quantizers import QMethod
from transformer_quantization_tpu.quant.ranges import RangeMethod
from transformer_quantization_tpu.training.calibration import (
    prepare_quantized_model,
)

CFG = R.RobertaConfig(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=64,
                      max_position_embeddings=66, num_labels=2)


def make_batch(rng, bsz=4, seq=16, pad_from=12):
    ids = rng.randint(2, CFG.vocab_size, (bsz, seq))
    mask = np.ones((bsz, seq), np.float32)
    ids[:, pad_from:] = CFG.pad_token_id
    mask[:, pad_from:] = 0.0
    return {"input_ids": jnp.asarray(ids, jnp.int32),
            "attention_mask": jnp.asarray(mask)}


def test_position_ids_from_mask():
    ids = jnp.asarray([[5, 7, 9, 1, 1], [1, 4, 1, 6, 1]], jnp.int32)
    pos = R.create_position_ids_from_input_ids(ids, padding_idx=1)
    # non-pad tokens numbered padding_idx+1.. in order; pads stay at 1
    np.testing.assert_array_equal(
        np.asarray(pos), [[2, 3, 4, 1, 1], [1, 2, 1, 3, 1]])


def test_fp32_forward_and_loss():
    params = R.init_roberta_params(jax.random.PRNGKey(0), CFG)
    batch = make_batch(np.random.RandomState(0))
    batch["labels"] = jnp.asarray([0, 1, 0, 1], jnp.int32)
    out, _ = R.roberta_apply(params, batch, CFG)
    assert out["logits"].shape == (4, 2)
    assert np.isfinite(float(out["loss"]))


def test_site_inventory_and_head_sites():
    d = QuantDefaults()
    qcfg = R.declare_roberta_sites(d, CFG)
    assert "clf.dense.w" in qcfg and "clf.out_proj.out" in qcfg
    assert "pooler.dense.w" not in qcfg
    # FP_logits disables only the logits site
    qcfg_fp = R.declare_roberta_sites(d, CFG, quant_setup="FP_logits")
    assert not qcfg_fp["clf.out_proj.out"].enabled
    assert qcfg_fp["clf.dense.out"].enabled


def test_quant_dict_head_keys():
    d = QuantDefaults()
    qcfg = R.declare_roberta_sites(d, CFG)
    qcfg = R.apply_roberta_quant_dict(
        qcfg, {"y": 16, "C": "fp32", "wC": 2}, CFG.num_hidden_layers)
    assert qcfg["L0.ffn.res"].spec.n_bits == 16
    assert not qcfg["clf.out_proj.out"].enabled
    assert qcfg["clf.out_proj.w"].spec.n_bits == 2


def test_ptq_flow_and_int_parity():
    params = R.init_roberta_params(jax.random.PRNGKey(1), CFG)
    d = QuantDefaults(method=QMethod.symmetric_uniform,
                      act_method=QMethod.asymmetric_uniform, n_bits=8,
                      weight_range_method=RangeMethod.current_minmax,
                      act_range_method=RangeMethod.current_minmax)
    qcfg = R.declare_roberta_sites(d, CFG)
    batch = make_batch(np.random.RandomState(1))
    apply_fn = functools.partial(R.roberta_apply, cfg=CFG)
    qstate, mode = prepare_quantized_model(
        apply_fn, params, qcfg, [batch],
        weight_tensors=R.roberta_weight_site_tensors(params))

    out_fp, _ = R.roberta_apply(params, batch, CFG)
    out_q, _ = R.roberta_apply(params, batch, CFG, qcfg, qstate, mode)
    # quantization is active but not absurd
    dq = float(jnp.max(jnp.abs(out_q["logits"] - out_fp["logits"])))
    assert 0.0 < dq < 5.0

    int_params = R.build_roberta_int_params(params, qcfg, qstate)
    assert "clf.dense" in int_params and "L0.attn.q" in int_params
    out_int, _ = R.roberta_apply(params, batch, CFG, qcfg, qstate, mode,
                                 int_params=int_params)
    np.testing.assert_allclose(np.asarray(out_int["logits"]),
                               np.asarray(out_q["logits"]),
                               rtol=1e-3, atol=1e-4)


def test_registry_build():
    fam, cfg, params = build_model("distilroberta_base", tiny=True)
    assert fam.name == "roberta"
    assert "out_proj" in params["classifier"]
    fam2 = get_family("bert_large_uncased")
    assert fam2.name == "bert"


def test_adaround_specs_order():
    params = R.init_roberta_params(jax.random.PRNGKey(2), CFG)
    names = [n for n, _ in R.roberta_adaround_specs(params, CFG)]
    assert names[0] == "emb.word"
    assert names[-2:] == ["clf.dense", "clf.out_proj"]
