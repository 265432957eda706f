"""scan-over-layers: the encoder stack as ONE lax.scan iteration
(depth-independent compile time) must match the python loop exactly."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from transformer_quantization_tpu.models import bert as B
from transformer_quantization_tpu.quant.manager import init_weight_qstate
from transformer_quantization_tpu.quant.qconfig import QuantDefaults
from transformer_quantization_tpu.quant.quantizers import QMethod
from transformer_quantization_tpu.quant.ranges import RangeMethod
from transformer_quantization_tpu.training import qat as QAT
from transformer_quantization_tpu.training.calibration import (
    prepare_quantized_model,
)

CFG = B.BertConfig(vocab_size=128, hidden_size=32, num_hidden_layers=3,
                   num_attention_heads=4, intermediate_size=64,
                   max_position_embeddings=64, num_labels=2)


def _defaults():
    return QuantDefaults(method=QMethod.symmetric_uniform,
                         act_method=QMethod.asymmetric_uniform, n_bits=8,
                         weight_range_method=RangeMethod.current_minmax,
                         act_range_method=RangeMethod.current_minmax)


def _batch(rng, labels=False):
    b = {"input_ids": jnp.asarray(rng.randint(2, 128, (4, 16)), jnp.int32),
         "attention_mask": jnp.ones((4, 16), jnp.float32)}
    if labels:
        b["labels"] = jnp.asarray(rng.randint(0, 2, (4,)), jnp.int32)
    return b


def test_scan_eval_matches_loop():
    params = B.init_bert_params(jax.random.PRNGKey(0), CFG)
    qcfg = B.declare_bert_sites(_defaults(), CFG)
    rng = np.random.RandomState(0)
    batch = _batch(rng)
    apply_fn = functools.partial(B.bert_apply, cfg=CFG)
    qstate, mode = prepare_quantized_model(
        apply_fn, params, qcfg, [batch],
        weight_tensors=B.bert_weight_site_tensors(params))
    out_loop, _ = B.bert_apply(params, batch, CFG, qcfg, qstate, mode)
    out_scan, _ = B.bert_apply(params, batch, CFG, qcfg, qstate, mode,
                               scan_layers=True)
    np.testing.assert_allclose(np.asarray(out_scan["logits"]),
                               np.asarray(out_loop["logits"]),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("learn_ranges,remat", [(False, False),
                                                (True, False),
                                                (False, True)])
def test_scan_qat_step_matches_loop(learn_ranges, remat):
    """One QAT train step under scan: same loss, same updated params,
    same threaded quant state as the loop (estimate-phase range updates
    thread through the scan carry/ys)."""
    params = B.init_bert_params(jax.random.PRNGKey(0), CFG)
    qcfg = B.declare_bert_sites(_defaults(), CFG)
    qstate0 = init_weight_qstate(qcfg, B.bert_weight_site_tensors(params))
    rng = np.random.RandomState(1)
    batch = _batch(rng, labels=True)
    apply_fn = functools.partial(B.bert_apply, cfg=CFG)
    if learn_ranges:
        # learned ranges need calibrated act sites up front
        qstate0, _ = prepare_quantized_model(
            apply_fn, params, qcfg, [_batch(np.random.RandomState(2))],
            weight_tensors=B.bert_weight_site_tensors(params))
    tx = optax.adamw(1e-4)

    outs = {}
    for scan in (False, True):
        qat_cfg = QAT.QATConfig(learn_ranges=learn_ranges, remat=remat,
                                scan_layers=scan)
        step = QAT.make_qat_train_step(apply_fn, qcfg, qat_cfg, tx,
                                       donate=False)
        p, learnable, rest, opt = QAT.init_qat_state(
            qcfg, qat_cfg, params, dict(qstate0), tx)
        out = step(p, learnable, rest, opt, batch, jax.random.PRNGKey(0))
        outs[scan] = out
    loss_l, loss_s = float(outs[False][-1]), float(outs[True][-1])
    np.testing.assert_allclose(loss_s, loss_l, rtol=1e-6)
    # scan (no --remat) runs under a save-dots checkpoint policy
    # (models/bert.py scan_layer_stack): recomputed elementwise chains may
    # fuse/reassociate differently than the loop's saved values, so grads
    # match to an ulp, not bit-for-bit — hence atol 1e-6.
    for a, b in zip(jax.tree.leaves(outs[True][0]),
                    jax.tree.leaves(outs[False][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    qs_s = QAT.merge_learnable_ranges(outs[True][1], outs[True][2])
    qs_l = QAT.merge_learnable_ranges(outs[False][1], outs[False][2])
    assert set(qs_s) == set(qs_l)
    for name in qs_l:
        for a, b in zip(jax.tree.leaves(qs_s[name]),
                        jax.tree.leaves(qs_l[name])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


def test_scan_gates_off_on_per_layer_overrides():
    """quant_dict per-layer overrides make layers non-interchangeable:
    scan must fall back to the loop (and still be correct)."""
    params = B.init_bert_params(jax.random.PRNGKey(0), CFG)
    qcfg = B.declare_bert_sites(_defaults(), CFG)
    qcfg = B.apply_bert_quant_dict(qcfg, {"y1": 16}, CFG.num_hidden_layers)
    rng = np.random.RandomState(3)
    batch = _batch(rng)
    apply_fn = functools.partial(B.bert_apply, cfg=CFG)
    qstate, mode = prepare_quantized_model(
        apply_fn, params, qcfg, [batch],
        weight_tensors=B.bert_weight_site_tensors(params))
    ctx = B.make_ctx(qcfg, qstate, mode)
    assert not B.can_scan_encoder(ctx, CFG)
    out_loop, _ = B.bert_apply(params, batch, CFG, qcfg, qstate, mode)
    out_scan, _ = B.bert_apply(params, batch, CFG, qcfg, qstate, mode,
                               scan_layers=True)
    np.testing.assert_array_equal(np.asarray(out_scan["logits"]),
                                  np.asarray(out_loop["logits"]))


def test_albert_scan_matches_loop():
    """ALBERT's shared layer scans with the quant state in the CARRY
    (sequential shared-site updates, like the loop)."""
    from transformer_quantization_tpu.models.registry import build_model

    fam, cfg, params = build_model("albert_base_v2", tiny=True, seed=0)
    qcfg = fam.declare_sites(_defaults(), cfg)
    rng = np.random.RandomState(5)
    batch = {"input_ids": jnp.asarray(rng.randint(2, cfg.vocab_size, (4, 16)),
                                      jnp.int32),
             "attention_mask": jnp.ones((4, 16), jnp.float32)}
    apply_fn = functools.partial(fam.apply, cfg=cfg)
    qstate, mode = prepare_quantized_model(
        apply_fn, params, qcfg, [batch],
        weight_tensors=fam.weight_site_tensors(params))
    out_loop, qs_loop = fam.apply(params, batch, cfg, qcfg, qstate, mode)
    out_scan, qs_scan = fam.apply(params, batch, cfg, qcfg, qstate, mode,
                                  scan_layers=True)
    np.testing.assert_allclose(np.asarray(out_scan["logits"]),
                               np.asarray(out_loop["logits"]),
                               rtol=1e-6, atol=1e-6)

    # estimate phase: the threaded shared-site states must match too
    from transformer_quantization_tpu.quant.qconfig import Phase, QuantMode
    est = QuantMode(act_phase=Phase.estimate)
    _, qs_l = fam.apply(params, batch, cfg, qcfg, qstate, est)
    _, qs_s = fam.apply(params, batch, cfg, qcfg, qstate, est,
                        scan_layers=True)
    for name in qs_l:
        for a, b in zip(jax.tree.leaves(qs_l[name]),
                        jax.tree.leaves(qs_s[name])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("model_name", ["mobilebert_uncased",
                                        "squeezebert_uncased"])
def test_family_scan_matches_loop(model_name):
    from transformer_quantization_tpu.models.registry import build_model

    fam, cfg, params = build_model(model_name, tiny=True, seed=0)
    qcfg = fam.declare_sites(_defaults(), cfg)
    rng = np.random.RandomState(6)
    batch = {"input_ids": jnp.asarray(rng.randint(2, cfg.vocab_size, (4, 16)),
                                      jnp.int32),
             "attention_mask": jnp.ones((4, 16), jnp.float32)}
    apply_fn = functools.partial(fam.apply, cfg=cfg)
    qstate, mode = prepare_quantized_model(
        apply_fn, params, qcfg, [batch],
        weight_tensors=fam.weight_site_tensors(params))
    out_loop, _ = fam.apply(params, batch, cfg, qcfg, qstate, mode)
    out_scan, _ = fam.apply(params, batch, cfg, qcfg, qstate, mode,
                            scan_layers=True)
    np.testing.assert_allclose(np.asarray(out_scan["logits"]),
                               np.asarray(out_loop["logits"]),
                               rtol=1e-6, atol=1e-6)
