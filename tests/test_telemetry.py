"""Observability: range summaries, clip rates, activation fingerprints
(reference C35 tb_utils + the quantizers.py:163-170 clamped stat)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from transformer_quantization_tpu.models import bert as B
from transformer_quantization_tpu.quant import quantizers as Q
from transformer_quantization_tpu.quant.qconfig import QuantDefaults
from transformer_quantization_tpu.quant.quantizers import QMethod
from transformer_quantization_tpu.quant.ranges import RangeMethod
from transformer_quantization_tpu.training.calibration import (
    prepare_quantized_model,
)
from transformer_quantization_tpu.utils import telemetry as T

CFG = B.BertConfig(vocab_size=64, hidden_size=16, num_hidden_layers=1,
                   num_attention_heads=2, intermediate_size=32,
                   max_position_embeddings=32, num_labels=2)


def _calibrated():
    params = B.init_bert_params(jax.random.PRNGKey(0), CFG)
    d = QuantDefaults(method=QMethod.symmetric_uniform,
                      act_method=QMethod.asymmetric_uniform, n_bits=8,
                      weight_range_method=RangeMethod.current_minmax,
                      act_range_method=RangeMethod.current_minmax)
    qcfg = B.declare_bert_sites(d, CFG)
    rng = np.random.RandomState(0)
    batch = {"input_ids": jnp.asarray(rng.randint(0, 64, (2, 8)), jnp.int32),
             "attention_mask": jnp.ones((2, 8), jnp.float32)}
    apply_fn = functools.partial(B.bert_apply, cfg=CFG)
    qstate, mode = prepare_quantized_model(
        apply_fn, params, qcfg, [batch],
        weight_tensors=B.bert_weight_site_tensors(params))
    return apply_fn, params, qcfg, qstate, batch


def test_range_summary_covers_sites():
    _, params, qcfg, qstate, _ = _calibrated()
    s = T.range_summary(qcfg, qstate)
    assert "L0.attn.q.w" in s and "L0.ffn.res" in s
    e = s["L0.ffn.res"]
    assert e["n_bits"] == 8 and e["kind"] == "act"
    assert e["x_max"] >= e["x_min"]


def test_clipped_fraction():
    spec = Q.QuantizerSpec(n_bits=8, method=QMethod.asymmetric_uniform)
    qp = Q.set_quant_range(spec, jnp.asarray(-1.0), jnp.asarray(1.0))
    x = jnp.asarray([-2.0, -0.5, 0.0, 0.5, 2.0, 3.0])
    frac = T.clipped_fraction(spec, qp, x)
    assert abs(frac - 3 / 6) < 1e-6


def test_activation_report():
    apply_fn, params, qcfg, qstate, batch = _calibrated()
    sites = ("L0.ffn.dense", "L0.attn_out.ln")
    rep = T.activation_report(apply_fn, params, qcfg, qstate, batch, sites)
    assert set(rep) == set(sites)
    e = rep["L0.ffn.dense"]
    assert len(e["per_token_max_abs"]) == 8  # per token position
    assert sum(e["hist"]["counts"]) == int(np.prod(e["shape"]))
    assert 0.0 <= e["clipped_fraction"] <= 1.0


def test_tb_writer(tmp_path):
    _, params, qcfg, qstate, _ = _calibrated()
    w = T.TBWriter(str(tmp_path / "tb"))
    w.scalar("eval/score", 0.8, 1)
    w.histogram("acts/res", np.random.RandomState(0).normal(size=100), 1)
    w.write_range_summary(qcfg, qstate)
    w.close()
    import os

    files = os.listdir(tmp_path / "tb")
    assert files  # events file (TB or JSONL) exists
