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


class _StubWriter:
    def __init__(self):
        self.scalars = []
        self.hists = []

    def scalar(self, tag, value, step=0):
        self.scalars.append((tag, value, step))

    def histogram(self, tag, values, step=0):
        self.hists.append((tag, np.asarray(values).shape, step))


def test_write_residual_histograms():
    """In-forward residual histograms (tb_utils.py:26-52 equivalent):
    per-tensor + per-token entries for every *.res site."""
    apply_fn, params, qcfg, qstate, batch = _calibrated()
    w = _StubWriter()
    written = T.write_residual_histograms(apply_fn, params, qcfg, qstate,
                                          batch, w, step=3)
    assert set(written) == set(T.residual_sites(qcfg))
    assert len(written) == 2  # attn_out.res + ffn.res for 1 layer
    layer_tags = [t for t, _, s in w.hists if t.endswith("/layer")]
    assert len(layer_tags) == 2
    assert all(s == 3 for t, _, s in w.hists if t.endswith("/layer"))
    # per-token: T histograms per site, token index as step
    tok = [(t, s) for t, _, s in w.hists if t.endswith("/token")]
    assert len(tok) == 2 * 8
    assert {s for _, s in tok} == set(range(8))


def test_trainer_mid_train_eval_and_save_cadence():
    from transformer_quantization_tpu.training import trainer as TR
    from transformer_quantization_tpu.utils.glue import resolve_tasks

    apply_fn, params, qcfg, qstate, _ = _calibrated()
    rng = np.random.RandomState(0)
    n = 32
    arrays = {
        "input_ids": rng.randint(0, 64, (n, 8)).astype(np.int32),
        "attention_mask": np.ones((n, 8), np.float32),
        "token_type_ids": np.zeros((n, 8), np.int32),
        "labels": rng.randint(0, 2, (n,)).astype(np.int32),
        "example_mask": np.ones((n,), np.int32),
    }
    task = resolve_tasks(["rte"])[0]
    saves, logs = [], []
    w = _StubWriter()
    tcfg = TR.TrainConfig(num_epochs=1, batch_size=8, log_every=2,
                          eval_every=2, save_every=3, eval_batch_size=8,
                          seed=0)
    TR.train(apply_fn, params, task, arrays, tcfg, qcfg=qcfg, qstate=qstate,
             eval_arrays=arrays, log_fn=logs.append, tb_writer=w,
             save_fn=lambda p, qs, s: saves.append(s))
    # 4 steps total: eval at 2,4; save at 3; loss scalars at 1(first),2,4
    assert saves == [3]
    assert any("[step 2] eval:" in m for m in logs)
    assert any(t == "train/loss" for t, _, _ in w.scalars)
    assert any(t.startswith("eval/") for t, _, _ in w.scalars)
