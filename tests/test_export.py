"""AOT export (serving/export.py): the calibrated real-int forward as a
portable StableHLO artifact with a symbolic batch dimension. Round-trip
parity, multi-batch-size reuse, bucket padding, CLI --export-dir, and
serving from the artifact. No reference counterpart (the reference
re-builds torch module trees in-process every run)."""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer_quantization_tpu.models import bert as B
from transformer_quantization_tpu.quant.qconfig import QuantDefaults
from transformer_quantization_tpu.quant.quantizers import QMethod
from transformer_quantization_tpu.quant.ranges import RangeMethod
from transformer_quantization_tpu.serving import export as EX
from transformer_quantization_tpu.training.calibration import (
    prepare_quantized_model,
)

CFG = B.BertConfig(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                   num_attention_heads=2, intermediate_size=64,
                   max_position_embeddings=32, num_labels=2)


@pytest.fixture(scope="module")
def quantized():
    params = B.init_bert_params(jax.random.PRNGKey(0), CFG)
    d = QuantDefaults(method=QMethod.symmetric_uniform,
                      act_method=QMethod.asymmetric_uniform, n_bits=8,
                      weight_range_method=RangeMethod.current_minmax,
                      act_range_method=RangeMethod.current_minmax)
    qcfg = B.declare_bert_sites(d, CFG)
    rng = np.random.RandomState(0)
    cal = {"input_ids": jnp.asarray(rng.randint(0, 128, (4, 16)), jnp.int32),
           "attention_mask": jnp.ones((4, 16), jnp.float32)}
    apply_fn = functools.partial(B.bert_apply, cfg=CFG)
    qstate, mode = prepare_quantized_model(
        apply_fn, params, qcfg, [cal],
        weight_tensors=B.bert_weight_site_tensors(params))
    int_params = B.build_bert_int_params(params, qcfg, qstate)

    def fwd(ids, mask, tt):
        b = {"input_ids": ids, "attention_mask": mask, "token_type_ids": tt}
        out, _ = B.bert_apply(params, b, CFG, qcfg, qstate, mode,
                              int_params=int_params)
        return out["logits"]

    return params, qcfg, qstate, mode, int_params, fwd


def test_export_roundtrip_parity(quantized, tmp_path):
    params, qcfg, qstate, mode, int_params, fwd = quantized
    d = str(tmp_path / "exp")
    man = EX.save_export(d, fwd, seq_buckets=[16],
                         meta={"family": "bert", "num_labels": 2,
                               "vocab_size": 128})
    assert EX.is_export(d)
    assert man["seq_buckets"] == [16]
    model = EX.ExportedModel(d)

    rng = np.random.RandomState(1)
    for bsz in (1, 3, 8):  # symbolic batch: every size runs
        batch = {"input_ids": rng.randint(0, 128, (bsz, 16)).astype(np.int32),
                 "attention_mask": np.ones((bsz, 16), np.float32),
                 "token_type_ids": np.zeros((bsz, 16), np.int32)}
        got = model(batch)
        ref = fwd(jnp.asarray(batch["input_ids"]),
                  jnp.asarray(batch["attention_mask"]),
                  jnp.asarray(batch["token_type_ids"]))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)


def test_export_pads_to_bucket(quantized, tmp_path):
    *_, fwd = quantized
    d = str(tmp_path / "exp2")
    EX.save_export(d, fwd, seq_buckets=[8, 16], meta={"vocab_size": 128})
    model = EX.ExportedModel(d)
    rng = np.random.RandomState(2)
    ids = rng.randint(1, 128, (2, 11)).astype(np.int32)  # -> bucket 16
    got = model({"input_ids": ids,
                 "attention_mask": np.ones((2, 11), np.float32)})
    pad_ids = np.zeros((2, 16), np.int32)
    pad_ids[:, :11] = ids
    mask = np.zeros((2, 16), np.float32)
    mask[:, :11] = 1.0
    ref = fwd(jnp.asarray(pad_ids), jnp.asarray(mask),
              jnp.zeros((2, 16), jnp.int32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    with pytest.raises(ValueError, match="exceeds"):
        model.bucket_for(17)


def test_export_serving_engine(quantized, tmp_path):
    *_, fwd = quantized
    d = str(tmp_path / "exp3")
    EX.save_export(d, fwd, seq_buckets=[16], meta={"vocab_size": 128})
    from transformer_quantization_tpu.serving.server import (
        build_engine_from_export,
    )

    eng = build_engine_from_export(d)
    rng = np.random.RandomState(3)
    ids = rng.randint(4, 128, 10).astype(np.int32)
    with eng:
        logits = eng.submit_ids(ids).result(timeout=120)
    pad = np.zeros(16, np.int32)
    pad[:10] = ids
    mask = np.zeros(16, np.float32)
    mask[:10] = 1.0
    ref = fwd(jnp.asarray(pad)[None], jnp.asarray(mask)[None],
              jnp.zeros((1, 16), jnp.int32))
    np.testing.assert_allclose(logits, np.asarray(ref[0]),
                               rtol=1e-5, atol=1e-6)


def test_cli_export_dir(tmp_path):
    """validate-quantized --export-dir writes a loadable artifact whose
    logits match the CLI's own eval path."""
    from transformer_quantization_tpu import cli

    d = str(tmp_path / "cliexp")
    cli.main(["validate-quantized", "--task", "rte", "--synthetic-data",
              "--num-val-samples", "16", "--tiny-model", "--max-seq-length",
              "16", "--num-est-batches", "1", "--seed", "1000",
              "--weight-quant-method", "current_minmax",
              "--export-dir", d])
    exp_dir = os.path.join(d, "rte")
    assert EX.is_export(exp_dir)
    model = EX.ExportedModel(exp_dir)
    assert model.manifest["family"] == "bert"
    rng = np.random.RandomState(4)
    vocab = model.manifest["vocab_size"]
    out = model({"input_ids": rng.randint(0, vocab, (2, 16)).astype(np.int32),
                 "attention_mask": np.ones((2, 16), np.float32)})
    assert np.asarray(out).shape == (2, model.manifest["num_labels"])
    assert np.all(np.isfinite(np.asarray(out)))


def test_cli_export_dynamic_and_int4(tmp_path):
    """--export-dir composes with --dynamic (ranges re-estimated inside
    the exported program) and with W4 packed weights."""
    from transformer_quantization_tpu import cli

    for extra, tag in ([["--dynamic"], "dyn"],
                       [["--n-bits", "4"], "w4"]):
        d = str(tmp_path / f"exp_{tag}")
        cli.main(["validate-quantized", "--task", "rte", "--synthetic-data",
                  "--num-val-samples", "8", "--tiny-model",
                  "--max-seq-length", "16", "--num-est-batches", "1",
                  "--seed", "1000", "--weight-quant-method",
                  "current_minmax", "--export-dir", d, *extra])
        model = EX.ExportedModel(os.path.join(d, "rte"))
        rng = np.random.RandomState(5)
        out = model({"input_ids": rng.randint(
                         0, model.manifest["vocab_size"],
                         (3, 16)).astype(np.int32),
                     "attention_mask": np.ones((3, 16), np.float32)})
        assert np.asarray(out).shape[0] == 3
        assert np.all(np.isfinite(np.asarray(out)))


def test_export_engine_buckets_roundtrip(quantized, tmp_path):
    """Concrete (batch, seq) engine-bucket programs export alongside the
    generic artifact and are served preferentially (with batch padding up
    to the bucket); numerics match the in-process engine forward."""
    params, qcfg, qstate, mode, int_params, fwd = quantized
    static, plan, e_int = B.build_bert_engine(params, CFG, qcfg, qstate,
                                              int_params=int_params)

    def engine_fwd(ids, mask, tt):
        b = {"input_ids": ids, "attention_mask": mask,
             "token_type_ids": tt}
        return B.bert_engine_apply(params, b, CFG, qcfg, qstate, static,
                                   plan, e_int, backend="xla")["logits"]

    d = str(tmp_path / "expeng")
    man = EX.save_export(d, fwd, seq_buckets=[16],
                         engine_fwd=engine_fwd,
                         engine_batch_buckets=[4, 8],
                         meta={"family": "bert", "num_labels": 2,
                               "vocab_size": 128})
    assert man["engine_batch_buckets"] == [4, 8]
    assert os.path.exists(os.path.join(d, "b4seq16.engine.stablehlo"))
    model = EX.ExportedModel(d)
    assert model._engine_fns  # platform matches (cpu export, cpu runtime)

    rng = np.random.RandomState(7)
    batch = {"input_ids": jnp.asarray(rng.randint(0, 128, (3, 12)),
                                      jnp.int32),
             "attention_mask": jnp.ones((3, 12), jnp.float32)}
    out = np.asarray(model(batch))
    assert out.shape == (3, 2)  # batch padded to 4, sliced back

    ids = jnp.pad(batch["input_ids"], ((0, 1), (0, 4)))
    mask = jnp.pad(batch["attention_mask"], ((0, 1), (0, 4)))
    ref = np.asarray(engine_fwd(ids, mask, jnp.zeros((4, 16), jnp.int32)))
    np.testing.assert_allclose(out, ref[:3], rtol=1e-5, atol=1e-5)

    # oversized batches fall back to the generic symbolic-batch program
    big = {"input_ids": jnp.asarray(rng.randint(0, 128, (16, 16)),
                                    jnp.int32),
           "attention_mask": jnp.ones((16, 16), jnp.float32)}
    out_big = np.asarray(model(big))
    assert out_big.shape == (16, 2)


def test_export_manifest_honest_without_engine(quantized, tmp_path):
    """No engine_fwd -> the manifest must not claim engine buckets."""
    params, qcfg, qstate, mode, int_params, fwd = quantized
    d = str(tmp_path / "noeng")
    man = EX.save_export(d, fwd, seq_buckets=[16],
                         engine_batch_buckets=[4],  # ignored: no engine_fwd
                         meta={"family": "bert", "num_labels": 2,
                               "vocab_size": 128})
    assert man["engine_batch_buckets"] == []
    assert not [f for f in os.listdir(d) if f.endswith(".engine.stablehlo")]
    model = EX.ExportedModel(d)
    assert not model._engine_fns
