"""Serving engine: dynamic batching, bucketing, latency/throughput metering
(SURVEY.md §2.6 serving row — capability absent in the reference)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from transformer_quantization_tpu.models import bert as B
from transformer_quantization_tpu.quant.qconfig import QuantDefaults
from transformer_quantization_tpu.quant.quantizers import QMethod
from transformer_quantization_tpu.quant.ranges import RangeMethod
from transformer_quantization_tpu.serving import ServeConfig, ServingEngine
from transformer_quantization_tpu.training.calibration import (
    prepare_quantized_model,
)
from transformer_quantization_tpu.utils.data import SyntheticTokenizer

CFG = B.BertConfig(vocab_size=256, hidden_size=32, num_hidden_layers=2,
                   num_attention_heads=4, intermediate_size=64,
                   max_position_embeddings=64, num_labels=2)


def _engine(int_path=True):
    params = B.init_bert_params(jax.random.PRNGKey(0), CFG)
    d = QuantDefaults(method=QMethod.symmetric_uniform,
                      act_method=QMethod.asymmetric_uniform, n_bits=8,
                      weight_range_method=RangeMethod.current_minmax,
                      act_range_method=RangeMethod.current_minmax)
    qcfg = B.declare_bert_sites(d, CFG)
    rng = np.random.RandomState(0)
    cal = {"input_ids": jnp.asarray(rng.randint(0, 256, (4, 16)), jnp.int32),
           "attention_mask": jnp.ones((4, 16), jnp.float32)}
    apply_fn = functools.partial(B.bert_apply, cfg=CFG)
    qstate, mode = prepare_quantized_model(
        apply_fn, params, qcfg, [cal],
        weight_tensors=B.bert_weight_site_tensors(params))
    int_params = (B.build_bert_int_params(params, qcfg, qstate)
                  if int_path else None)

    @jax.jit
    def forward(batch):
        out, _ = B.bert_apply(params, batch, CFG, qcfg, qstate, mode,
                              int_params=int_params)
        return out["logits"]

    scfg = ServeConfig(max_batch=8, max_wait_ms=5.0, seq_buckets=(16, 32, 64),
                       batch_buckets=(1, 2, 4, 8))
    return ServingEngine(forward, scfg, tokenizer=SyntheticTokenizer(256)), \
        (params, qcfg, qstate, mode, int_params)


def test_single_request_matches_direct_forward():
    eng, (params, qcfg, qstate, mode, int_params) = _engine()
    rng = np.random.RandomState(1)
    ids = rng.randint(4, 256, 10).astype(np.int32)
    with eng:
        logits = eng.submit_ids(ids).result(timeout=120)
    # direct forward at the bucketed shape (16)
    pad = np.zeros(16, np.int32)
    pad[:10] = ids
    mask = np.zeros(16, np.float32)
    mask[:10] = 1.0
    batch = {"input_ids": jnp.asarray(pad)[None],
             "attention_mask": jnp.asarray(mask)[None],
             "token_type_ids": jnp.zeros((1, 16), jnp.int32)}
    out, _ = B.bert_apply(params, batch, CFG, qcfg, qstate, mode,
                          int_params=int_params)
    np.testing.assert_allclose(logits, np.asarray(out["logits"][0]),
                               rtol=1e-4, atol=1e-5)


def test_batching_and_metrics():
    eng, _ = _engine(int_path=False)
    rng = np.random.RandomState(2)
    reqs = [rng.randint(4, 256, rng.randint(5, 30)).astype(np.int32)
            for _ in range(40)]
    with eng:
        snap = eng.run_closed_loop(reqs, concurrency=16)
    assert snap["requests"] == 40
    assert snap["tokens"] == sum(len(r) for r in reqs)
    assert snap["seq_per_sec"] > 0
    assert snap["batches"] <= 40  # some batching happened under concurrency
    assert snap["latency_ms_p99"] >= snap["latency_ms_p50"]


def test_text_interface():
    eng, _ = _engine(int_path=False)
    with eng:
        logits = eng.classify("the quick brown fox", "jumps over the dog")
    assert logits.shape == (2,)
    assert np.all(np.isfinite(logits))


def test_bucket_rounding():
    from transformer_quantization_tpu.serving.engine import _bucket

    assert _bucket(5, (16, 32)) == 16
    assert _bucket(17, (16, 32)) == 32
    assert _bucket(100, (16, 32)) == 32  # clamps to largest


def test_fused_transfer_matches_dict_path():
    """fused_transfer packs ids/mask/types into one (3,B,S) transfer;
    results must match the dict path bit-for-bit."""
    from transformer_quantization_tpu.serving.engine import unpack_batch

    eng, (params, qcfg, qstate, mode, int_params) = _engine()

    @jax.jit
    def packed_fwd(packed):
        out, _ = B.bert_apply(params, unpack_batch(packed), CFG, qcfg,
                              qstate, mode, int_params=int_params)
        return out["logits"]

    rng = np.random.RandomState(0)
    reqs = [rng.randint(3, 60, (rng.randint(4, 16),)).astype(np.int32)
            for _ in range(12)]

    scfg = ServeConfig(max_batch=4, seq_buckets=(16,),
                       batch_buckets=(1, 2, 4), fused_transfer=True,
                       pipeline_depth=3)
    with ServingEngine(packed_fwd, scfg) as e2:
        outs_fused = [e2.submit_ids(r).result(60) for r in reqs]
    with eng:
        outs_dict = [eng.submit_ids(r).result(60) for r in reqs]
    for a, b in zip(outs_fused, outs_dict):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
