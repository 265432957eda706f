"""Manual shard_map TP with int8-compressed collectives (parallel/tp_int8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer_quantization_tpu.models import bert as B
from transformer_quantization_tpu.parallel.mesh import make_mesh
from transformer_quantization_tpu.parallel import tp_int8 as T

CFG = B.BertConfig(vocab_size=128, hidden_size=64, num_hidden_layers=2,
                   num_attention_heads=4, intermediate_size=128,
                   max_position_embeddings=64, num_labels=3)


@pytest.fixture(scope="module")
def setup():
    params = B.init_bert_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.RandomState(2)
    batch = {
        "input_ids": jnp.asarray(rng.randint(0, 128, (4, 16)), jnp.int32),
        "attention_mask": jnp.asarray(
            (np.arange(16)[None, :] < rng.randint(8, 17, (4, 1))),
            jnp.float32),
        "token_type_ids": jnp.zeros((4, 16), jnp.int32),
    }
    ref, _ = B.bert_apply(params, batch, CFG, None, None,
                          B.QuantMode(weight_quant=False, act_quant=False))
    return params, batch, np.asarray(ref["logits"])


def test_tp_psum_matches_replicated(setup):
    """The manual TP decomposition itself is exact (f32 psum closings)."""
    params, batch, ref = setup
    mesh = make_mesh(tp=4)
    out = np.asarray(T.tp_bert_logits(params, batch, CFG, mesh,
                                      comm="psum"))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_tp_int8_collectives_close(setup):
    """int8-compressed closings stay within the quantization error bound
    of the replicated forward (per-row absmax/127 per ring hop)."""
    params, batch, ref = setup
    mesh = make_mesh(tp=4)
    out = np.asarray(T.tp_bert_logits(params, batch, CFG, mesh,
                                      comm="int8"))
    scale = np.max(np.abs(ref))
    assert np.max(np.abs(out - ref)) < 0.05 * scale + 0.05, (
        np.max(np.abs(out - ref)), scale)
    # and it must agree with the exact-TP forward on classifications
    exact = np.asarray(T.tp_bert_logits(params, batch, CFG, mesh,
                                        comm="psum"))
    assert (np.argmax(out, -1) == np.argmax(exact, -1)).mean() >= 0.75


def test_tp_int8_composes_with_dp(setup):
    params, batch, ref = setup
    mesh = make_mesh(dp=2, tp=4)
    from transformer_quantization_tpu.parallel.scaling import shard_for_dp

    sbatch = shard_for_dp(dict(batch), mesh)
    out = np.asarray(T.tp_bert_logits(params, sbatch, CFG, mesh,
                                      comm="psum"))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_wire_bytes_accounting():
    w = T.tp_wire_bytes(B.BertConfig(), 32, 128, 4)
    # 2 closings/layer x 12 layers x B*T*H elements, 2*(3/4) wire fraction
    elems = 2 * 12 * 32 * 128 * 768
    assert w["f32_bytes"] == pytest.approx(1.5 * elems * 4)
    assert 3.9 < w["compression_vs_f32"] <= 4.0


def test_tp_int8_report(setup):
    params, batch, _ = setup
    rep = T.tp_int8_report(CFG, params, batch, make_mesh(tp=2))
    assert rep["max_err_psum_vs_replicated"] < 1e-3
    assert rep["max_err_int8_vs_replicated"] < 1.0
    assert rep["int8_bytes"] < rep["f32_bytes"] / 3.5


def test_serving_engine_over_tp_int8(setup):
    """The serving engine is forward-agnostic: a manual-TP forward whose
    row-parallel closings ride int8-compressed collectives serves
    requests end to end (continuous batching + TP on one mesh)."""
    from transformer_quantization_tpu.serving.engine import (
        ServeConfig,
        ServingEngine,
    )

    params, batch, ref = setup
    mesh = make_mesh(tp=4)

    def forward(b):
        return T.tp_bert_logits(params, b, CFG, mesh, comm="int8")

    scfg = ServeConfig(max_batch=4, batch_buckets=(1, 4),
                       seq_buckets=(16,), precompile=False)
    eng = ServingEngine(forward, scfg)
    rng = np.random.RandomState(3)
    ids = rng.randint(4, 128, 10).astype(np.int32)
    with eng:
        logits = eng.submit_ids(ids).result(timeout=300)
    # same request through the exact-TP forward at the bucketed shape
    pad = np.zeros(16, np.int32)
    pad[:10] = ids
    mask = np.zeros(16, np.float32)
    mask[:10] = 1.0
    b1 = {"input_ids": jnp.asarray(pad)[None],
          "attention_mask": jnp.asarray(mask)[None],
          "token_type_ids": jnp.zeros((1, 16), jnp.int32)}
    exact = np.asarray(T.tp_bert_logits(params, b1, CFG, mesh,
                                        comm="psum"))[0]
    scale = max(np.max(np.abs(exact)), 1e-3)
    assert np.max(np.abs(logits - exact)) < 0.05 * scale + 0.05
