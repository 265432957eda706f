"""MobileBERT family (SURVEY.md C26): trigram embeddings, NoNorm,
bottleneck layers, stacked FFNs, quant_dict enables."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer_quantization_tpu.models import mobilebert as M
from transformer_quantization_tpu.quant.qconfig import QuantDefaults
from transformer_quantization_tpu.quant.quantizers import QMethod
from transformer_quantization_tpu.quant.ranges import RangeMethod
from transformer_quantization_tpu.training.calibration import (
    prepare_quantized_model,
)

CFG = M.MobileBertConfig(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=2, intermediate_size=32,
                         embedding_size=8, intra_bottleneck_size=16,
                         max_position_embeddings=64, num_labels=2)


def make_batch(rng, bsz=4, seq=16):
    return {"input_ids": jnp.asarray(
                rng.randint(0, CFG.vocab_size, (bsz, seq)), jnp.int32),
            "attention_mask": jnp.ones((bsz, seq), jnp.float32)}


def sym_defaults(n_bits=8):
    return QuantDefaults(method=QMethod.symmetric_uniform,
                         act_method=QMethod.asymmetric_uniform, n_bits=n_bits,
                         weight_range_method=RangeMethod.current_minmax,
                         act_range_method=RangeMethod.current_minmax)


def test_fp32_forward_shapes():
    params = M.init_mobilebert_params(jax.random.PRNGKey(0), CFG)
    batch = make_batch(np.random.RandomState(0))
    batch["labels"] = jnp.asarray([0, 1, 1, 0], jnp.int32)
    out, _ = M.mobilebert_apply(params, batch, CFG)
    assert out["logits"].shape == (4, 2)
    assert out["sequence_output"].shape == (4, 16, CFG.hidden_size)
    assert np.isfinite(float(out["loss"]))


def test_trigram_embedding_matches_manual():
    # the trigram concat is cat(x_{t+1}, x_t, x_{t-1}) along features
    # (quantized_mobilebert.py:141-156)
    params = M.init_mobilebert_params(jax.random.PRNGKey(1), CFG)
    w = params["embeddings"]["word"]
    ids = jnp.asarray([[3, 5, 7]], jnp.int32)
    x = jnp.take(w, ids, axis=0)
    nxt = jnp.pad(x[:, 1:], ((0, 0), (0, 1), (0, 0)))
    prv = jnp.pad(x[:, :-1], ((0, 0), (1, 0), (0, 0)))
    tri = jnp.concatenate([nxt, x, prv], axis=2)
    # middle token: neighbors present on both sides
    np.testing.assert_array_equal(np.asarray(tri[0, 1, :8]),
                                  np.asarray(w[7]))
    np.testing.assert_array_equal(np.asarray(tri[0, 1, 8:16]),
                                  np.asarray(w[5]))
    np.testing.assert_array_equal(np.asarray(tri[0, 1, 16:]),
                                  np.asarray(w[3]))
    # edges zero-padded
    assert float(jnp.abs(tri[0, 0, 16:]).max()) == 0.0
    assert float(jnp.abs(tri[0, 2, :8]).max()) == 0.0


def test_site_inventory_quant_dict_enables():
    d = sym_defaults()
    qcfg = M.declare_mobilebert_sites(d, CFG)
    # default: all act quantizers enabled
    assert qcfg["L0.attn.probs"].enabled
    assert qcfg["L0.out.bn.res"].enabled
    assert "L0.bn.in.dense.w" in qcfg and "L0.bn.attn.norm.w" in qcfg
    assert "L0.ffn0.res" in qcfg and "L1.ffn2.norm.w" in qcfg

    qd = {"attn_probs": False, "res_ffn_output": False,
          "attn_probs_n_bits_act": 16}
    qcfg2 = M.declare_mobilebert_sites(d, CFG, quant_dict=qd)
    assert not qcfg2["L0.attn.probs"].enabled
    assert not qcfg2["L1.ffn1.res"].enabled
    assert qcfg2["L0.attn.probs"].spec.n_bits == 16  # override kept


def test_quant_setup_variants():
    d = sym_defaults()
    qcfg = M.declare_mobilebert_sites(d, CFG, quant_setup="FP_logits")
    assert not qcfg["classifier.out"].enabled
    with pytest.raises(ValueError):
        M.declare_mobilebert_sites(d, CFG, quant_setup="MSE_logits")


def test_ptq_flow_and_int_parity():
    params = M.init_mobilebert_params(jax.random.PRNGKey(2), CFG)
    d = sym_defaults()
    qcfg = M.declare_mobilebert_sites(d, CFG)
    batch = make_batch(np.random.RandomState(2))
    apply_fn = functools.partial(M.mobilebert_apply, cfg=CFG)
    qstate, mode = prepare_quantized_model(
        apply_fn, params, qcfg, [batch],
        weight_tensors=M.mobilebert_weight_site_tensors(params))
    out_fp, _ = M.mobilebert_apply(params, batch, CFG)
    out_q, _ = M.mobilebert_apply(params, batch, CFG, qcfg, qstate, mode)
    dq = float(jnp.max(jnp.abs(out_q["logits"] - out_fp["logits"])))
    assert 0.0 < dq < 5.0

    int_params = M.build_mobilebert_int_params(params, qcfg, qstate)
    # all linear + embedding sites pack; NoNorm sites stay elementwise
    assert "L0.bn.in.dense" in int_params and "emb.word" in int_params
    assert not any(k.endswith("norm") for k in int_params)
    out_i, _ = M.mobilebert_apply(params, batch, CFG, qcfg, qstate, mode,
                                  int_params=int_params)
    np.testing.assert_allclose(np.asarray(out_i["logits"]),
                               np.asarray(out_q["logits"]),
                               rtol=1e-3, atol=1e-4)


def test_nonorm_shared_quantizer_range():
    # w and b quantize on one grid whose range covers the concat
    tensors = M.mobilebert_weight_site_tensors(
        M.init_mobilebert_params(jax.random.PRNGKey(3), CFG))
    t = tensors["emb.norm.w"]
    assert t.shape == (2 * CFG.hidden_size,)


def test_jit_forward():
    params = M.init_mobilebert_params(jax.random.PRNGKey(4), CFG)
    d = sym_defaults()
    qcfg = M.declare_mobilebert_sites(d, CFG)
    batch = make_batch(np.random.RandomState(4))
    apply_fn = functools.partial(M.mobilebert_apply, cfg=CFG)
    qstate, mode = prepare_quantized_model(
        apply_fn, params, qcfg, [batch],
        weight_tensors=M.mobilebert_weight_site_tensors(params))

    @functools.partial(jax.jit, static_argnums=(2,))
    def step(batch, qstate, mode):
        out, _ = M.mobilebert_apply(params, batch, CFG, qcfg, qstate, mode)
        return out["logits"]

    logits = step(batch, qstate, mode)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_adaround_specs_cover_all_weight_sites():
    params = M.init_mobilebert_params(jax.random.PRNGKey(5), CFG)
    d = sym_defaults()
    qcfg = M.declare_mobilebert_sites(d, CFG)
    spec_names = {n for n, _ in M.mobilebert_adaround_specs(params, CFG)}
    weight_sites = {n[:-2] for n, c in qcfg.items() if c.kind == "weight"}
    assert weight_sites == spec_names


def test_registry():
    from transformer_quantization_tpu.models.registry import build_model

    fam, cfg, params = build_model("mobilebert_uncased", tiny=True)
    assert fam.name == "mobilebert"
    assert cfg.intra_bottleneck_size == 32


@pytest.mark.parametrize("attn_case,cfg_kw", [
    ("shared_kq", {}),
    ("bottleneck", {"use_bottleneck_attention": True}),
    # plain attention over the full hidden stream requires TH == H
    # (HF constraint: q/k project from true_hidden_size)
    ("plain", {"key_query_shared_bottleneck": False,
               "intra_bottleneck_size": 32}),
])
def test_engine_parity(attn_case, cfg_kw):
    """Full-handoff int8 engine == generic int path for every
    bottleneck-attention topology (quantized_mobilebert.py:150-210)."""
    import dataclasses

    cfg = dataclasses.replace(CFG, **cfg_kw)
    params = M.init_mobilebert_params(jax.random.PRNGKey(7), cfg)
    rng = np.random.RandomState(7)
    batch = {"input_ids": jnp.asarray(
                 rng.randint(0, cfg.vocab_size, (4, 16)), jnp.int32),
             "attention_mask": jnp.asarray(
                 (np.arange(16)[None, :] < rng.randint(8, 17, (4, 1))),
                 jnp.float32)}
    qcfg = M.declare_mobilebert_sites(sym_defaults(), cfg)
    apply_fn = functools.partial(M.mobilebert_apply, cfg=cfg)
    qstate, mode = prepare_quantized_model(
        apply_fn, params, qcfg, [batch],
        weight_tensors=M.mobilebert_weight_site_tensors(params))
    int_params = M.build_mobilebert_int_params(params, qcfg, qstate)
    ref, _ = M.mobilebert_apply(params, batch, cfg, qcfg, qstate, mode,
                                int_params=int_params)

    static, plan, e_int = M.build_mobilebert_engine(params, cfg, qcfg,
                                                    qstate)
    assert static.attn_case == attn_case
    out = M.mobilebert_engine_apply(params, batch, cfg, qcfg, qstate,
                                    static, plan, e_int, backend="xla")
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               np.asarray(ref["logits"]),
                               rtol=1e-3, atol=2e-3)
    out_pl = M.mobilebert_engine_apply(params, batch, cfg, qcfg, qstate,
                                       static, plan, e_int,
                                       backend="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(out_pl["logits"]),
                               np.asarray(out["logits"]),
                               rtol=1e-4, atol=1e-4)
    # the whole-layer megakernel (the default pallas route) is
    # bit-identical to the per-op kernel chain
    hin = jnp.asarray(np.random.RandomState(11).randn(
        4, 16, cfg.hidden_size).astype(np.float32))
    bias = (1.0 - batch["attention_mask"]) * -10000.0
    fused = M.mobilebert_encoder_engine(hin, bias, static, plan,
                                        backend="pallas", interpret=True)
    chain = M.mobilebert_encoder_engine(hin, bias, static, plan,
                                        backend="pallas", interpret=True,
                                        fuse_layer=False)
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(chain))


def test_engine_w4a8_parity():
    """The W4A8 packed-int4 weights ride the MobileBERT whole-layer
    kernel (w4 unpack inside _mm_emit/_mm_norm_val)."""
    params = M.init_mobilebert_params(jax.random.PRNGKey(3), CFG)
    rng = np.random.RandomState(3)
    batch = make_batch(rng)
    import dataclasses as _dc

    defaults = _dc.replace(sym_defaults(4), n_bits_act=8)
    qcfg = M.declare_mobilebert_sites(defaults, CFG)
    apply_fn = functools.partial(M.mobilebert_apply, cfg=CFG)
    qstate, mode = prepare_quantized_model(
        apply_fn, params, qcfg, [batch],
        weight_tensors=M.mobilebert_weight_site_tensors(params))
    int_params = M.build_mobilebert_int_params(params, qcfg, qstate,
                                               use_int4=True)
    ref, _ = M.mobilebert_apply(params, batch, CFG, qcfg, qstate, mode,
                                int_params=int_params)
    static, plan, e_int = M.build_mobilebert_engine(
        params, CFG, qcfg, qstate, int_params=int_params, use_int4=True)
    assert any(any(f) for f in static.w4)
    for be, kw in (("xla", {}), ("pallas", {"interpret": True})):
        out = M.mobilebert_engine_apply(params, batch, CFG, qcfg, qstate,
                                        static, plan, e_int, backend=be,
                                        **kw)
        np.testing.assert_allclose(np.asarray(out["logits"]),
                                   np.asarray(ref["logits"]),
                                   rtol=1e-3, atol=2e-3)


@pytest.mark.parametrize("qd,want_bits", [
    ({"attn_probs_n_bits_act": 16}, (8, 16, 8)),
    ({"attn_scores": False}, (0, 8, 8)),
    ({"attn_probs": False}, (8, 0, 8)),
    ({"attn_output": False}, (8, 8, 0)),
], ids=["probs16", "scores_off", "probs_off", "ctx_off"])
def test_engine_attn_site_overrides(qd, want_bits):
    """The reference's MobileBERT quant_dict attention toggles/overrides
    (quantized_mobilebert.py:31-55, 189-190) ride the engine instead of
    falling off it."""
    params = M.init_mobilebert_params(jax.random.PRNGKey(9), CFG)
    rng = np.random.RandomState(9)
    batch = make_batch(rng)
    qcfg = M.declare_mobilebert_sites(sym_defaults(), CFG, quant_dict=qd)
    apply_fn = functools.partial(M.mobilebert_apply, cfg=CFG)
    qstate, mode = prepare_quantized_model(
        apply_fn, params, qcfg, [batch],
        weight_tensors=M.mobilebert_weight_site_tensors(params))
    int_params = M.build_mobilebert_int_params(params, qcfg, qstate)
    ref, _ = M.mobilebert_apply(params, batch, CFG, qcfg, qstate, mode,
                                int_params=int_params)
    static, plan, e_int = M.build_mobilebert_engine(params, CFG, qcfg,
                                                    qstate)
    assert static.layer_attn_bits(0) == want_bits
    for be, kw in (("xla", {}), ("pallas", {"interpret": True})):
        out = M.mobilebert_engine_apply(params, batch, CFG, qcfg, qstate,
                                        static, plan, e_int, backend=be,
                                        **kw)
        np.testing.assert_allclose(np.asarray(out["logits"]),
                                   np.asarray(ref["logits"]),
                                   rtol=1e-3, atol=2e-3)


def test_engine_w8a16_rejected():
    """Global 16-bit activations on MobileBERT: the NoNorm megakernel
    family keeps the strict int8 payload protocol — a TESTED
    EngineIncompatible reason, served by the generic path (the BERT
    family's engine rides W8A16; MobileBERT's quant_dict language —
    boolean enables + attn-probs overrides, quantized_mobilebert.py:31-55
    — cannot produce partial 16-bit configs, so the only reachable wide
    config is this global one)."""
    import dataclasses

    import __graft_entry__ as G
    from transformer_quantization_tpu.ops.engine import EngineIncompatible

    d16 = dataclasses.replace(G._w8a8_defaults(), n_bits_act=16)
    params = M.init_mobilebert_params(jax.random.PRNGKey(3), CFG)
    qcfg = M.declare_mobilebert_sites(d16, CFG)
    rng = np.random.RandomState(3)
    batch = make_batch(rng)
    apply_fn = functools.partial(M.mobilebert_apply, cfg=CFG)
    qstate, mode = prepare_quantized_model(
        apply_fn, params, qcfg, [batch],
        weight_tensors=M.mobilebert_weight_site_tensors(params))
    with pytest.raises(EngineIncompatible, match="16-bit"):
        M.build_mobilebert_engine(params, CFG, qcfg, qstate)
    # the generic path serves the config
    out, _ = M.mobilebert_apply(params, batch, CFG, qcfg, qstate, mode)
    assert np.isfinite(np.asarray(out["logits"])).all()
