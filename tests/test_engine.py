"""Full-handoff int8 engine: parity with the generic quantized path.

The engine (ops/engine.py + ops/pallas/engine_kernels.py) must compute the
same function as bert_apply with int_params (the XLA int path), which in
turn matches the fake-quant simulation (reference semantics,
quantization/quantizers.py:189-211). Engine int32 accumulation is exact
where f32 GEMMs round, so comparisons use small tolerances, not equality.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transformer_quantization_tpu.models import bert as B
from transformer_quantization_tpu.ops import engine as ENG
from transformer_quantization_tpu.ops.pallas import engine_kernels as EK
from transformer_quantization_tpu.quant.qconfig import QuantMode

import __graft_entry__ as G


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = B.BertConfig(vocab_size=128, hidden_size=64, num_hidden_layers=2,
                       num_attention_heads=4, intermediate_size=128,
                       max_position_embeddings=64, num_labels=2)
    params, qcfg, qstate = G._calibrated_bert(cfg, batch_size=2, seq=16)
    static, plan, int_params = B.build_bert_engine(params, cfg, qcfg, qstate)
    rng = np.random.RandomState(1)
    batch = {
        "input_ids": jnp.asarray(rng.randint(0, 128, (4, 16)), jnp.int32),
        "attention_mask": jnp.asarray(
            (np.arange(16)[None, :] < rng.randint(8, 17, (4, 1))),
            jnp.float32),
        "token_type_ids": jnp.zeros((4, 16), jnp.int32),
    }
    return cfg, params, qcfg, qstate, static, plan, int_params, batch


def _generic_logits(setup):
    cfg, params, qcfg, qstate, _, _, int_params, batch = setup
    out, _ = B.bert_apply(params, batch, cfg, qcfg, qstate, QuantMode(),
                          int_params=int_params)
    return np.asarray(out["logits"])


def test_engine_xla_backend_matches_generic(tiny_setup):
    cfg, params, qcfg, qstate, static, plan, int_params, batch = tiny_setup
    ref = _generic_logits(tiny_setup)
    out = B.bert_engine_apply(params, batch, cfg, qcfg, qstate, static,
                              plan, int_params, backend="xla")
    np.testing.assert_allclose(np.asarray(out["logits"]), ref,
                               rtol=1e-3, atol=2e-3)


def test_engine_pallas_interpret_matches_xla_backend(tiny_setup):
    cfg, params, qcfg, qstate, static, plan, int_params, batch = tiny_setup
    ref = B.bert_engine_apply(params, batch, cfg, qcfg, qstate, static,
                              plan, int_params, backend="xla")
    out = B.bert_engine_apply(params, batch, cfg, qcfg, qstate, static,
                              plan, int_params, backend="pallas",
                              interpret=True)
    # identical dataflow; kernels differ only in the exact-GELU formulation
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               np.asarray(ref["logits"]),
                               rtol=1e-4, atol=1e-4)


def test_engine_close_to_fakequant_simulation(tiny_setup):
    cfg, params, qcfg, qstate, static, plan, int_params, batch = tiny_setup
    sim, _ = B.bert_apply(params, batch, cfg, qcfg, qstate, QuantMode())
    out = B.bert_engine_apply(params, batch, cfg, qcfg, qstate, static,
                              plan, int_params, backend="xla")
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               np.asarray(sim["logits"]),
                               rtol=5e-2, atol=5e-2)


def test_engine_bf16_residual_stream(tiny_setup):
    cfg, params, qcfg, qstate, static, plan, int_params, batch = tiny_setup
    ref = _generic_logits(tiny_setup)
    out = B.bert_engine_apply(params, batch, cfg, qcfg, qstate, static,
                              plan, int_params, backend="xla",
                              engine_dtype=jnp.bfloat16)
    # bf16 storage error sits below the 8-bit act grid; logits stay close
    np.testing.assert_allclose(np.asarray(out["logits"]), ref,
                               rtol=3e-2, atol=3e-2)


def test_engine_jit_compiles_once(tiny_setup):
    cfg, params, qcfg, qstate, static, plan, int_params, batch = tiny_setup

    @jax.jit
    def step(params, plan, batch):
        return B.bert_engine_apply(params, batch, cfg, qcfg, qstate,
                                   static, plan, int_params,
                                   backend="xla")["logits"]

    a = step(params, plan, batch)
    assert a.shape == (4, cfg.num_labels)
    assert np.isfinite(np.asarray(a)).all()


def test_incompatible_config_rejected(tiny_setup):
    cfg, params, qcfg, qstate, _, _, int_params, _ = tiny_setup
    bad = qcfg.replace_site("L0.attn.q.out", enabled=False)
    with pytest.raises(ENG.EngineIncompatible):
        B.build_bert_engine(params, cfg, bad, qstate, int_params=int_params)
    ok16 = B.apply_bert_quant_dict(qcfg, {"s": 16, "p": 16},
                                   cfg.num_hidden_layers)
    static16, _, _ = B.build_bert_engine(params, cfg, ok16, qstate,
                                         int_params=int_params)
    assert static16.layer_attn_bits(0) == (16, 16, 8)


@pytest.mark.parametrize("qd,want_io0", [
    # quant_dict 'L'/'L{i}' keys set EVERY act site in a layer
    # (main.py:489-491) — q/k/v outs, folds, residuals, ln outs — so the
    # whole layer leaves the int8 payload protocol: the qkv matmul emits
    # fake-quantized f32 values, the attention runs value-space f32 dots,
    # and the inter-layer 'z' edge travels as a float value edge.
    ({"L": 16}, ("i8", "f", 16, "f", 16, 16, 16, "f", 16)),
    ({"L0": 16}, ("i8", "f", 16, "f", 16, 16, 16, "f", 16)),
    ({"L": 12}, ("i8", "f", 12, "f", 12, 12, 12, "f", 12)),
], ids=["L16", "L0_16", "L12"])
def test_engine_16bit_layer_key_matches_generic(tiny_setup, qd, want_io0):
    cfg, params, qcfg, qstate, _, _, _, batch = tiny_setup
    from transformer_quantization_tpu.quant.manager import (
        init_weight_qstate)
    from transformer_quantization_tpu.quant.qconfig import Phase

    qcfg2 = B.apply_bert_quant_dict(qcfg, qd, cfg.num_hidden_layers)
    qstate2 = init_weight_qstate(qcfg2, B.bert_weight_site_tensors(params))
    est = QuantMode(act_phase=Phase.estimate)
    _, qstate2 = B.bert_apply(params, batch, cfg, qcfg2, qstate2, est)
    int_params = B.build_bert_int_params(params, qcfg2, qstate2)
    static, plan, e_int = B.build_bert_engine(params, cfg, qcfg2, qstate2,
                                              int_params=int_params)
    assert static.layer_io(0) == want_io0
    ref, _ = B.bert_apply(params, batch, cfg, qcfg2, qstate2, QuantMode(),
                          int_params=int_params)
    for be, kw in (("xla", {}), ("pallas", {"interpret": True})):
        out = B.bert_engine_apply(params, batch, cfg, qcfg2, qstate2,
                                  static, plan, e_int, backend=be, **kw)
        np.testing.assert_allclose(np.asarray(out["logits"]),
                                   np.asarray(ref["logits"]),
                                   rtol=1e-3, atol=2e-3)


def test_engine_w8a16_global(tiny_setup):
    """Global --n-bits-act 16 (W8A16): EVERY act edge leaves the payload
    protocol — float entry, value-space attention, float inter-layer
    edges — and the engine still matches the generic path."""
    import dataclasses

    import __graft_entry__ as GG
    from transformer_quantization_tpu.quant.manager import (
        init_weight_qstate)
    from transformer_quantization_tpu.quant.qconfig import Phase

    cfg, params, _, _, _, _, _, batch = tiny_setup
    d16 = dataclasses.replace(GG._w8a8_defaults(), n_bits_act=16)
    qcfg2 = B.declare_bert_sites(d16, cfg)
    qstate2 = init_weight_qstate(qcfg2, B.bert_weight_site_tensors(params))
    _, qstate2 = B.bert_apply(params, batch, cfg, qcfg2, qstate2,
                              QuantMode(act_phase=Phase.estimate))
    int_params = B.build_bert_int_params(params, qcfg2, qstate2)
    static, plan, e_int = B.build_bert_engine(params, cfg, qcfg2, qstate2,
                                              int_params=int_params)
    assert static.layer_io(0)[0] == "f" and static.layer_io(0)[1] == "f"
    ref, _ = B.bert_apply(params, batch, cfg, qcfg2, qstate2, QuantMode(),
                          int_params=int_params)
    for be, kw in (("xla", {}), ("pallas", {"interpret": True})):
        out = B.bert_engine_apply(params, batch, cfg, qcfg2, qstate2,
                                  static, plan, e_int, backend=be, **kw)
        np.testing.assert_allclose(np.asarray(out["logits"]),
                                   np.asarray(ref["logits"]),
                                   rtol=1e-3, atol=2e-3)
    # the bf16-storage engine must take the float entry edge from the
    # PRE-cast values (a bf16 hop would destroy the 16-bit entry grid)
    out = B.bert_engine_apply(params, batch, cfg, qcfg2, qstate2,
                              static, plan, e_int, backend="xla",
                              engine_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               np.asarray(ref["logits"]),
                               rtol=1e-2, atol=3e-3)


def test_engine_mixed_qkv_widths_rejected(tiny_setup):
    """A 16-bit q.out with 8-bit k/v has no value-space dot partner —
    tested EngineIncompatible reason, generic path serves it."""
    cfg, params, qcfg, qstate, _, _, int_params, _ = tiny_setup
    import dataclasses

    qcfg2 = qcfg.replace_site(
        "L0.attn.q.out",
        spec=dataclasses.replace(qcfg["L0.attn.q.out"].spec, n_bits=16))
    with pytest.raises(ENG.EngineIncompatible,
                       match="share one grid width"):
        B.build_bert_engine(params, cfg, qcfg2, qstate,
                            int_params=int_params)


@pytest.mark.parametrize("qd,want_bits", [
    ({"c": 16}, (8, 8, 16)),
    ({"c": "fp32"}, (8, 8, 0)),
], ids=["ctx16", "ctx_off"])
def test_engine_flex_context_matches_generic(tiny_setup, qd, want_bits):
    """'c': 16 / 'c': 'fp32' (main.py:463) ride the engine: the context
    site leaves the int8 payload protocol and travels as a FLOAT value
    edge into the attn_out matmul (in_mode='f'), bit-equal to the
    generic int path on both backends."""
    cfg, params, qcfg, qstate, _, _, int_params, batch = tiny_setup
    qcfg2 = B.apply_bert_quant_dict(qcfg, qd, cfg.num_hidden_layers)
    static, plan, e_int = B.build_bert_engine(params, cfg, qcfg2, qstate,
                                              int_params=int_params)
    assert static.layer_attn_bits(0) == want_bits
    ref, _ = B.bert_apply(params, batch, cfg, qcfg2, qstate, QuantMode(),
                          int_params=int_params)
    for be, kw in (("xla", {}), ("pallas", {"interpret": True})):
        out = B.bert_engine_apply(params, batch, cfg, qcfg2, qstate,
                                  static, plan, e_int, backend=be, **kw)
        np.testing.assert_allclose(np.asarray(out["logits"]),
                                   np.asarray(ref["logits"]),
                                   rtol=1e-3, atol=2e-3)


def test_per_layer_attn_bits_override(tiny_setup):
    """'p0': 16 (layer-0-only probs override) produces per-layer
    attn_bits and still runs the engine end to end."""
    cfg, params, qcfg, qstate, _, _, int_params, batch = tiny_setup
    qcfg2 = B.apply_bert_quant_dict(qcfg, {"p0": 16},
                                    cfg.num_hidden_layers)
    static, plan, _ = B.build_bert_engine(params, cfg, qcfg2, qstate,
                                          int_params=int_params)
    assert static.layer_attn_bits(0) == (8, 16, 8)
    assert static.layer_attn_bits(1) == (8, 8, 8)
    out = B.bert_engine_apply(params, batch, cfg, qcfg2, qstate, static,
                              plan, int_params, backend="xla")
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_disabled_residual_site_supported(tiny_setup):
    """'u': 'fp32' (disable attn_out.res) still rides the engine."""
    cfg, params, qcfg, qstate, _, _, int_params, batch = tiny_setup
    qcfg2 = B.apply_bert_quant_dict(qcfg, {"u": "fp32"},
                                    cfg.num_hidden_layers)
    static, plan, _ = B.build_bert_engine(params, cfg, qcfg2, qstate,
                                          int_params=int_params)
    assert static.res_quant[0][0] is False
    ref, _ = B.bert_apply(params, batch, cfg, qcfg2, qstate, QuantMode(),
                          int_params=int_params)
    out = B.bert_engine_apply(params, batch, cfg, qcfg2, qstate, static,
                              plan, int_params, backend="xla")
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               np.asarray(ref["logits"]),
                               rtol=1e-3, atol=2e-3)


def test_payload_roundtrip():
    s = jnp.asarray(0.037, jnp.float32)
    shift = jnp.asarray(128.0 - 117.0, jnp.float32)
    x = jnp.linspace(-4.0, 4.0, 513)
    p = EK.quantize_payload(x, s, shift)
    assert p.dtype == jnp.int8
    xq = EK.dequantize_payload(p, s, shift)
    np.testing.assert_allclose(np.asarray(xq),
                               np.asarray(EK.fakequant_f32(x, s, shift)),
                               rtol=1e-6, atol=1e-6)


def test_mm_add_ln_fused_bit_equals_separate_pair():
    """int8_matmul_add_ln == int8_matmul(emit) -> fused_add_ln_payload,
    bit-for-bit (the fold-site fake-quant equals emit->dequantize)."""
    rng = np.random.RandomState(5)
    m, k, n = 16, 32, 24
    x8 = jnp.asarray(rng.randint(-128, 128, (m, k)), jnp.int8)
    w8 = jnp.asarray(rng.randint(-128, 128, (n, k)), jnp.int8)
    r8 = jnp.asarray(rng.randint(-128, 128, (m, n)), jnp.int8)
    out_s, out_sh = 0.021, 7.0
    vecs = jnp.stack([
        jnp.full((n,), 0.013, jnp.float32),
        jnp.asarray(np.sum(rng.randint(-128, 128, (k, n)), 0), jnp.float32),
        jnp.asarray(rng.normal(0, 0.1, (n,)), jnp.float32),
        jnp.full((n,), out_s, jnp.float32),
        jnp.full((n,), out_sh, jnp.float32),
    ])
    scal = jnp.asarray([[0.017, 11.0]], jnp.float32)
    gb = jnp.asarray(rng.normal(1, 0.05, (2, n)), jnp.float32)
    # ln_scalars rows 0/1 = the fold site (the pair's dequant params)
    lnsc = jnp.asarray([[out_s, out_sh, 0.02, 3.0, 0.15, 5.0,
                         0.01, -2.0]], jnp.float32)
    for res_quant in (True, False):
        y8 = EK.int8_matmul(x8, w8, vecs, scal, activation=None,
                            out_mode="emit", interpret=True)
        want = EK.fused_add_ln_payload(y8, r8, gb, lnsc, eps=1e-12,
                                       res_quant=res_quant, interpret=True)
        got = EK.int8_matmul_add_ln(x8, w8, vecs, scal, r8, gb, lnsc,
                                    eps=1e-12, res_quant=res_quant,
                                    interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        ref = EK.int8_matmul_add_ln_ref(x8, w8, vecs, scal, r8, gb, lnsc,
                                        eps=1e-12, res_quant=res_quant)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(want))


@pytest.mark.parametrize("impl", ["tanh", "poly", "exact"])
def test_engine_gelu_impls_match_generic(tiny_setup, impl):
    """All three engine GELU substitutions stay within the engine-vs-
    generic tolerance (their error is far below the 8-bit act step)."""
    cfg, params, qcfg, qstate, static, plan, int_params, batch = tiny_setup
    ref = _generic_logits(tiny_setup)
    out = B.bert_engine_apply(params, batch, cfg, qcfg, qstate, static,
                              plan, int_params, backend="xla",
                              gelu_impl=impl)
    np.testing.assert_allclose(np.asarray(out["logits"]), ref,
                               rtol=1e-3, atol=2e-3)


def test_attention_skip_max_parity(tiny_setup):
    """skip_max (statically-proven softmax without max-subtraction) gives
    the same payloads as the subtracting form, including masked rows."""
    cfg, params, qcfg, qstate, static, plan, int_params, batch = tiny_setup
    assert static.attn_skip_max  # tiny model's scores grid proves it
    rng = np.random.RandomState(3)
    b, t, h = 4, 16, cfg.hidden_size
    qkv8 = jnp.asarray(rng.randint(-128, 128, (b * t, 3 * h)), jnp.int8)
    mask = jnp.asarray((np.arange(t)[None, :] < [[5], [16], [9], [12]]),
                       jnp.float32)
    bias = (1.0 - mask) * -10000.0
    sc = plan["layers"][0]["attn_scal"]
    out_skip = EK.int8_attention_ref(qkv8, bias, sc,
                                     n_heads=cfg.num_attention_heads,
                                     seq=t, skip_max=True)
    out_sub = EK.int8_attention_ref(qkv8, bias, sc,
                                    n_heads=cfg.num_attention_heads,
                                    seq=t, skip_max=False)
    # same probs up to fp rounding of the 2^-m rescale -> payloads may
    # differ only by boundary-rounding; require near-total agreement
    diff = np.abs(np.asarray(out_skip, np.int32)
                  - np.asarray(out_sub, np.int32))
    assert diff.max() <= 1
    assert (diff != 0).mean() < 1e-3
    k_skip = EK.int8_attention(qkv8, bias, sc,
                               n_heads=cfg.num_attention_heads, seq=t,
                               skip_max=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(k_skip), np.asarray(out_skip))


def test_attention_grouped_dots_bit_equal(tiny_setup):
    """The grouped block-diagonal MXU formulation (group>1) is
    bit-identical to the per-head dots and to the jnp oracle — masks kill
    the cross-head terms exactly and the f32 correction adds keep the
    same association order."""
    cfg, params, qcfg, qstate, static, plan, int_params, batch = tiny_setup
    rng = np.random.RandomState(7)
    b, t, h = 4, 16, cfg.hidden_size
    qkv8 = jnp.asarray(rng.randint(-128, 128, (b * t, 3 * h)), jnp.int8)
    mask = jnp.asarray((np.arange(t)[None, :] < [[5], [16], [9], [12]]),
                       jnp.float32)
    bias = (1.0 - mask) * -10000.0
    sc = plan["layers"][0]["attn_scal"]
    nh = cfg.num_attention_heads
    want = EK.int8_attention_ref(qkv8, bias, sc, n_heads=nh, seq=t)
    groups = [g for g in (1, 2, 4) if nh % g == 0]
    assert len(groups) >= 2
    for dots in ("i8", "bf16"):
        for g in groups:
            got = EK.int8_attention(qkv8, bias, sc, n_heads=nh, seq=t,
                                    interpret=True, group=g, dots=dots)
            np.testing.assert_array_equal(np.asarray(got),
                                          np.asarray(want))
    # 'auto' (the default) resolves to the shifted-bf16 path when exact
    auto = EK.int8_attention(qkv8, bias, sc, n_heads=nh, seq=t,
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(auto), np.asarray(want))


def test_attention_bits_matrix_bit_equal(tiny_setup):
    """Every supported (scores_bits, probs_bits) combination — low-bit,
    8, 16, and disabled (0) — is bit-identical to the oracle under both
    dots modes (quant_dict 's'/'p' values incl. 'fp32';
    attn_probs_n_bits_act)."""
    cfg, *_ = tiny_setup
    nh, d = 4, 16
    h = nh * d
    b, t = 2, 32
    rng = np.random.RandomState(5)
    qkv8 = jnp.asarray(rng.randint(-128, 128, (b * t, 3 * h)), jnp.int8)
    bias = jnp.concatenate(
        [jnp.zeros((b, t - 8), jnp.float32),
         jnp.full((b, 8), -10000.0, jnp.float32)], axis=1)
    for bits in [(4, 4), (2, 2), (16, 4), (8, 16), (16, 16), (0, 8),
                 (8, 0), (0, 0)]:
        sc_s, sc_sh = (1.0, 0.0) if bits[0] == 0 else (0.11, 2.0)
        p_s = 1.0 if bits[1] == 0 else 1 / (2.0 ** bits[1] - 1)
        p_sh = 0.0 if bits[1] == 0 else 2.0 ** (bits[1] - 1)
        sc = jnp.asarray([[0.02, 3.0, 0.02, -2.0, 0.015, 1.0,
                           sc_s, sc_sh, p_s, p_sh, 0.01, 2.0]],
                         jnp.float32)
        want = EK.int8_attention_ref(qkv8, bias, sc, n_heads=nh, seq=t,
                                     attn_bits=bits)
        for dots in ("i8", "bf16", "bf16ph"):
            got = EK.int8_attention(qkv8, bias, sc, n_heads=nh, seq=t,
                                    interpret=True, dots=dots,
                                    attn_bits=bits)
            if bits[1] > 8:
                # probs > 8 bits runs f32-dot phase 3: accumulation
                # order may differ from the oracle einsum, so a context
                # value on a rounding tie can move one level
                diff = np.abs(np.asarray(got, np.int32)
                              - np.asarray(want, np.int32))
                assert diff.max() <= 1, (bits, dots, diff.max())
            else:
                np.testing.assert_array_equal(
                    np.asarray(got), np.asarray(want),
                    err_msg=f"bits={bits} dots={dots}")


def test_attention_bf16_dots_at_seq256_boundary(tiny_setup):
    """seq=256 is the LAST shape where the bf16 phase-3 accumulation is
    integer-exact (256 * 255^2 < 2^24); assert bit-equality right at the
    boundary, with saturated payloads."""
    cfg, params, qcfg, qstate, static, plan, *_ = tiny_setup
    sc = plan["layers"][0]["attn_scal"]
    nh = cfg.num_attention_heads
    b, t, h = 1, 256, cfg.hidden_size
    rng = np.random.RandomState(21)
    # worst-case magnitudes: many saturated (+/-127 payload) entries
    qkv8 = jnp.asarray(
        rng.choice([-128, -127, 0, 127], (b * t, 3 * h)), jnp.int8)
    bias = jnp.zeros((b, t), jnp.float32)
    want = EK.int8_attention_ref(qkv8, bias, sc, n_heads=nh, seq=t)
    got = EK.int8_attention(qkv8, bias, sc, n_heads=nh, seq=t,
                            interpret=True, dots="bf16")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_attention_bf16_dots_exactness_gate(tiny_setup):
    """dots='bf16' raises (never silently rounds) when the f32
    accumulator can't hold the phase-3 partial sums exactly; 'auto'
    falls back to 'i8' on the same shapes."""
    cfg, params, qcfg, qstate, static, plan, *_ = tiny_setup
    assert EK._bf16_dots_ok(128, 64) and EK._bf16_dots_ok(256, 64)
    assert not EK._bf16_dots_ok(384, 64)
    sc = plan["layers"][0]["attn_scal"]
    nh = cfg.num_attention_heads
    b, t, h = 1, 384, cfg.hidden_size
    rng = np.random.RandomState(3)
    qkv8 = jnp.asarray(rng.randint(-128, 128, (b * t, 3 * h)), jnp.int8)
    bias = jnp.zeros((b, t), jnp.float32)
    with pytest.raises(ValueError, match="not exact"):
        EK.int8_attention(qkv8, bias, sc, n_heads=nh, seq=t,
                          interpret=True, dots="bf16")
    want = EK.int8_attention_ref(qkv8, bias, sc, n_heads=nh, seq=t)
    got = EK.int8_attention(qkv8, bias, sc, n_heads=nh, seq=t,
                            interpret=True)  # auto -> i8 here
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_ffn_megakernel_bit_equals_separate_pair(tiny_setup):
    """int8_ffn_ln == int8_matmul(emit, act) -> int8_matmul_add_ln,
    bit-for-bit, in both the pallas-interpret kernel and the oracle."""
    cfg, params, qcfg, qstate, static, plan, int_params, batch = tiny_setup
    lp = plan["layers"][0]
    rng = np.random.RandomState(11)
    m, h = 64, cfg.hidden_size
    x8 = jnp.asarray(rng.randint(-128, 128, (m, h)), jnp.int8)
    r8 = jnp.asarray(rng.randint(-128, 128, (m, h)), jnp.int8)
    act = {"gelu": "gelu_new"}.get(cfg.hidden_act, cfg.hidden_act)
    i8 = EK.int8_matmul_ref(x8, lp["inter"]["w"], lp["inter"]["vecs"],
                            lp["inter"]["scal"], activation=act,
                            out_mode="emit")
    want = EK.int8_matmul_add_ln_ref(
        i8, lp["dense"]["w"], lp["dense"]["vecs"], lp["dense"]["scal"],
        r8, lp["ln2"]["gb"], lp["ln2"]["scal"], eps=static.ln_eps,
        res_quant=True)
    got_ref = EK.int8_ffn_ln_ref(
        x8, lp["inter"]["w"], lp["inter"]["vecs"], lp["inter"]["scal"],
        lp["dense"]["w"], lp["dense"]["vecs"], lp["dense"]["scal"],
        r8, lp["ln2"]["gb"], lp["ln2"]["scal"], activation=act,
        eps=static.ln_eps, res_quant=True)
    np.testing.assert_array_equal(np.asarray(got_ref), np.asarray(want))
    got_k = EK.int8_ffn_ln(
        x8, lp["inter"]["w"], lp["inter"]["vecs"], lp["inter"]["scal"],
        lp["dense"]["w"], lp["dense"]["vecs"], lp["dense"]["scal"],
        r8, lp["ln2"]["gb"], lp["ln2"]["scal"], activation=act,
        eps=static.ln_eps, res_quant=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_k), np.asarray(want))


def test_attn_megakernel_bit_equals_separate_chain(tiny_setup):
    """int8_attn_ln == int8_matmul(emit) -> int8_attention ->
    int8_matmul_add_ln, bit-for-bit (oracle and pallas-interpret)."""
    cfg, params, qcfg, qstate, static, plan, int_params, batch = tiny_setup
    lp = plan["layers"][0]
    rng = np.random.RandomState(13)
    b, t, h = 4, 16, cfg.hidden_size
    x8 = jnp.asarray(rng.randint(-128, 128, (b * t, h)), jnp.int8)
    mask = jnp.asarray((np.arange(t)[None, :] < [[5], [16], [9], [12]]),
                       jnp.float32)
    bias = (1.0 - mask) * -10000.0
    qkv8 = EK.int8_matmul_ref(x8, lp["qkv"]["w"], lp["qkv"]["vecs"],
                              lp["qkv"]["scal"], out_mode="emit")
    c8 = EK.int8_attention_ref(qkv8, bias, lp["attn_scal"],
                               n_heads=cfg.num_attention_heads, seq=t,
                               skip_max=static.attn_skip_max)
    want = EK.int8_matmul_add_ln_ref(
        c8, lp["attn_out"]["w"], lp["attn_out"]["vecs"],
        lp["attn_out"]["scal"], x8, lp["ln1"]["gb"], lp["ln1"]["scal"],
        eps=static.ln_eps, res_quant=True)
    args = (x8, lp["qkv"]["w"], lp["qkv"]["vecs"], lp["qkv"]["scal"],
            bias, lp["attn_scal"], lp["attn_out"]["w"],
            lp["attn_out"]["vecs"], lp["attn_out"]["scal"],
            lp["ln1"]["gb"], lp["ln1"]["scal"])
    got_ref = EK.int8_attn_ln_ref(*args, n_heads=cfg.num_attention_heads,
                                  seq=t, eps=static.ln_eps,
                                  res_quant=True,
                                  skip_max=static.attn_skip_max)
    np.testing.assert_array_equal(np.asarray(got_ref), np.asarray(want))
    for dots in ("i8", "bf16"):
        for g in (1, 2):
            got_k = EK.int8_attn_ln(*args,
                                    n_heads=cfg.num_attention_heads,
                                    seq=t, eps=static.ln_eps,
                                    res_quant=True,
                                    skip_max=static.attn_skip_max,
                                    interpret=True, group=g, dots=dots)
            np.testing.assert_array_equal(np.asarray(got_k),
                                          np.asarray(want))


def test_layer_megakernel_bit_equals_two_kernel_chain(tiny_setup):
    """int8_layer_ln == int8_attn_ln -> int8_ffn_ln (with the FFN's
    input as its own residual), bit-for-bit, for both dots modes and in
    both the oracle and the pallas-interpret kernel."""
    cfg, params, qcfg, qstate, static, plan, *_ = tiny_setup
    lp = plan["layers"][0]
    rng = np.random.RandomState(17)
    b, t, h = 4, 16, cfg.hidden_size
    x8 = jnp.asarray(rng.randint(-128, 128, (b * t, h)), jnp.int8)
    mask = jnp.asarray((np.arange(t)[None, :] < [[5], [16], [9], [12]]),
                       jnp.float32)
    bias = (1.0 - mask) * -10000.0
    act = {"gelu": "gelu_new"}.get(cfg.hidden_act, cfg.hidden_act)
    hx = EK.int8_attn_ln_ref(
        x8, lp["qkv"]["w"], lp["qkv"]["vecs"], lp["qkv"]["scal"], bias,
        lp["attn_scal"], lp["attn_out"]["w"], lp["attn_out"]["vecs"],
        lp["attn_out"]["scal"], lp["ln1"]["gb"], lp["ln1"]["scal"],
        n_heads=cfg.num_attention_heads, seq=t, eps=static.ln_eps,
        res_quant=True, skip_max=static.attn_skip_max)
    want = EK.int8_ffn_ln_ref(
        hx, lp["inter"]["w"], lp["inter"]["vecs"], lp["inter"]["scal"],
        lp["dense"]["w"], lp["dense"]["vecs"], lp["dense"]["scal"], hx,
        lp["ln2"]["gb"], lp["ln2"]["scal"], activation=act,
        eps=static.ln_eps, res_quant=True)
    args = (x8, lp["qkv"]["w"], lp["qkv"]["vecs"], lp["qkv"]["scal"],
            bias, lp["attn_scal"], lp["attn_out"]["w"],
            lp["attn_out"]["vecs"], lp["attn_out"]["scal"],
            lp["ln1"]["gb"], lp["ln1"]["scal"],
            lp["inter"]["w"], lp["inter"]["vecs"], lp["inter"]["scal"],
            lp["dense"]["w"], lp["dense"]["vecs"], lp["dense"]["scal"],
            lp["ln2"]["gb"], lp["ln2"]["scal"])
    kw = dict(n_heads=cfg.num_attention_heads, seq=t, eps=static.ln_eps,
              activation=act, skip_max=static.attn_skip_max)
    got_ref = EK.int8_layer_ln_ref(*args, **kw)
    np.testing.assert_array_equal(np.asarray(got_ref), np.asarray(want))
    for dots in ("i8", "bf16"):
        got_k = EK.int8_layer_ln(*args, interpret=True, dots=dots, **kw)
        np.testing.assert_array_equal(np.asarray(got_k), np.asarray(want))


def test_w4a8_engine_megakernels_interpret_matches_xla():
    """W4A8 (packed-int4 weights) through the full engine: the megakernel
    w4 branches (w4q/w4o/w4i/w4d) agree with the XLA-composed oracle."""
    from transformer_quantization_tpu.quant.manager import init_weight_qstate
    from transformer_quantization_tpu.quant.qconfig import Phase
    import dataclasses

    cfg = B.BertConfig(vocab_size=128, hidden_size=64, num_hidden_layers=2,
                       num_attention_heads=4, intermediate_size=128,
                       max_position_embeddings=64, num_labels=2)
    params, qcfg8, qstate8 = G._calibrated_bert(cfg, batch_size=2, seq=16)
    d4 = dataclasses.replace(G._w8a8_defaults(), n_bits=4, n_bits_act=8)
    qcfg = B.declare_bert_sites(d4, cfg)
    qstate = init_weight_qstate(qcfg, B.bert_weight_site_tensors(params))
    rng = np.random.RandomState(5)
    batch = {
        "input_ids": jnp.asarray(rng.randint(0, 128, (4, 16)), jnp.int32),
        "attention_mask": jnp.asarray(
            (np.arange(16)[None, :] < rng.randint(8, 17, (4, 1))),
            jnp.float32),
        "token_type_ids": jnp.zeros((4, 16), jnp.int32),
    }
    _, qstate = B.bert_apply(params, batch, cfg, qcfg, qstate,
                             QuantMode(act_phase=Phase.estimate))
    int4_params = B.build_bert_int_params(params, qcfg, qstate,
                                          use_int4=True)
    static, plan, _ = B.build_bert_engine(params, cfg, qcfg, qstate,
                                          int_params=int4_params,
                                          use_int4=True)
    assert any(any(f) for f in static.w4)  # int4 actually in play
    ref = B.bert_engine_apply(params, batch, cfg, qcfg, qstate, static,
                              plan, int4_params, backend="xla")
    out = B.bert_engine_apply(params, batch, cfg, qcfg, qstate, static,
                              plan, int4_params, backend="pallas",
                              interpret=True)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               np.asarray(ref["logits"]),
                               rtol=1e-5, atol=1e-5)


def test_per_channel_weight_engine_interpret_matches_xla():
    """Per-channel weight scales ride the engine's per-column epilogue
    vectors (engine _bcast): pallas-interpret == XLA oracle."""
    import dataclasses

    cfg = B.BertConfig(vocab_size=128, hidden_size=64, num_hidden_layers=2,
                       num_attention_heads=4, intermediate_size=128,
                       max_position_embeddings=64, num_labels=2)
    d = dataclasses.replace(G._w8a8_defaults(), per_channel_weights=True)
    params, qcfg, qstate = G._calibrated_bert(cfg, batch_size=2, seq=16,
                                              defaults=d)
    int_params = B.build_bert_int_params(params, qcfg, qstate)
    static, plan, _ = B.build_bert_engine(params, cfg, qcfg, qstate,
                                          int_params=int_params)
    rng = np.random.RandomState(9)
    batch = {
        "input_ids": jnp.asarray(rng.randint(0, 128, (4, 16)), jnp.int32),
        "attention_mask": jnp.ones((4, 16), jnp.float32),
        "token_type_ids": jnp.zeros((4, 16), jnp.int32),
    }
    ref = B.bert_engine_apply(params, batch, cfg, qcfg, qstate, static,
                              plan, int_params, backend="xla")
    out = B.bert_engine_apply(params, batch, cfg, qcfg, qstate, static,
                              plan, int_params, backend="pallas",
                              interpret=True)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               np.asarray(ref["logits"]),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Flex edges: the accuracy-preserving recipes ride the engine
# (reference README.md:159-173 — mixed W8A{8,16} and PEG quant_dicts)
# ---------------------------------------------------------------------------


def _flex_setup(quant_dict):
    from transformer_quantization_tpu.quant.manager import init_weight_qstate
    from transformer_quantization_tpu.quant.qconfig import Phase
    from transformer_quantization_tpu.training import calibration as CAL

    cfg = B.BertConfig(vocab_size=128, hidden_size=64, num_hidden_layers=2,
                       num_attention_heads=4, intermediate_size=128,
                       max_position_embeddings=64, num_labels=2)
    params = jax.jit(lambda k: B.init_bert_params(k, cfg))(
        jax.random.PRNGKey(0))
    qcfg = B.declare_bert_sites(G._w8a8_defaults(), cfg)
    qcfg = B.apply_bert_quant_dict(qcfg, quant_dict, cfg.num_hidden_layers)
    rng = np.random.RandomState(0)
    cal = {
        "input_ids": jnp.asarray(rng.randint(0, 128, (2, 16)), jnp.int32),
        "attention_mask": jnp.ones((2, 16), jnp.float32),
        "token_type_ids": jnp.zeros((2, 16), jnp.int32),
    }
    qstate = init_weight_qstate(qcfg, B.bert_weight_site_tensors(params))
    if any(isinstance(v, str) and v.startswith("ngp")
           for v in quant_dict.values()):
        apply_fn = lambda p, b, qcfg, qstate, mode: B.bert_apply(  # noqa
            p, b, cfg, qcfg, qstate, mode)
        qstate = CAL.record_permutation_ranges(apply_fn, params, qcfg,
                                               qstate, [cal])
    _, qstate = B.bert_apply(params, cal, cfg, qcfg, qstate,
                             QuantMode(act_phase=Phase.estimate))
    int_params = B.build_bert_int_params(params, qcfg, qstate)
    static, plan, _ = B.build_bert_engine(params, cfg, qcfg, qstate,
                                          int_params=int_params)
    batch = {
        "input_ids": jnp.asarray(rng.randint(0, 128, (4, 16)), jnp.int32),
        "attention_mask": jnp.asarray(
            (np.arange(16)[None, :] < rng.randint(8, 17, (4, 1))),
            jnp.float32),
        "token_type_ids": jnp.zeros((4, 16), jnp.int32),
    }
    return cfg, params, qcfg, qstate, static, plan, int_params, batch


@pytest.mark.parametrize("qd", [
    {"x": 16, "h": 16, "y": 16},
    {"x": "ngp4", "h": "ngp4", "y": "ngp4"},
    {"x": "ng4", "h": 16, "y": "per_embd"},
], ids=["mixed-w8a16", "peg-permuted", "mixed-combo"])
def test_engine_flex_recipes_match_generic(qd):
    """Mixed 16-bit and PEG 'x'/'h'/'y' sites run the engine (no fallback):
    16-bit sites travel as float value edges, per-embedding/grouped sites
    get per-column requant vectors — and match the generic QuantCtx int
    path on the same data."""
    cfg, params, qcfg, qstate, static, plan, int_params, batch = \
        _flex_setup(qd)
    assert static.any_flex
    ref, _ = B.bert_apply(params, batch, cfg, qcfg, qstate, QuantMode(),
                          int_params=int_params)
    out = B.bert_engine_apply(params, batch, cfg, qcfg, qstate, static,
                              plan, int_params, backend="xla")
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               np.asarray(ref["logits"]),
                               rtol=2e-3, atol=3e-3)
    pal = B.bert_engine_apply(params, batch, cfg, qcfg, qstate, static,
                              plan, int_params, backend="pallas",
                              interpret=True)
    np.testing.assert_allclose(np.asarray(pal["logits"]),
                               np.asarray(out["logits"]),
                               rtol=1e-4, atol=1e-4)
    # bf16 activation storage must NOT degrade the flex value edges (they
    # carry 16-bit grids and travel f32 regardless of engine_dtype) —
    # only the entry/exit residual stream is bf16
    bf = B.bert_engine_apply(params, batch, cfg, qcfg, qstate, static,
                             plan, int_params, backend="xla",
                             engine_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(bf["logits"]),
                               np.asarray(ref["logits"]),
                               rtol=3e-2, atol=3e-2)


def test_engine_flex_rejects_mixed_backend():
    cfg, params, qcfg, qstate, static, plan, int_params, batch = \
        _flex_setup({"x": 16, "h": 16, "y": 16})
    with pytest.raises(ValueError, match="uniform engine backend"):
        B.bert_engine_apply(params, batch, cfg, qcfg, qstate, static,
                            plan, int_params, backend="mix:xla,pallas,xla")
