"""DistilBERT + ALBERT families — capability superset (the reference can
only run these as FP32 baselines; here they are quantizable too)."""

import functools

import jax.numpy as jnp
import numpy as np
import pytest

from transformer_quantization_tpu.models.registry import build_model
from transformer_quantization_tpu.quant.qconfig import QuantDefaults
from transformer_quantization_tpu.quant.quantizers import QMethod
from transformer_quantization_tpu.quant.ranges import RangeMethod
from transformer_quantization_tpu.training.calibration import (
    prepare_quantized_model,
)


def sym_defaults():
    return QuantDefaults(method=QMethod.symmetric_uniform,
                         act_method=QMethod.asymmetric_uniform, n_bits=8,
                         weight_range_method=RangeMethod.current_minmax,
                         act_range_method=RangeMethod.current_minmax)


@pytest.mark.parametrize("model_name", ["distilbert_base_uncased",
                                        "albert_base_v2"])
def test_fp32_and_ptq_and_int_parity(model_name):
    fam, cfg, params = build_model(model_name, tiny=True, seed=0)
    rng = np.random.RandomState(0)
    batch = {"input_ids": jnp.asarray(rng.randint(0, cfg.vocab_size, (4, 16)),
                                      jnp.int32),
             "attention_mask": jnp.ones((4, 16), jnp.float32),
             "labels": jnp.asarray([0, 1, 1, 0], jnp.int32)}
    out, _ = fam.apply(params, batch, cfg)
    assert out["logits"].shape == (4, 2)
    assert np.isfinite(float(out["loss"]))

    qcfg = fam.declare_sites(sym_defaults(), cfg)
    model_batch = {k: v for k, v in batch.items() if k != "labels"}
    apply_fn = functools.partial(fam.apply, cfg=cfg)
    qstate, mode = prepare_quantized_model(
        apply_fn, params, qcfg, [model_batch],
        weight_tensors=fam.weight_site_tensors(params))
    out_q, _ = fam.apply(params, model_batch, cfg, qcfg, qstate, mode)
    dq = float(jnp.max(jnp.abs(out_q["logits"] - out["logits"])))
    assert 0.0 < dq < 5.0

    int_params = fam.build_int_params(params, qcfg, qstate, False)
    assert int_params
    out_i, _ = fam.apply(params, model_batch, cfg, qcfg, qstate, mode,
                         int_params=int_params)
    np.testing.assert_allclose(np.asarray(out_i["logits"]),
                               np.asarray(out_q["logits"]),
                               rtol=1e-3, atol=1e-4)


def test_albert_weight_sharing():
    fam, cfg, params = build_model("albert_base_v2", tiny=True, seed=1)
    qcfg = fam.declare_sites(sym_defaults(), cfg)
    # one shared set of layer sites, regardless of depth
    assert "shared.attn.q.w" in qcfg
    assert "L0.attn.q.w" not in qcfg
    n_weight = len([1 for n, c in qcfg.items() if c.kind == "weight"])
    # 4 embedding (3 tables + LN) + proj + 8 shared (6 linear + 2 LN)
    # + pooler + classifier = 15
    assert n_weight == 15


def test_albert_quant_dict_collapses_layers():
    fam, cfg, params = build_model("albert_base_v2", tiny=True)
    qcfg = fam.declare_sites(sym_defaults(), cfg)
    qcfg = fam.apply_quant_dict(qcfg, {"y1": 16, "C": "fp32"},
                                cfg.num_hidden_layers)
    assert qcfg["shared.ffn.res"].spec.n_bits == 16
    assert not qcfg["classifier.out"].enabled


def test_distilbert_no_token_type_site():
    fam, cfg, params = build_model("distilbert_base_uncased", tiny=True)
    qcfg = fam.declare_sites(sym_defaults(), cfg)
    assert not qcfg["emb.token_type.w"].enabled
    assert "clf.pre.w" in qcfg and "pooler.dense.w" not in qcfg


def test_adaround_specs_match_weight_sites():
    for name in ("distilbert_base_uncased", "albert_base_v2"):
        fam, cfg, params = build_model(name, tiny=True)
        qcfg = fam.declare_sites(sym_defaults(), cfg)
        spec_names = {n for n, _ in fam.adaround_specs(params, cfg)}
        weight_sites = {n[:-2] for n, c in qcfg.items()
                        if c.kind == "weight" and c.enabled}
        assert weight_sites <= spec_names, (name,
                                            weight_sites - spec_names)


def test_squeezebert_family():
    fam, cfg, params = build_model("squeezebert_uncased", tiny=True, seed=3)
    rng = np.random.RandomState(3)
    batch = {"input_ids": jnp.asarray(
                 rng.randint(0, cfg.vocab_size, (4, 16)), jnp.int32),
             "attention_mask": jnp.ones((4, 16), jnp.float32)}
    out, _ = fam.apply(params, batch, cfg)
    qcfg = fam.declare_sites(sym_defaults(), cfg)
    apply_fn = functools.partial(fam.apply, cfg=cfg)
    qstate, mode = prepare_quantized_model(
        apply_fn, params, qcfg, [batch],
        weight_tensors=fam.weight_site_tensors(params))
    out_q, _ = fam.apply(params, batch, cfg, qcfg, qstate, mode)
    dq = float(jnp.max(jnp.abs(out_q["logits"] - out["logits"])))
    assert 0.0 < dq < 5.0
    # grouped kernels are (out, in/groups)
    k = params["layers"][0]["attn"]["q"]["kernel"]
    assert k.shape == (cfg.hidden_size, cfg.hidden_size // cfg.q_groups)


def test_grouped_linear_matches_blockdiag_dense():
    from transformer_quantization_tpu.models import bert as B
    from transformer_quantization_tpu.ops.layers import quant_grouped_linear
    from transformer_quantization_tpu.quant.qconfig import (
        QuantModelConfig, QuantMode)

    rng = np.random.RandomState(4)
    g, out_f, in_f = 4, 16, 8
    w = jnp.asarray(rng.normal(0, 0.2, (out_f, in_f // g)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.1, (out_f,)), jnp.float32)
    x = jnp.asarray(rng.normal(0, 1, (3, in_f)), jnp.float32)
    ctx = B.make_ctx(QuantModelConfig(()), {}, QuantMode())
    y = quant_grouped_linear(ctx, "t", x, w, b, g)
    # dense equivalent: block-diagonal weight
    wd = np.zeros((out_f, in_f), np.float32)
    og, ig = out_f // g, in_f // g
    for j in range(g):
        wd[j * og:(j + 1) * og, j * ig:(j + 1) * ig] = \
            np.asarray(w)[j * og:(j + 1) * og]
    y_ref = x @ wd.T + b
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)


def test_albert_engine_parity():
    """ALBERT rides the full-handoff int8 engine: the shared layer's
    sites/weights repeat through the generic plan (prefixes=['shared.']),
    and both backends match the generic int path."""
    fam, cfg, params = build_model("albert_base_v2", tiny=True, seed=2)
    rng = np.random.RandomState(2)
    batch = {"input_ids": jnp.asarray(rng.randint(0, cfg.vocab_size, (4, 16)),
                                      jnp.int32),
             "attention_mask": jnp.asarray(
                 (np.arange(16)[None, :] < rng.randint(8, 17, (4, 1))),
                 jnp.float32)}
    qcfg = fam.declare_sites(sym_defaults(), cfg)
    apply_fn = functools.partial(fam.apply, cfg=cfg)
    qstate, mode = prepare_quantized_model(
        apply_fn, params, qcfg, [batch],
        weight_tensors=fam.weight_site_tensors(params))
    int_params = fam.build_int_params(params, qcfg, qstate, False)
    ref, _ = fam.apply(params, batch, cfg, qcfg, qstate, mode,
                       int_params=int_params)

    static, plan, e_int = fam.build_engine(params, cfg, qcfg, qstate)
    out = fam.engine_apply(params, batch, cfg, qcfg, qstate, static, plan,
                           e_int, backend="xla")
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               np.asarray(ref["logits"]),
                               rtol=1e-3, atol=2e-3)
    out_pl = fam.engine_apply(params, batch, cfg, qcfg, qstate, static,
                              plan, e_int, backend="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(out_pl["logits"]),
                               np.asarray(out["logits"]),
                               rtol=1e-4, atol=1e-4)


def test_distilbert_engine_parity():
    """DistilBERT's standard L{i}. encoder rides the engine directly."""
    fam, cfg, params = build_model("distilbert_base_uncased", tiny=True,
                                   seed=3)
    rng = np.random.RandomState(3)
    batch = {"input_ids": jnp.asarray(rng.randint(0, cfg.vocab_size, (4, 16)),
                                      jnp.int32),
             "attention_mask": jnp.asarray(
                 (np.arange(16)[None, :] < rng.randint(8, 17, (4, 1))),
                 jnp.float32)}
    qcfg = fam.declare_sites(sym_defaults(), cfg)
    apply_fn = functools.partial(fam.apply, cfg=cfg)
    qstate, mode = prepare_quantized_model(
        apply_fn, params, qcfg, [batch],
        weight_tensors=fam.weight_site_tensors(params))
    int_params = fam.build_int_params(params, qcfg, qstate, False)
    ref, _ = fam.apply(params, batch, cfg, qcfg, qstate, mode,
                       int_params=int_params)

    static, plan, e_int = fam.build_engine(params, cfg, qcfg, qstate)
    out = fam.engine_apply(params, batch, cfg, qcfg, qstate, static, plan,
                           e_int, backend="xla")
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               np.asarray(ref["logits"]),
                               rtol=1e-3, atol=2e-3)
    out_pl = fam.engine_apply(params, batch, cfg, qcfg, qstate, static,
                              plan, e_int, backend="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(out_pl["logits"]),
                               np.asarray(out["logits"]),
                               rtol=1e-4, atol=1e-4)


def test_squeezebert_engine_parity():
    """SqueezeBERT's grouped convs densify to block-diagonal kernels and
    ride the shared BERT engine; off-block zeros quantize exactly (0 is
    always on the symmetric grid), so the engine matches the grouped
    fake-quant generic path."""
    fam, cfg, params = build_model("squeezebert_uncased", tiny=True, seed=5)
    rng = np.random.RandomState(5)
    batch = {"input_ids": jnp.asarray(rng.randint(0, cfg.vocab_size, (4, 16)),
                                      jnp.int32),
             "attention_mask": jnp.asarray(
                 (np.arange(16)[None, :] < rng.randint(8, 17, (4, 1))),
                 jnp.float32)}
    qcfg = fam.declare_sites(sym_defaults(), cfg)
    apply_fn = functools.partial(fam.apply, cfg=cfg)
    qstate, mode = prepare_quantized_model(
        apply_fn, params, qcfg, [batch],
        weight_tensors=fam.weight_site_tensors(params))
    int_params = fam.build_int_params(params, qcfg, qstate, False)
    ref, _ = fam.apply(params, batch, cfg, qcfg, qstate, mode,
                       int_params=int_params)

    static, plan, e_int = fam.build_engine(params, cfg, qcfg, qstate)
    out = fam.engine_apply(params, batch, cfg, qcfg, qstate, static, plan,
                           e_int, backend="xla")
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               np.asarray(ref["logits"]),
                               rtol=1e-3, atol=2e-3)
    out_pl = fam.engine_apply(params, batch, cfg, qcfg, qstate, static,
                              plan, e_int, backend="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(out_pl["logits"]),
                               np.asarray(out["logits"]),
                               rtol=1e-4, atol=1e-4)


def test_squeezebert_blockdiag_densify_exact():
    """Densified int8 grouped matmul == grouped fake-quant matmul
    (the engine's exactness argument, checked directly)."""
    from transformer_quantization_tpu.models import squeezebert as S
    from transformer_quantization_tpu.ops import int_linear as IL
    from transformer_quantization_tpu.quant import quantizers as Q

    rng = np.random.RandomState(6)
    g, out_f, in_f = 4, 16, 16
    w = jnp.asarray(rng.normal(0, 0.2, (out_f, in_f // g)), jnp.float32)
    wd = S._block_diag_kernel(w, g)
    spec = Q.QuantizerSpec(method=Q.QMethod.symmetric_uniform, n_bits=8)
    qp = Q.set_quant_range(spec, jnp.min(w, axis=1), jnp.max(w, axis=1))
    packed = IL.pack_weight_int8(spec, qp, wd)
    # every off-block int must be exactly zero
    blocks = np.asarray(packed["w_int"]).reshape(g, out_f // g, in_f)
    for j in range(g):
        m = np.ones((out_f // g, in_f), bool)
        m[:, j * (in_f // g):(j + 1) * (in_f // g)] = False
        assert np.all(blocks[j][m] == 0)


@pytest.mark.parametrize("model_name", ["bert_base_uncased", "roberta_base",
                                        "mobilebert_uncased",
                                        "distilbert_base_uncased",
                                        "albert_base_v2",
                                        "squeezebert_uncased"])
def test_amp_qat_step_all_families(model_name):
    """One --amp QAT train step (bf16 matmuls, f32 master state) per
    family: finite f32 loss, f32 parameter leaves."""
    import jax
    import optax
    from transformer_quantization_tpu.quant.manager import init_weight_qstate
    from transformer_quantization_tpu.training import qat as QAT

    fam, cfg, params = build_model(model_name, tiny=True, seed=0)
    qcfg = fam.declare_sites(sym_defaults(), cfg)
    qstate = init_weight_qstate(qcfg, fam.weight_site_tensors(params))

    apply_fn = functools.partial(fam.apply, cfg=cfg)
    qat_cfg = QAT.QATConfig(compute_dtype="bfloat16")
    tx = optax.adamw(1e-4)
    step = QAT.make_qat_train_step(apply_fn, qcfg, qat_cfg, tx, donate=False)
    p, learnable, rest, opt = QAT.init_qat_state(qcfg, qat_cfg, params,
                                                 qstate, tx)
    rng = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(rng.randint(0, cfg.vocab_size, (4, 16)),
                                 jnp.int32),
        "attention_mask": jnp.ones((4, 16), jnp.float32),
        "labels": jnp.asarray(rng.randint(0, 2, (4,)), jnp.int32),
    }
    out = step(p, learnable, rest, opt, batch, jax.random.PRNGKey(0))
    loss = out[-1]
    assert loss.dtype == jnp.float32 and np.isfinite(float(loss))
    for leaf in jax.tree.leaves(out[0]):
        assert leaf.dtype == jnp.float32, leaf.dtype


@pytest.mark.parametrize("model_name", ["bert_base_uncased", "roberta_base",
                                        "mobilebert_uncased",
                                        "distilbert_base_uncased",
                                        "albert_base_v2",
                                        "squeezebert_uncased"])
def test_remat_step_matches_plain(model_name):
    """jax.checkpoint rematerialization: one QAT step with --remat must
    produce the same loss AND the same updated params as without (remat
    changes the memory/FLOPs schedule, not the math)."""
    import jax
    import optax
    from transformer_quantization_tpu.quant.manager import init_weight_qstate
    from transformer_quantization_tpu.training import qat as QAT

    fam, cfg, params = build_model(model_name, tiny=True, seed=0)
    qcfg = fam.declare_sites(sym_defaults(), cfg)
    qstate = init_weight_qstate(qcfg, fam.weight_site_tensors(params))
    apply_fn = functools.partial(fam.apply, cfg=cfg)
    tx = optax.adamw(1e-4)
    rng = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(rng.randint(0, cfg.vocab_size, (4, 16)),
                                 jnp.int32),
        "attention_mask": jnp.ones((4, 16), jnp.float32),
        "labels": jnp.asarray(rng.randint(0, 2, (4,)), jnp.int32),
    }

    outs = {}
    for remat in (False, True):
        qat_cfg = QAT.QATConfig(remat=remat)
        step = QAT.make_qat_train_step(apply_fn, qcfg, qat_cfg, tx,
                                       donate=False)
        p, learnable, rest, opt = QAT.init_qat_state(qcfg, qat_cfg, params,
                                                     qstate, tx)
        out = step(p, learnable, rest, opt, batch, jax.random.PRNGKey(0))
        outs[remat] = (out[0], out[-1])
    np.testing.assert_allclose(float(outs[True][1]), float(outs[False][1]),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(outs[True][0]),
                    jax.tree.leaves(outs[False][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_squeezebert_grouped_int_path_parity():
    """Grouped (block-diagonal) kernels now ride the real int8 path:
    model-level output matches the fake-quant simulation, and the packed
    payloads actually cover the grouped sites."""
    fam, cfg, params = build_model("squeezebert_uncased", tiny=True, seed=3)
    rng = np.random.RandomState(3)
    batch = {"input_ids": jnp.asarray(
                 rng.randint(0, cfg.vocab_size, (4, 16)), jnp.int32),
             "attention_mask": jnp.ones((4, 16), jnp.float32)}
    qcfg = fam.declare_sites(sym_defaults(), cfg)
    apply_fn = functools.partial(fam.apply, cfg=cfg)
    qstate, mode = prepare_quantized_model(
        apply_fn, params, qcfg, [batch],
        weight_tensors=fam.weight_site_tensors(params))
    out_q, _ = fam.apply(params, batch, cfg, qcfg, qstate, mode)
    int_params = fam.build_int_params(params, qcfg, qstate, False)
    assert "L0.attn.q" in int_params          # grouped site packed
    assert "L0.ffn.inter" in int_params
    out_i, _ = fam.apply(params, batch, cfg, qcfg, qstate, mode,
                         int_params=int_params)
    np.testing.assert_allclose(np.asarray(out_i["logits"]),
                               np.asarray(out_q["logits"]),
                               rtol=1e-3, atol=1e-4)
