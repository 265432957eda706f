"""GPipe pipeline parallelism over the 'pp' mesh axis (parallel/pipeline.py).

Forward and train-step parity vs single device on the virtual 8-device CPU
mesh, composition with dp (automatic axes inside the manual pp program),
and the read-only-state gate. No reference counterpart (SURVEY.md §2.6)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer_quantization_tpu.models import bert as B
from transformer_quantization_tpu.parallel.mesh import make_mesh
from transformer_quantization_tpu.quant.qconfig import (
    Phase,
    QuantDefaults,
    QuantMode,
)
from transformer_quantization_tpu.quant.quantizers import QMethod
from transformer_quantization_tpu.quant.ranges import RangeMethod
from transformer_quantization_tpu.training.calibration import (
    prepare_quantized_model,
)

CFG = B.BertConfig(vocab_size=128, hidden_size=32, num_hidden_layers=4,
                   num_attention_heads=2, intermediate_size=64,
                   max_position_embeddings=32, num_labels=2,
                   hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    params = B.init_bert_params(jax.random.PRNGKey(0), CFG)
    d = QuantDefaults(method=QMethod.symmetric_uniform,
                      act_method=QMethod.asymmetric_uniform, n_bits=8,
                      weight_range_method=RangeMethod.current_minmax,
                      act_range_method=RangeMethod.current_minmax)
    qcfg = B.declare_bert_sites(d, CFG)
    rng = np.random.RandomState(0)
    bsz, seq = 16, 16
    batch = {
        "input_ids": jnp.asarray(rng.randint(0, 128, (bsz, seq)), jnp.int32),
        "attention_mask": jnp.asarray(
            (rng.rand(bsz, seq) > 0.2).astype(np.float32)),
        "token_type_ids": jnp.zeros((bsz, seq), jnp.int32),
    }
    batch["attention_mask"] = batch["attention_mask"].at[:, 0].set(1.0)
    apply_fn = functools.partial(B.bert_apply, cfg=CFG)
    qstate, mode = prepare_quantized_model(
        apply_fn, params, qcfg, [batch],
        weight_tensors=B.bert_weight_site_tensors(params))
    return params, qcfg, qstate, mode, batch


def test_pp_forward_matches_single_device(setup):
    params, qcfg, qstate, mode, batch = setup
    ref, _ = jax.jit(functools.partial(B.bert_apply, cfg=CFG, qcfg=qcfg,
                                       mode=mode))(params, batch,
                                                   qstate=qstate)
    mesh = make_mesh(pp=4)
    with jax.set_mesh(mesh):
        out, _ = jax.jit(functools.partial(
            B.bert_apply, cfg=CFG, qcfg=qcfg, mode=mode, pp_mesh=mesh,
            pp_microbatches=4))(params, batch, qstate=qstate)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               np.asarray(ref["logits"]),
                               rtol=1e-5, atol=1e-5)


def test_pp_composes_with_dp(setup):
    params, qcfg, qstate, mode, batch = setup
    ref, _ = jax.jit(functools.partial(B.bert_apply, cfg=CFG, qcfg=qcfg,
                                       mode=mode))(params, batch,
                                                   qstate=qstate)
    mesh = make_mesh(dp=2, pp=4)
    from jax.sharding import NamedSharding, PartitionSpec as P

    with jax.set_mesh(mesh):
        b = {k: jax.device_put(v, NamedSharding(mesh, P("dp")))
             for k, v in batch.items()}
        out, _ = jax.jit(functools.partial(
            B.bert_apply, cfg=CFG, qcfg=qcfg, mode=mode, pp_mesh=mesh,
            pp_microbatches=2))(params, b, qstate=qstate)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               np.asarray(ref["logits"]),
                               rtol=1e-5, atol=1e-5)


def test_pp_fp32_baseline_forward(setup):
    """Pipeline works for the unquantized model too (qcfg=None)."""
    params, _, _, _, batch = setup
    fp = QuantMode(weight_quant=False, act_quant=False)
    ref, _ = jax.jit(functools.partial(B.bert_apply, cfg=CFG,
                                       mode=fp))(params, batch)
    mesh = make_mesh(pp=2)
    with jax.set_mesh(mesh):
        out, _ = jax.jit(functools.partial(
            B.bert_apply, cfg=CFG, mode=fp, pp_mesh=mesh,
            pp_microbatches=4))(params, batch)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               np.asarray(ref["logits"]),
                               rtol=1e-5, atol=1e-5)


def test_pp_qat_train_step_matches_single_device(setup):
    """One learn-ranges QAT step on a dp=2 x pp=4 mesh: loss and updated
    params match the single-device step (dropout disabled in CFG; the
    pipeline's per-microbatch rng folding is then inert)."""
    from transformer_quantization_tpu.training import qat as QAT
    from transformer_quantization_tpu.utils.glue import TASKS  # noqa: F401

    params, qcfg, qstate, _, batch = setup
    labels = jnp.asarray(np.random.RandomState(1).randint(0, 2, (16,)),
                         jnp.int32)
    tbatch = dict(batch, labels=labels)
    apply_fn = functools.partial(B.bert_apply, cfg=CFG)

    def one_step(qat_cfg, mesh=None):
        tx = QAT.make_optimizer(qat_cfg)
        step = QAT.make_qat_train_step(apply_fn, qcfg, qat_cfg, tx,
                                       donate=False)
        p, learn, rest, opt = QAT.init_qat_state(
            qcfg, qat_cfg, jax.tree.map(jnp.copy, params),
            jax.tree.map(jnp.copy, dict(qstate)), tx)
        if mesh is not None:
            with jax.set_mesh(mesh):
                out = step(p, learn, rest, opt, tbatch, jax.random.PRNGKey(7))
        else:
            out = step(p, learn, rest, opt, tbatch, jax.random.PRNGKey(7))
        return out[0], out[1], out[-1]  # params, learnable, loss

    base = QAT.QATConfig(learn_ranges=True, learning_rate=1e-4)
    p_ref, l_ref, loss_ref = one_step(base)

    mesh = make_mesh(dp=2, pp=4)
    pp_cfg = QAT.QATConfig(learn_ranges=True, learning_rate=1e-4,
                           pp_mesh=mesh, pp_microbatches=2)
    p_pp, l_pp, loss_pp = one_step(pp_cfg, mesh=mesh)

    np.testing.assert_allclose(float(loss_pp), float(loss_ref),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_pp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    for a, b in zip(jax.tree.leaves(l_ref), jax.tree.leaves(l_pp)):
        # Learned-range (LSQ) leaves get a looser bound: their gradient is
        # a sum of O(1) per-element terms gated by the clip-boundary mask
        # (quant/quantizers.py clamp — torch-parity inclusive-keep
        # semantics). Microbatched matmuls reduce in a different order
        # than the full batch, so a half-ulp flip of round(x/scale) on a
        # grid boundary moves one element in/out of the mask — an O(lr)
        # jump in a scalar leaf after one step, not a pipeline bug.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=5e-4)


def test_pp_rejects_estimate_phase(setup):
    params, qcfg, qstate, _, batch = setup
    est = QuantMode(act_phase=Phase.estimate)
    mesh = make_mesh(pp=4)
    with pytest.raises(ValueError, match="bubble garbage|estimate"):
        with jax.set_mesh(mesh):
            B.bert_apply(params, batch, CFG, qcfg, qstate, est,
                         pp_mesh=mesh, pp_microbatches=4)


def test_pp_rejects_indivisible_layers(setup):
    params, qcfg, qstate, mode, batch = setup
    mesh = make_mesh(pp=8)  # 4 layers % 8 stages != 0
    with pytest.raises(ValueError, match="divisible"):
        with jax.set_mesh(mesh):
            B.bert_apply(params, batch, CFG, qcfg, qstate, mode,
                         pp_mesh=mesh, pp_microbatches=4)


@pytest.mark.parametrize("model_name", ["roberta_base",
                                        "distilbert_base_uncased",
                                        "albert_base_v2",
                                        "mobilebert_uncased",
                                        "squeezebert_uncased"])
def test_pp_forward_all_families(model_name):
    """Every quantizable family pipelines: pp=2 forward parity vs single
    device (ALBERT uses the shared-weights pipeline variant)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    from transformer_quantization_tpu.models.registry import build_model
    from transformer_quantization_tpu.quant.qconfig import QuantDefaults

    fam, cfg, params = build_model(model_name, tiny=True, seed=0)
    d = QuantDefaults(method=QMethod.symmetric_uniform,
                      act_method=QMethod.asymmetric_uniform, n_bits=8,
                      weight_range_method=RangeMethod.current_minmax,
                      act_range_method=RangeMethod.current_minmax)
    qcfg = fam.declare_sites(d, cfg)
    rng = np.random.RandomState(0)
    batch = {"input_ids": jnp.asarray(
                 rng.randint(0, cfg.vocab_size, (8, 16)), jnp.int32),
             "attention_mask": jnp.ones((8, 16), jnp.float32)}
    apply_fn = functools.partial(fam.apply, cfg=cfg)
    qstate, mode = prepare_quantized_model(
        apply_fn, params, qcfg, [batch],
        weight_tensors=fam.weight_site_tensors(params))
    ref, _ = jax.jit(functools.partial(
        fam.apply, cfg=cfg, qcfg=qcfg, mode=mode))(params, batch,
                                                   qstate=qstate)
    mesh = make_mesh(pp=2)
    with jax.set_mesh(mesh):
        out, _ = jax.jit(functools.partial(
            fam.apply, cfg=cfg, qcfg=qcfg, mode=mode, pp_mesh=mesh,
            pp_microbatches=2))(params, batch, qstate=qstate)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               np.asarray(ref["logits"]),
                               rtol=1e-5, atol=1e-5)


def test_pp_serving_engine(setup):
    """ServingEngine over a pp=4 pipeline forward: stage-parallel serving
    — results match the single-device forward."""
    params, qcfg, qstate, mode, batch = setup
    from transformer_quantization_tpu.serving.engine import (
        ServeConfig,
        ServingEngine,
    )

    mesh = make_mesh(pp=4)
    fwd = jax.jit(functools.partial(
        B.bert_apply, cfg=CFG, qcfg=qcfg, mode=mode, qstate=qstate,
        pp_mesh=mesh, pp_microbatches=2))

    def serve_fwd(b):
        out, _ = fwd(params, b)
        return out["logits"]

    scfg = ServeConfig(max_batch=8, seq_buckets=(16,), batch_buckets=(4, 8))
    eng = ServingEngine(serve_fwd, scfg)
    rng = np.random.RandomState(3)
    ids = rng.randint(1, 128, 16).astype(np.int32)
    with jax.set_mesh(mesh):
        with eng:
            logits = eng.submit_ids(ids).result(timeout=300)
    ref_batch = {"input_ids": jnp.asarray(ids)[None],
                 "attention_mask": jnp.ones((1, 16), jnp.float32),
                 "token_type_ids": jnp.zeros((1, 16), jnp.int32)}
    out, _ = B.bert_apply(params, ref_batch, CFG, qcfg, qstate, mode)
    np.testing.assert_allclose(logits, np.asarray(out["logits"][0]),
                               rtol=2e-4, atol=2e-4)


def test_pp_with_remat_matches(setup):
    """Pipeline + remat: recomputing layer activations in the backward
    changes memory, not numerics — one QAT step matches pp without remat."""
    from transformer_quantization_tpu.training import qat as QAT

    params, qcfg, qstate, _, batch = setup
    labels = jnp.asarray(np.random.RandomState(1).randint(0, 2, (16,)),
                         jnp.int32)
    tbatch = dict(batch, labels=labels)
    apply_fn = functools.partial(B.bert_apply, cfg=CFG)
    mesh = make_mesh(pp=4)

    def one_step(remat):
        qat_cfg = QAT.QATConfig(learn_ranges=True, learning_rate=1e-4,
                                pp_mesh=mesh, pp_microbatches=2, remat=remat)
        tx = QAT.make_optimizer(qat_cfg)
        step = QAT.make_qat_train_step(apply_fn, qcfg, qat_cfg, tx,
                                       donate=False)
        p, learn, rest, opt = QAT.init_qat_state(
            qcfg, qat_cfg, jax.tree.map(jnp.copy, params),
            jax.tree.map(jnp.copy, dict(qstate)), tx)
        with jax.set_mesh(mesh):
            out = step(p, learn, rest, opt, tbatch, jax.random.PRNGKey(7))
        return out[0], out[-1]

    p_plain, loss_plain = one_step(False)
    p_remat, loss_remat = one_step(True)
    np.testing.assert_allclose(float(loss_remat), float(loss_plain),
                               rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree.leaves(p_plain), jax.tree.leaves(p_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_pp_composes_with_dp_and_sp(setup):
    """dp x sp x pp on one mesh: batch AND sequence stay GSPMD-sharded
    (automatic axes) inside the manual pipeline region."""
    params, qcfg, qstate, mode, batch = setup
    ref, _ = jax.jit(functools.partial(B.bert_apply, cfg=CFG, qcfg=qcfg,
                                       mode=mode))(params, batch,
                                                   qstate=qstate)
    mesh = make_mesh(dp=2, sp=2, pp=2)
    from jax.sharding import NamedSharding, PartitionSpec as P

    with jax.set_mesh(mesh):
        b = {k: jax.device_put(v, NamedSharding(mesh, P("dp", "sp")))
             for k, v in batch.items()}
        out, _ = jax.jit(functools.partial(
            B.bert_apply, cfg=CFG, qcfg=qcfg, mode=mode, pp_mesh=mesh,
            pp_microbatches=2))(params, b, qstate=qstate)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               np.asarray(ref["logits"]),
                               rtol=1e-5, atol=1e-5)


def test_pp_composes_with_tp(setup):
    """tp x pp: Megatron-sharded weights stay tensor-parallel (automatic
    axis) inside each pipeline stage — all four parallel axes compose."""
    from transformer_quantization_tpu.parallel.mesh import bert_param_pspecs
    from jax.sharding import NamedSharding, PartitionSpec as P

    params, qcfg, qstate, mode, batch = setup
    ref, _ = jax.jit(functools.partial(B.bert_apply, cfg=CFG, qcfg=qcfg,
                                       mode=mode))(params, batch,
                                                   qstate=qstate)
    mesh = make_mesh(tp=2, pp=4)
    p_sh = jax.tree.map(lambda x, s: jax.device_put(
        x, NamedSharding(mesh, s)), params, bert_param_pspecs(CFG))
    with jax.set_mesh(mesh):
        out, _ = jax.jit(functools.partial(
            B.bert_apply, cfg=CFG, qcfg=qcfg, mode=mode, pp_mesh=mesh,
            pp_microbatches=2))(p_sh, batch, qstate=qstate)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               np.asarray(ref["logits"]),
                               rtol=1e-5, atol=1e-5)


def test_pp_composes_with_bf16_compute(setup):
    """--amp + pipeline: the collect-psum runs in f32 (a bf16 all-reduce
    after the stage mask crashes XLA CPU's AllReducePromotion pass);
    results match the single-device bf16 forward to bf16 precision."""
    params, qcfg, qstate, mode, batch = setup
    ref, _ = jax.jit(functools.partial(
        B.bert_apply, cfg=CFG, qcfg=qcfg, mode=mode,
        compute_dtype=jnp.bfloat16))(params, batch, qstate=qstate)
    mesh = make_mesh(pp=4)
    with jax.set_mesh(mesh):
        out, _ = jax.jit(functools.partial(
            B.bert_apply, cfg=CFG, qcfg=qcfg, mode=mode,
            compute_dtype=jnp.bfloat16, pp_mesh=mesh,
            pp_microbatches=2))(params, batch, qstate=qstate)
    np.testing.assert_allclose(np.asarray(out["logits"], np.float32),
                               np.asarray(ref["logits"], np.float32),
                               rtol=2e-2, atol=2e-2)
