"""Checkpoint/resume: quantized params + quant state round-trip
(SURVEY.md §5 checkpoint row — the reference only saves HF weights +
adaround alphas; this framework checkpoints the full calibration artifact)."""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from transformer_quantization_tpu.models import bert as B
from transformer_quantization_tpu.quant.qconfig import QuantDefaults
from transformer_quantization_tpu.quant.quantizers import QMethod
from transformer_quantization_tpu.quant.ranges import RangeMethod
from transformer_quantization_tpu.training.calibration import (
    prepare_quantized_model,
)
from transformer_quantization_tpu.utils import checkpoint as CK

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
    return params, qcfg, qstate, mode, batch


def test_tree_roundtrip(tmp_path):
    tree = {"a": jnp.arange(4.0), "b": [jnp.ones((2, 2)), None],
            "c": {"d": jnp.asarray(3, jnp.int32)}}
    p = str(tmp_path / "t.npz")
    CK.save_tree(p, tree)
    got = CK.load_tree(p)
    np.testing.assert_array_equal(np.asarray(got["a"]), np.arange(4.0))
    assert got["b"][1] is None
    assert isinstance(got["b"], list)
    assert int(got["c"]["d"]) == 3


def test_checkpoint_roundtrip_bitexact(tmp_path):
    params, qcfg, qstate, mode, batch = _calibrated()
    out1, _ = B.bert_apply(params, batch, CFG, qcfg, qstate, mode)

    ckpt = str(tmp_path / "ck")
    CK.save_checkpoint(ckpt, params=params, family="bert", cfg=CFG,
                       qstate=qstate)
    assert CK.is_checkpoint(ckpt)
    assert os.path.exists(os.path.join(ckpt, "manifest.json"))

    ck = CK.load_checkpoint(ckpt)
    assert ck["cfg"] == CFG
    out2, _ = B.bert_apply(ck["params"], batch, ck["cfg"], qcfg,
                           ck["qstate"], mode)
    np.testing.assert_array_equal(np.asarray(out1["logits"]),
                                  np.asarray(out2["logits"]))


def test_checkpoint_preserves_alpha_and_qp_types(tmp_path):
    from transformer_quantization_tpu.quant.quantizers import QuantParams

    params, qcfg, qstate, mode, batch = _calibrated()
    # attach a fake adaround alpha
    w = params["layers"][0]["attn"]["q"]["kernel"]
    qstate["L0.attn.q.w"] = dict(qstate["L0.attn.q.w"],
                                 alpha=jnp.zeros_like(w))
    ckpt = str(tmp_path / "ck2")
    CK.save_checkpoint(ckpt, params=params, family="bert", cfg=CFG,
                       qstate=qstate)
    ck = CK.load_checkpoint(ckpt)
    st = ck["qstate"]["L0.attn.q.w"]
    assert isinstance(st["qp"], QuantParams)
    assert st["alpha"].shape == w.shape
    assert ck["qstate"]["L0.attn.q.w"]["qp"].delta.ndim == \
        qstate["L0.attn.q.w"]["qp"].delta.ndim


def test_mid_train_resume_is_exact(tmp_path):
    """Interrupt-and-resume: train 4 steps straight vs train 2, save the
    full train state (model + learnable ranges + optimizer + RNG + step),
    reload into a FRESH trainer, finish — final params and quant state
    must match bit-for-bit (data order replays deterministically)."""
    from transformer_quantization_tpu.training import trainer as T
    from transformer_quantization_tpu.training.calibration import (
        prepare_quantized_model,
    )
    from transformer_quantization_tpu.utils.glue import TASKS

    cfg = B.BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                       num_attention_heads=2, intermediate_size=64,
                       max_position_embeddings=32, num_labels=2)
    params = B.init_bert_params(jax.random.PRNGKey(0), cfg)
    d = QuantDefaults(method=QMethod.symmetric_uniform,
                      act_method=QMethod.asymmetric_uniform, n_bits=8,
                      weight_range_method=RangeMethod.current_minmax,
                      act_range_method=RangeMethod.current_minmax)
    qcfg = B.declare_bert_sites(d, cfg)
    rng = np.random.RandomState(0)
    n = 32
    arrays = {
        "input_ids": rng.randint(0, 64, (n, 16)).astype(np.int32),
        "attention_mask": np.ones((n, 16), np.float32),
        "token_type_ids": np.zeros((n, 16), np.int32),
        "labels": rng.randint(0, 2, (n,)).astype(np.int32),
        "example_mask": np.ones((n,), np.int32),
    }
    apply_fn = functools.partial(B.bert_apply, cfg=cfg)
    cal = [{k: jnp.asarray(v[:4]) for k, v in arrays.items()
            if k not in ("labels", "example_mask")}]
    qstate, _ = prepare_quantized_model(
        apply_fn, params, qcfg, cal,
        weight_tensors=B.bert_weight_site_tensors(params))

    from transformer_quantization_tpu.training.qat import QATConfig
    task = TASKS["rte"]
    qat_cfg = QATConfig(learn_ranges=True, learning_rate=1e-4)

    def run(num_epochs, save_path=None, save_every=None, resume=False,
            max_steps=None):
        tcfg = T.TrainConfig(batch_size=8, num_epochs=num_epochs,
                             learning_rate=1e-4, seed=7,
                             save_every=save_every, log_every=1000,
                             max_steps=max_steps)
        p0 = jax.tree.map(jnp.copy, params)
        qs0 = jax.tree.map(jnp.copy, dict(qstate))
        return T.train(apply_fn, p0, task, arrays, tcfg, qcfg=qcfg,
                       qstate=qs0, qat_cfg=qat_cfg,
                       log_fn=lambda *a: None,
                       train_state_path=save_path, resume=resume)

    p_straight, qs_straight = run(2)  # 8 steps

    path = str(tmp_path / "ts")
    # "interrupted" first half: same 2-epoch LR horizon, stopped at step 4
    run(2, save_path=path, save_every=4, max_steps=4)
    assert T.has_train_state(path)
    p_res, qs_res = run(2, save_path=path, resume=True)  # replays to 4, on

    for a, b in zip(jax.tree.leaves(p_straight), jax.tree.leaves(p_res)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    la, lb = jax.tree.leaves(qs_straight), jax.tree.leaves(qs_res)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
