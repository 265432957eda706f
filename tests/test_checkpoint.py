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
