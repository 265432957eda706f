"""HTTP serving front end: end-to-end from checkpoint to /classify."""

import functools
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np

from transformer_quantization_tpu.models import bert as B
from transformer_quantization_tpu.quant.qconfig import QuantDefaults
from transformer_quantization_tpu.quant.quantizers import QMethod
from transformer_quantization_tpu.quant.ranges import RangeMethod
from transformer_quantization_tpu.serving import ServeConfig
from transformer_quantization_tpu.serving.server import (
    build_engine_from_checkpoint,
    serve,
)
from transformer_quantization_tpu.training.calibration import (
    prepare_quantized_model,
)
from transformer_quantization_tpu.utils import checkpoint as CK

CFG = B.BertConfig(vocab_size=256, hidden_size=32, num_hidden_layers=2,
                   num_attention_heads=4, intermediate_size=64,
                   max_position_embeddings=64, num_labels=2)


def _make_checkpoint(tmp_path) -> str:
    params = B.init_bert_params(jax.random.PRNGKey(0), CFG)
    d = QuantDefaults(method=QMethod.symmetric_uniform,
                      act_method=QMethod.asymmetric_uniform, n_bits=8,
                      weight_range_method=RangeMethod.current_minmax,
                      act_range_method=RangeMethod.current_minmax)
    qcfg = B.declare_bert_sites(d, CFG)
    rng = np.random.RandomState(0)
    batch = {"input_ids": jnp.asarray(rng.randint(0, 256, (2, 16)),
                                      jnp.int32),
             "attention_mask": jnp.ones((2, 16), jnp.float32)}
    apply_fn = functools.partial(B.bert_apply, cfg=CFG)
    qstate, _ = prepare_quantized_model(
        apply_fn, params, qcfg, [batch],
        weight_tensors=B.bert_weight_site_tensors(params))
    ckpt = str(tmp_path / "ck")
    CK.save_checkpoint(ckpt, params=params, family="bert", cfg=CFG,
                       qstate=qstate)
    return ckpt


def test_http_classify_and_metrics(tmp_path):
    ckpt = _make_checkpoint(tmp_path)
    eng = build_engine_from_checkpoint(
        ckpt, serve_cfg=ServeConfig(max_batch=4, max_wait_ms=2.0,
                                    seq_buckets=(16, 32),
                                    batch_buckets=(1, 2, 4)))
    port = 18231
    ready = threading.Event()
    t = threading.Thread(target=serve, args=(eng, port, ready), daemon=True)
    t.start()
    assert ready.wait(timeout=60)

    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/classify",
        data=json.dumps({"text": "hello world", "pair": "general"}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        out = json.loads(r.read())
    assert len(out["logits"]) == 2
    assert all(np.isfinite(out["logits"]))

    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/metrics", timeout=30) as r:
        m = json.loads(r.read())
    assert m["requests"] >= 1

    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
        assert json.loads(r.read())["status"] == "ok"
