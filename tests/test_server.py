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


def _start_server(tmp_path, port, **serve_kw):
    ckpt = _make_checkpoint(tmp_path)
    kw = dict(max_batch=4, max_wait_ms=2.0, seq_buckets=(16, 32),
              batch_buckets=(1, 2, 4))
    kw.update(serve_kw)
    eng = build_engine_from_checkpoint(ckpt, serve_cfg=ServeConfig(**kw))
    ready = threading.Event()
    t = threading.Thread(target=serve, args=(eng, port, ready), daemon=True)
    t.start()
    assert ready.wait(timeout=60)
    return eng


def _post(port, payload: bytes, timeout=120):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/classify", data=payload,
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_error_handling(tmp_path):
    """Malformed JSON -> 400; missing/mistyped fields -> 400; unknown
    path -> 404 — never a 500 for client mistakes."""
    import urllib.error  # noqa: F401

    port = 18232
    _start_server(tmp_path, port)
    code, out = _post(port, b"{not json")
    assert code == 400 and "bad request" in out["error"]
    code, out = _post(port, json.dumps({"pair": "no text"}).encode())
    assert code == 400
    code, out = _post(port, json.dumps({"text": 42}).encode())
    assert code == 400
    code, out = _post(port, json.dumps({"text": "ok"}).encode())
    assert code == 200 and len(out["logits"]) == 2
    req = urllib.request.Request(f"http://127.0.0.1:{port}/nope",
                                 data=b"{}")
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_http_overlong_input_truncates(tmp_path):
    """Inputs longer than the largest seq bucket truncate at ingress and
    still classify (no recompile, no error)."""
    import urllib.error  # noqa: F401

    port = 18233
    eng = _start_server(tmp_path, port)
    long_text = "word " * 500  # way past the 32-token top bucket
    code, out = _post(port, json.dumps({"text": long_text}).encode())
    assert code == 200
    assert all(np.isfinite(out["logits"]))
    snap = eng.metrics.snapshot()
    assert snap["tokens"] <= snap["requests"] * 32


def test_http_concurrent_clients(tmp_path):
    """8 threads x 6 requests, all served, all finite, batched > 1 on
    average (dynamic batching actually coalesces under concurrency)."""
    import urllib.error  # noqa: F401

    port = 18234
    eng = _start_server(tmp_path, port, max_wait_ms=20.0)
    results = []
    errs = []

    def client(i):
        try:
            for j in range(6):
                code, out = _post(port, json.dumps(
                    {"text": f"client {i} request {j}"}).encode())
                results.append((code, out))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errs
    assert len(results) == 48
    assert all(c == 200 for c, _ in results)
    assert all(np.isfinite(o["logits"]).all() for _, o in results)
    assert eng.metrics.snapshot()["requests"] >= 48


def test_queue_overflow_sheds_load(tmp_path):
    """With max_queue set and the scheduler not draining, submissions
    beyond the bound raise QueueFullError (the HTTP layer maps it to
    503)."""
    import pytest

    from transformer_quantization_tpu.serving.engine import (
        QueueFullError,
        ServingEngine,
    )

    eng = ServingEngine(lambda b: b["input_ids"],
                        ServeConfig(max_queue=2, seq_buckets=(16,)),
                        tokenizer=None)
    eng.submit_ids([1, 2, 3])
    eng.submit_ids([4, 5])
    with pytest.raises(QueueFullError):
        eng.submit_ids([6])
