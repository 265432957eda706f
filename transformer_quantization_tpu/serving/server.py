"""HTTP serving front end over the continuous-batching engine.

Minimal stdlib server (zero extra dependencies):

    POST /classify   {"text": "...", "pair": "...?"}  -> {"logits": [...]}
    GET  /metrics                                      -> engine metrics
    GET  /healthz                                      -> ok

Start from a checkpoint directory:

    python -m transformer_quantization_tpu.serving.server \
        --checkpoint out/checkpoint_rte --port 8080 [--bf16]

Requests are tokenized (native C++ WordPiece when a vocab.txt is present),
enqueued, dynamically batched onto pre-compiled (batch, seq) buckets, and
answered with the classification logits.
"""

from __future__ import annotations

import argparse
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from transformer_quantization_tpu.serving.engine import (
    ServeConfig,
    ServingEngine,
)


def build_engine_from_checkpoint(ckpt_dir: str, *, bf16: bool = False,
                                 use_pallas: bool = False,
                                 tokenizer=None,
                                 serve_cfg: Optional[ServeConfig] = None
                                 ) -> ServingEngine:
    """Quantized int8 engine from a framework checkpoint directory."""
    import jax
    import jax.numpy as jnp

    from transformer_quantization_tpu.models.registry import get_family
    from transformer_quantization_tpu.utils import checkpoint as CK
    from transformer_quantization_tpu.utils.data import SyntheticTokenizer

    ck = CK.load_checkpoint(ckpt_dir)
    fam = get_family(ck["family"])
    cfg, params = ck["cfg"], ck["params"]
    qstate = ck.get("qstate")
    qcfg = None
    int_params = None
    if qstate is not None:
        from transformer_quantization_tpu.quant.qconfig import QuantDefaults
        from transformer_quantization_tpu.quant.quantizers import QMethod
        from transformer_quantization_tpu.quant.ranges import RangeMethod

        # engine default: the W8A8 recipe the checkpoint was calibrated with
        defaults = QuantDefaults(
            method=QMethod.symmetric_uniform,
            act_method=QMethod.asymmetric_uniform, n_bits=8,
            weight_range_method=RangeMethod.current_minmax,
            act_range_method=RangeMethod.current_minmax)
        qcfg = fam.declare_sites(defaults, cfg)
        int_params = fam.build_int_params(params, qcfg, qstate, False)
    cdt = jnp.bfloat16 if bf16 else None

    # prefer the full-handoff int8 engine (ops/engine.py) when the
    # checkpoint's quantization config rides it — ~1.7x the generic
    # int path at B=128 — falling back to the generic site machinery
    forward = None
    if qstate is not None and fam.build_engine is not None:
        from transformer_quantization_tpu.ops.engine import EngineIncompatible

        try:
            e_static, e_plan, e_int = fam.build_engine(params, cfg, qcfg,
                                                       qstate)
        except EngineIncompatible:
            e_static = None
        if e_static is not None:
            on_cpu = jax.default_backend() == "cpu"
            backend = "xla" if on_cpu else "pallas"

            @jax.jit
            def forward(batch):
                return fam.engine_apply(
                    params, batch, cfg, qcfg, qstate, e_static, e_plan,
                    e_int, backend=backend,
                    engine_dtype=cdt or jnp.float32)["logits"]

    if forward is None:
        @jax.jit
        def forward(batch):
            out, _ = fam.apply(params, batch, cfg, qcfg, qstate,
                               int_params=int_params, use_pallas=use_pallas,
                               compute_dtype=cdt,
                               attention_dtype=jnp.bfloat16)
            return out["logits"]

    if tokenizer is None:
        tokenizer = SyntheticTokenizer(cfg.vocab_size)
    return ServingEngine(forward, serve_cfg or ServeConfig(),
                         tokenizer=tokenizer)


def build_engine_from_export(export_dir: str, *, tokenizer=None,
                             serve_cfg: Optional[ServeConfig] = None
                             ) -> ServingEngine:
    """Serve from an AOT StableHLO artifact (serving/export.py) — no model
    code, no quant state, no jit-on-first-request: weights, packed int
    payloads, and scales are constants inside the deserialized program."""
    from transformer_quantization_tpu.serving.export import ExportedModel
    from transformer_quantization_tpu.utils.data import SyntheticTokenizer

    model = ExportedModel(export_dir)
    scfg = serve_cfg or ServeConfig(
        seq_buckets=tuple(model.seq_buckets))
    if tokenizer is None:
        tokenizer = SyntheticTokenizer(model.manifest.get("vocab_size",
                                                          30522))
    return ServingEngine(model, scfg, tokenizer=tokenizer)


def make_handler(engine: ServingEngine):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"status": "ok"})
            elif self.path == "/metrics":
                self._send(200, engine.metrics.snapshot())
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            from concurrent.futures import TimeoutError as FutTimeout

            from transformer_quantization_tpu.serving.engine import (
                QueueFullError,
            )

            if self.path != "/classify":
                self._send(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                text = req["text"]
                pair = req.get("pair")
                if not isinstance(text, str) or (
                        pair is not None and not isinstance(pair, str)):
                    raise TypeError("'text'/'pair' must be strings")
            except (json.JSONDecodeError, KeyError, TypeError,
                    UnicodeDecodeError, ValueError) as e:
                self._send(400, {"error": f"bad request: {e}"})
                return
            try:
                fut = engine.submit_text(text, pair)
            except QueueFullError as e:
                self._send(503, {"error": str(e)})
                return
            try:
                logits = fut.result(timeout=60)
                self._send(200, {"logits": [float(v) for v in logits]})
            except FutTimeout:
                self._send(504, {"error": "inference timed out"})
            except Exception as e:  # pragma: no cover
                self._send(500, {"error": str(e)})

        def log_message(self, *a):  # quiet
            pass

    return Handler


def serve(engine: ServingEngine, port: int = 8080,
          ready_event: Optional[threading.Event] = None):
    engine.start()
    httpd = ThreadingHTTPServer(("0.0.0.0", port), make_handler(engine))
    if ready_event is not None:
        ready_event.set()
    try:
        httpd.serve_forever()
    finally:
        engine.stop()


def main():
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--checkpoint")
    src.add_argument("--export-dir",
                     help="serve an AOT StableHLO artifact produced by "
                          "validate-quantized --export-dir")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--vocab", default=None,
                    help="vocab.txt for the native WordPiece tokenizer")
    args = ap.parse_args()
    tok = None
    if args.vocab:
        from transformer_quantization_tpu.utils.native import (
            WordPieceTokenizer,
        )

        tok = WordPieceTokenizer(args.vocab)
    if args.export_dir:
        eng = build_engine_from_export(args.export_dir, tokenizer=tok)
    else:
        eng = build_engine_from_checkpoint(args.checkpoint, bf16=args.bf16,
                                           tokenizer=tok)
    print(f"serving on :{args.port}")
    serve(eng, args.port)


if __name__ == "__main__":
    main()
