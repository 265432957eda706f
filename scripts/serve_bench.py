"""Serving-engine benchmark: tokens/s + latency for quantized BERT-base.

Runs the continuous-batching engine (serving/engine.py) over a synthetic
request stream against the int8 engine on the current device. Prints one
JSON line. Usage:

    python scripts/serve_bench.py [--requests 512] [--concurrency 64]
        [--small] [--bf16]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=512)
    ap.add_argument("--concurrency", type=int, default=64)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 activation engine")
    ap.add_argument("--max-batch", type=int, default=32)
    ap.add_argument("--path", default="engine",
                    choices=["engine", "generic", "export"],
                    help="engine = full-handoff int8 engine (ops/engine.py)"
                         "; generic = round-1 XLA int path; export = serve "
                         "from an AOT engine-bucket artifact "
                         "(serving/export.py) — measures the deployed-"
                         "artifact overhead vs in-process")
    ap.add_argument("--no-fused-transfer", dest="fused",
                    action="store_false", default=True)
    ap.add_argument("--pipeline-depth", type=int, default=3)
    args = ap.parse_args()

    from transformer_quantization_tpu.models import bert as B
    from transformer_quantization_tpu.serving import ServeConfig, ServingEngine
    from transformer_quantization_tpu.serving.engine import unpack_batch
    import __graft_entry__ as G

    if args.small:
        cfg = B.BertConfig(vocab_size=512, hidden_size=128,
                           num_hidden_layers=2, num_attention_heads=4,
                           intermediate_size=256, max_position_embeddings=128)
    else:
        cfg = B.BertConfig()

    params, qcfg, qstate = G._calibrated_bert(cfg, batch_size=2, seq=128)
    int_params = jax.jit(
        lambda p, qs: B.build_bert_int_params(p, qcfg, qs))(params, qstate)
    cdt = jnp.bfloat16 if args.bf16 else None

    if args.path in ("engine", "export"):
        static, plan, _ = B.build_bert_engine(params, cfg, qcfg, qstate,
                                              int_params=int_params)

        interp = jax.default_backend() == "cpu"

        def model_fwd(batch):
            return B.bert_engine_apply(
                params, batch, cfg, qcfg, qstate, static, plan, int_params,
                backend="pallas", interpret=interp,
                engine_dtype=cdt or jnp.float32)["logits"]
    else:
        def model_fwd(batch):
            out, _ = B.bert_apply(params, batch, cfg, qcfg, qstate,
                                  int_params=int_params, compute_dtype=cdt,
                                  attention_dtype=jnp.bfloat16)
            return out["logits"]

    seq_buckets = (32, 64, 128)
    batch_buckets = ((8, 32, args.max_batch) if args.max_batch > 32
                     else (1, 2, 4, 8, 16, 32))
    if args.path == "export":
        # round-trip through the AOT artifact: the engine forward
        # serializes at every concrete (batch, seq) bucket and serves
        # from the deserialized programs (no fused transfer — the
        # ExportedModel takes the batch dict)
        import tempfile

        from transformer_quantization_tpu.serving import export as EX

        def engine_fwd(ids, mask, tt):
            return model_fwd({"input_ids": ids, "attention_mask": mask,
                              "token_type_ids": tt})

        def generic_fwd(ids, mask, tt):
            # the symbolic-batch fallback artifact cannot carry Pallas
            # kernels (symbolic dims can't drive grids/cost estimates) —
            # it exports the generic XLA int path
            b = {"input_ids": ids, "attention_mask": mask,
                 "token_type_ids": tt}
            out, _ = B.bert_apply(params, b, cfg, qcfg, qstate,
                                  int_params=int_params, compute_dtype=cdt,
                                  attention_dtype=jnp.bfloat16)
            return out["logits"]

        td = tempfile.mkdtemp(prefix="serve_export_")
        EX.save_export(td, generic_fwd, seq_buckets=list(seq_buckets),
                       engine_fwd=engine_fwd,
                       engine_batch_buckets=[b for b in batch_buckets
                                             if b <= args.max_batch],
                       meta={"family": "bert",
                             "num_labels": cfg.num_labels,
                             "vocab_size": cfg.vocab_size})
        forward = EX.ExportedModel(td)
        args.fused = False
    elif args.fused:
        forward = jax.jit(lambda packed: model_fwd(unpack_batch(packed)))
    else:
        forward = jax.jit(model_fwd)

    scfg = ServeConfig(max_batch=args.max_batch, max_wait_ms=2.0,
                       seq_buckets=seq_buckets,
                       batch_buckets=batch_buckets,
                       precompile=True,  # incl. export: first .call of a
                       # deserialized program compiles (~10s each on TPU)
                       fused_transfer=args.fused,
                       pipeline_depth=args.pipeline_depth)
    eng = ServingEngine(forward, scfg)

    rng = np.random.RandomState(0)
    reqs = [rng.randint(4, cfg.vocab_size,
                        rng.randint(8, 128)).astype(np.int32)
            for _ in range(args.requests)]
    with eng:
        snap = eng.run_closed_loop(reqs, concurrency=args.concurrency)

    print(json.dumps({
        "metric": "bert_base_w8a8_serving_tokens_per_sec_per_chip",
        "value": round(snap["tokens_per_sec"], 1),
        "unit": "tokens/s",
        "detail": {k: (round(v, 3) if isinstance(v, float) else v)
                   for k, v in snap.items()},
    }))


if __name__ == "__main__":
    main()
