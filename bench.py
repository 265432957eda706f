"""Benchmark: quantized BERT-base inference throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "seq/s", "vs_baseline": N, ...}

The reference publishes no throughput numbers (SURVEY.md §6) — its fake-quant
simulation can only ever be as fast as its FP32 GEMMs. The baseline here is
therefore the FP32 dense forward of the same model under XLA on the same
chip (what a faithful port of the reference would run); ``value`` is the
real-int8 engine's sequences/sec and ``vs_baseline`` its speedup over that
FP32 baseline. bf16 dense is also reported for context.

Usage: python bench.py [--batch 32] [--seq 128] [--iters 20] [--small]
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def _sync(out):
    # Force a device->host transfer: on the remote TPU tunnel,
    # block_until_ready can return before execution finishes; reading the
    # value cannot. Execution is single-stream, so the last output's value
    # implies all prior dispatches completed.
    return float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])


def timed(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seq", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--small", action="store_true",
                    help="tiny model for CPU debugging")
    args = ap.parse_args()

    from transformer_quantization_tpu.models import bert as B
    from transformer_quantization_tpu.quant.qconfig import QuantMode
    import __graft_entry__ as G

    if args.small:
        cfg = B.BertConfig(vocab_size=512, hidden_size=128,
                           num_hidden_layers=2, num_attention_heads=4,
                           intermediate_size=256, max_position_embeddings=128)
    else:
        cfg = B.BertConfig()  # BERT-base

    t_setup = time.perf_counter()
    params, qcfg, qstate = G._calibrated_bert(cfg, batch_size=2, seq=args.seq)
    int_params = jax.jit(
        lambda p, qs: B.build_bert_int_params(p, qcfg, qs))(params, qstate)
    print(f"# setup {time.perf_counter() - t_setup:.1f}s", file=sys.stderr)

    rng = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(
            rng.randint(0, cfg.vocab_size, (args.batch, args.seq)), jnp.int32),
        "attention_mask": jnp.ones((args.batch, args.seq), jnp.float32),
        "token_type_ids": jnp.zeros((args.batch, args.seq), jnp.int32),
    }

    fp_mode = QuantMode(weight_quant=False, act_quant=False)
    q_mode = QuantMode()

    @jax.jit
    def fp32_step(params, batch):
        out, _ = B.bert_apply(params, batch, cfg, qcfg, qstate, fp_mode)
        return out["logits"]

    params_bf16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if isinstance(x, jax.Array) and x.dtype == jnp.float32 else x, params)

    @jax.jit
    def bf16_step(params, batch):
        out, _ = B.bert_apply(params, batch, cfg, None, None, fp_mode)
        return out["logits"]

    @jax.jit
    def int8_step(params, batch):
        out, _ = B.bert_apply(params, batch, cfg, qcfg, qstate, q_mode,
                              int_params=int_params)
        return out["logits"]

    @jax.jit
    def pallas_step(params, batch):
        out, _ = B.bert_apply(params, batch, cfg, qcfg, qstate, q_mode,
                              int_params=int_params, use_pallas=True)
        return out["logits"]

    @jax.jit
    def pallas_attn_bf16_step(params, batch):
        # tuned engine: Pallas fused kernels (block_m=512, int8 hand-off
        # at ffn.inter->ffn.dense) + bf16 attention einsums
        out, _ = B.bert_apply(params, batch, cfg, qcfg, qstate, q_mode,
                              int_params=int_params, use_pallas=True,
                              attention_dtype=jnp.bfloat16)
        return out["logits"]

    t_fp32 = timed(fp32_step, params, batch, iters=args.iters)
    t_bf16 = timed(bf16_step, params_bf16, batch, iters=args.iters)
    t_int8 = timed(int8_step, params, batch, iters=args.iters)
    try:
        t_pallas = timed(pallas_step, params, batch, iters=args.iters)
        t_pallas_attn = timed(pallas_attn_bf16_step, params, batch,
                              iters=args.iters)
    except Exception as e:  # pallas unavailable on this backend
        print(f"# pallas path skipped: {e}", file=sys.stderr)
        t_pallas = t_pallas_attn = float("inf")
    t_best = min(t_int8, t_pallas, t_pallas_attn)

    seqps = args.batch / t_best
    result = {
        "metric": "bert_base_w8a8_int8_inference_seq_per_sec_per_chip",
        "value": round(seqps, 2),
        "unit": "seq/s",
        "vs_baseline": round(t_fp32 / t_best, 3),
        "detail": {
            "batch": args.batch, "seq": args.seq,
            "fp32_seq_per_sec": round(args.batch / t_fp32, 2),
            "bf16_seq_per_sec": round(args.batch / t_bf16, 2),
            "int8_xla_seq_per_sec": round(args.batch / t_int8, 2),
            "int8_pallas_seq_per_sec": (
                round(args.batch / t_pallas, 2)
                if t_pallas != float("inf") else None),
            "int8_pallas_attn_bf16_seq_per_sec": (
                round(args.batch / t_pallas_attn, 2)
                if t_pallas_attn != float("inf") else None),
            "int8_vs_bf16": round(t_bf16 / t_best, 3),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
