"""Benchmark: quantized BERT-base inference throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "seq/s", "vs_baseline": N, ...}

The reference publishes no throughput numbers (SURVEY.md §6). Its headline
workload is W8A8 *evaluation*, computed as float fake-quant simulation —
so the baseline here is that exact simulation workload on the same chip
(what a faithful port of the reference would run for validate-quantized):
``value`` is the real-int8 engine's sequences/sec and ``vs_baseline`` its
speedup over the simulation. Dense fp32/bf16 forwards are reported for
context (the engine's remaining act-site cost shows up against those).

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
    ap.add_argument("--full", action="store_true",
                    help="also time dense fp32/bf16 and the f32-attention "
                         "int path (3 extra compiles, ~10 min on the "
                         "remote tunnel)")
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
    def sim_step(params, batch):
        # the reference's workload: full fake-quant simulation
        out, _ = B.bert_apply(params, batch, cfg, qcfg, qstate, q_mode)
        return out["logits"]

    @jax.jit
    def int8_step(params, batch):
        out, _ = B.bert_apply(params, batch, cfg, qcfg, qstate, q_mode,
                              int_params=int_params)
        return out["logits"]

    @jax.jit
    def int8_attn_bf16_step(params, batch):
        # engine option: bf16 attention einsums (scores/probs are 8-bit
        # quantized right after; bf16 matmul error < quantization step)
        out, _ = B.bert_apply(params, batch, cfg, qcfg, qstate, q_mode,
                              int_params=int_params,
                              attention_dtype=jnp.bfloat16)
        return out["logits"]

    # essential pair first (the driver's bench window may be short):
    # the reference workload baseline and the tuned engine
    t_sim = timed(sim_step, params, batch, iters=args.iters)
    t_int8_attn = timed(int8_attn_bf16_step, params, batch, iters=args.iters)
    t_fp32 = t_bf16 = t_int8 = None
    if args.full:
        t_fp32 = timed(fp32_step, params, batch, iters=args.iters)
        t_bf16 = timed(bf16_step, params_bf16, batch, iters=args.iters)
        t_int8 = timed(int8_step, params, batch, iters=args.iters)
    t_best = min(t for t in (t_int8, t_int8_attn) if t is not None)

    seqps = args.batch / t_best
    result = {
        "metric": "bert_base_w8a8_int8_inference_seq_per_sec_per_chip",
        "value": round(seqps, 2),
        "unit": "seq/s",
        "vs_baseline": round(t_sim / t_best, 3),
        "detail": {
            "batch": args.batch, "seq": args.seq,
            "baseline": "reference workload = W8A8 fake-quant simulation",
            "simulation_seq_per_sec": round(args.batch / t_sim, 2),
            "int8_attn_bf16_seq_per_sec": round(args.batch / t_int8_attn, 2),
            "fp32_dense_seq_per_sec": (round(args.batch / t_fp32, 2)
                                       if t_fp32 else None),
            "bf16_dense_seq_per_sec": (round(args.batch / t_bf16, 2)
                                       if t_bf16 else None),
            "int8_xla_seq_per_sec": (round(args.batch / t_int8, 2)
                                     if t_int8 else None),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
