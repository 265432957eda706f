"""Benchmark: quantized BERT-base inference throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "seq/s", "vs_baseline": N, ...}

The reference publishes no throughput numbers (SURVEY.md §6). Its headline
workload is W8A8 *evaluation*, computed as float fake-quant simulation —
so the baseline is that exact simulation workload on the same chip (what
a faithful port of the reference would run for validate-quantized):
``value`` is the real-int8 engine's sequences/sec and ``vs_baseline`` its
speedup over the simulation. The default output also reports the bf16
dense forward (the "don't quantize at all" alternative the engine must
beat) and the matmul-FLOP MFU against the chip's measured int8 peak, so
the artifact tells the whole story on its own.

Usage: python bench.py [--batch 128] [--seq 128] [--iters 20] [--small]
       [--fast]   skip fp32 dense, the generic XLA int8 path, and the
                  W4A8 packed-int4 engine (3 fewer compiles); by default
                  the artifact includes every row so it has no null fields
       [--engine-backend pallas|xla]
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

# chip int8 matmul rate measured in-program on this v5e (NOTES.md round-1
# microbench); used for the %-of-peak context field
MEASURED_INT8_PEAK_TOPS = 239.0


def _sync(out):
    # Force a device->host transfer: on the remote TPU tunnel,
    # block_until_ready can return before execution finishes; reading the
    # value cannot. Execution is single-stream, so the last output's value
    # implies all prior dispatches completed.
    return float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])


def timed(fn, *args, iters=20, warmup=3):
    """Per-dispatch wall timing: one host->device dispatch per step."""
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def timed_loop(fn, *args, iters=20):
    """Device-throughput timing: ``iters`` steps inside ONE jitted
    lax.fori_loop program.

    Each iteration rotates ``input_ids`` by one row and folds one logit
    into a carried accumulator, so XLA can neither hoist the body out of
    the loop nor dead-code it (the rotate costs a 64 KB copy —
    negligible). This measures what the metric claims — per-chip
    throughput: the axon tunnel used in this sandbox adds ~2 ms of
    synchronous RPC per dispatch that a locally-attached TPU does not
    pay (profiler device-program span 15.6 ms vs 17.4 ms wall at
    B=128/S=128). The per-dispatch number is still measured and
    published in the detail fields for cross-round comparability.

    The last positional arg must be the batch dict (all step fns here
    take it last).
    """
    *closure, batch = args

    @jax.jit
    def run(closure, batch):
        def body(i, carry):
            ids, acc = carry
            out = fn(*closure, dict(batch, input_ids=ids))
            return (jnp.roll(ids, 1, axis=0),
                    acc + out.ravel()[0].astype(jnp.float32))

        _, acc = jax.lax.fori_loop(
            0, iters, body, (batch["input_ids"], jnp.float32(0.0)))
        return acc

    _sync(run(closure, batch))  # compile + warm
    t0 = time.perf_counter()
    out = run(closure, batch)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def matmul_flops_per_seq(cfg, seq: int) -> float:
    """Analytic matmul FLOPs of one sequence's forward (MACs x 2)."""
    h, i, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    per_layer = (8 * seq * h * h          # q,k,v,attn_out projections
                 + 4 * seq * h * i        # ffn inter + dense
                 + 4 * seq * seq * h)     # attention scores + context
    head = 2 * h * h + 2 * h * cfg.num_labels
    return float(L * per_layer + head)


def bench_serving(cfg, params, qcfg, qstate, static, plan, int_params,
                  interp, *, from_export=False, requests=512,
                  concurrency=64, max_batch=64):
    """Continuous-batching serving throughput over the int8 engine
    (scripts/serve_bench.py distilled): a closed-loop synthetic request
    stream with the standard seq buckets. ``from_export=True`` serves
    from the AOT engine-bucket artifact instead of the in-process jit
    (measures the deployed-artifact path, serving/export.py)."""
    from transformer_quantization_tpu.models import bert as B
    from transformer_quantization_tpu.serving import (ServeConfig,
                                                      ServingEngine)
    from transformer_quantization_tpu.serving.engine import unpack_batch

    def model_fwd(batch):
        return B.bert_engine_apply(
            params, batch, cfg, qcfg, qstate, static, plan, int_params,
            backend="pallas", interpret=interp)["logits"]

    seq_buckets = (32, 64, 128)
    batch_buckets = (8, 32, max_batch)
    fused = True
    if from_export:
        import tempfile

        from transformer_quantization_tpu.serving import export as EX

        def engine_fwd(ids, mask, tt):
            return model_fwd({"input_ids": ids, "attention_mask": mask,
                              "token_type_ids": tt})

        def generic_fwd(ids, mask, tt):
            b = {"input_ids": ids, "attention_mask": mask,
                 "token_type_ids": tt}
            out, _ = B.bert_apply(params, b, cfg, qcfg, qstate,
                                  int_params=int_params,
                                  attention_dtype=jnp.bfloat16)
            return out["logits"]

        td = tempfile.mkdtemp(prefix="bench_serve_export_")
        EX.save_export(td, generic_fwd, seq_buckets=list(seq_buckets),
                       engine_fwd=engine_fwd,
                       engine_batch_buckets=list(batch_buckets),
                       meta={"family": "bert", "num_labels": cfg.num_labels,
                             "vocab_size": cfg.vocab_size})
        forward = EX.ExportedModel(td)
        fused = False
    else:
        forward = jax.jit(lambda packed: model_fwd(unpack_batch(packed)))

    # pipeline_depth=5 A/B-measured best for in-process continuous
    # batching (round 5, v5e: 88.6k tokens/s at depth 3 -> 92.2k at 5;
    # max_batch 128 LOSES — 57k — big batches starve the pipeline)
    scfg = ServeConfig(max_batch=max_batch, max_wait_ms=2.0,
                       seq_buckets=seq_buckets,
                       batch_buckets=batch_buckets, precompile=True,
                       fused_transfer=fused, pipeline_depth=5)
    eng = ServingEngine(forward, scfg)
    rng = np.random.RandomState(0)
    reqs = [rng.randint(4, cfg.vocab_size,
                        rng.randint(8, 128)).astype(np.int32)
            for _ in range(requests)]
    with eng:
        return eng.run_closed_loop(reqs, concurrency=concurrency)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seq", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--small", action="store_true",
                    help="tiny model for CPU debugging")
    ap.add_argument("--large", action="store_true",
                    help="BERT-large (24 layers, hidden 1024) instead of "
                         "BERT-base")
    ap.add_argument("--fast", action="store_true",
                    help="skip generic XLA int8 and the int4 engine "
                         "(3 fewer compiles); default is the full set so "
                         "the driver-captured artifact has no null fields")
    ap.add_argument("--full", action="store_true",
                    help="deprecated: the full set is now the default")
    ap.add_argument("--engine-backend", default="pallas",
                    choices=["pallas", "xla"])
    args = ap.parse_args()

    # Fail fast if the TPU tunnel is down: backend init otherwise blocks
    # ~20-30 min before raising UNAVAILABLE, which reads as a hung bench.
    # The probe must be OUT of process: a SIGALRM handler can't preempt
    # the main thread while it is blocked inside one long native PJRT
    # init call (CPython runs handlers between bytecodes only), so an
    # in-process alarm fires ~30 min late. A child process can be killed.
    import subprocess

    if "cpu" not in str(jax.config.jax_platforms or ""):
        # (a CPU-forced debug run skips the probe: the child process
        # would not inherit an in-process platform override)
        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=300, check=True,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            print("bench: device backend init timed out (TPU tunnel down?)",
                  file=sys.stderr, flush=True)
            raise SystemExit(3)
    jax.devices()

    from transformer_quantization_tpu.models import bert as B
    from transformer_quantization_tpu.quant.qconfig import QuantMode
    import __graft_entry__ as G

    if args.small:
        cfg = B.BertConfig(vocab_size=512, hidden_size=128,
                           num_hidden_layers=2, num_attention_heads=4,
                           intermediate_size=256, max_position_embeddings=128)
    elif args.large:
        cfg = B.BertConfig(hidden_size=1024, num_hidden_layers=24,
                           num_attention_heads=16, intermediate_size=4096)
    else:
        cfg = B.BertConfig()  # BERT-base

    t_setup = time.perf_counter()
    params, qcfg, qstate = G._calibrated_bert(cfg, batch_size=2, seq=args.seq)
    int_params = jax.jit(
        lambda p, qs: B.build_bert_int_params(p, qcfg, qs))(params, qstate)
    static, plan, _ = B.build_bert_engine(params, cfg, qcfg, qstate,
                                          int_params=int_params)
    print(f"# setup {time.perf_counter() - t_setup:.1f}s", file=sys.stderr,
          flush=True)

    rng = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(
            rng.randint(0, cfg.vocab_size, (args.batch, args.seq)), jnp.int32),
        "attention_mask": jnp.ones((args.batch, args.seq), jnp.float32),
        "token_type_ids": jnp.zeros((args.batch, args.seq), jnp.int32),
    }

    fp_mode = QuantMode(weight_quant=False, act_quant=False)
    q_mode = QuantMode()
    interp = jax.default_backend() == "cpu"
    backend = args.engine_backend

    @jax.jit
    def sim_step(params, batch):
        # the reference's workload: full fake-quant simulation
        out, _ = B.bert_apply(params, batch, cfg, qcfg, qstate, q_mode)
        return out["logits"]

    # NB: the packed int weights ride as jit ARGUMENTS, not closure
    # constants — closed-over arrays are serialized into the compile
    # payload, and BERT-large's ~340 MB of baked weights exceeds the
    # axon remote-compile request limit (HTTP 413).
    @jax.jit
    def engine_step(params, plan, int_params, batch):
        # full-handoff int8 engine: every encoder edge rides int8 payloads
        return B.bert_engine_apply(
            params, batch, cfg, qcfg, qstate, static, plan, int_params,
            backend=backend, engine_dtype=jnp.bfloat16,
            interpret=interp)["logits"]

    params_bf16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if isinstance(x, jax.Array) and x.dtype == jnp.float32 else x, params)

    @jax.jit
    def bf16_step(params, batch):
        out, _ = B.bert_apply(params, batch, cfg, None, None, fp_mode)
        return out["logits"]

    def measure(name, fn, *a, how=timed_loop):
        t0 = time.perf_counter()
        try:
            t = how(fn, *a, iters=args.iters)
        except Exception as e:  # keep the artifact even if one path breaks
            print(f"# {name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr, flush=True)
            return None
        print(f"# {name}: {t * 1e3:.2f} ms  {args.batch / t:.1f} seq/s "
              f"(compile+run {time.perf_counter() - t0:.0f}s)",
              file=sys.stderr, flush=True)
        return t

    # essential set first (the driver's bench window may be short):
    # the engine, its baseline (the reference's fake-quant workload), and
    # BOTH unquantized alternatives it must beat
    t_sim = measure("sim", sim_step, params, batch)
    t_eng = measure("engine", engine_step, params, plan, int_params, batch)
    # per-dispatch wall time of the engine (r01-r03 methodology): the
    # delta vs the loop measurement is the sandbox tunnel's RPC cost
    t_eng_disp = measure("engine_dispatch", engine_step, params, plan,
                         int_params, batch, how=timed)
    t_bf16 = measure("bf16_dense", bf16_step, params_bf16, batch)

    @jax.jit
    def fp32_step(params, batch):
        out, _ = B.bert_apply(params, batch, cfg, qcfg, qstate, fp_mode)
        return out["logits"]

    t_fp32 = measure("fp32_dense", fp32_step, params, batch)

    t_int8_xla = t_int4 = None
    if not args.fast:
        @jax.jit
        def int8_xla_step(params, int_params, batch):
            out, _ = B.bert_apply(params, batch, cfg, qcfg, qstate, q_mode,
                                  int_params=int_params,
                                  attention_dtype=jnp.bfloat16)
            return out["logits"]

        t_int8_xla = measure("int8_xla", int8_xla_step, params, int_params,
                             batch)

        # W4A8: 4-bit symmetric weights, packed two-per-byte (engine w4)
        d4 = G._w8a8_defaults()
        import dataclasses as _dc

        d4 = _dc.replace(d4, n_bits=4, n_bits_act=8)
        qcfg4 = B.declare_bert_sites(d4, cfg)
        from transformer_quantization_tpu.quant.manager import (
            init_weight_qstate,
        )
        from transformer_quantization_tpu.quant.qconfig import Phase

        qstate4 = jax.jit(lambda p: init_weight_qstate(
            qcfg4, B.bert_weight_site_tensors(p)))(params)

        @jax.jit
        def cal4(params, qstate, b):
            _, qs = B.bert_apply(params, b, cfg, qcfg4, qstate,
                                 QuantMode(act_phase=Phase.estimate))
            return qs

        cal_b = {k: v[:2] for k, v in batch.items()}
        qstate4 = cal4(params, qstate4, cal_b)
        int4_params = jax.jit(lambda p, qs: B.build_bert_int_params(
            p, qcfg4, qs, use_int4=True))(params, qstate4)
        static4, plan4, _ = B.build_bert_engine(params, cfg, qcfg4, qstate4,
                                                int_params=int4_params,
                                                use_int4=True)

        @jax.jit
        def int4_step(params, plan4, int4_params, batch):
            return B.bert_engine_apply(
                params, batch, cfg, qcfg4, qstate4, static4, plan4,
                int4_params, backend=backend, engine_dtype=jnp.bfloat16,
                interpret=interp)["logits"]

        t_int4 = measure("int4_engine", int4_step, params, plan4,
                         int4_params, batch)

    # Serving rows (VERDICT r4 weak #6: the serving claim must live in a
    # driver-captured artifact, not only in NOTES): in-process continuous
    # batching over the SAME engine build, and serving from the AOT
    # export artifact. Base model only (the serving engine is sized for
    # it); failures degrade to null fields, never kill the artifact.
    serving = None
    if not args.fast and not args.small and not args.large:
        serving = {}
        for label, use_export in (("in_process", False), ("from_export",
                                                          True)):
            t0 = time.perf_counter()
            try:
                snap = bench_serving(cfg, params, qcfg, qstate, static,
                                     plan, int_params, interp,
                                     from_export=use_export)
                serving[label + "_tokens_per_sec"] = round(
                    snap["tokens_per_sec"], 1)
                serving[label + "_p50_ms"] = round(
                    snap.get("latency_ms_p50", 0.0), 2)
                print(f"# serving_{label}: "
                      f"{snap['tokens_per_sec']:.0f} tokens/s "
                      f"(compile+run {time.perf_counter() - t0:.0f}s)",
                      file=sys.stderr, flush=True)
            except Exception as e:
                serving[label + "_tokens_per_sec"] = None
                print(f"# serving_{label}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", file=sys.stderr, flush=True)

    int_times = [t for t in (t_eng, t_int8_xla) if t is not None]
    fallback = not int_times
    if fallback:
        # Both int paths failed. Still emit an artifact so the driver
        # records SOMETHING, but NEVER report a float run under the int8
        # metric name: the value/vs_baseline/MFU fields would lie.
        int_times = [t for t in (t_sim, t_bf16, t_fp32) if t is not None]
        if not int_times:
            print(json.dumps({"metric": "bench_error", "value": None,
                              "unit": "seq/s", "vs_baseline": None,
                              "error": "every measurement failed"}))
            raise SystemExit(4)
    t_best = min(int_times)
    seqps = args.batch / t_best
    flops = matmul_flops_per_seq(cfg, args.seq)

    def sps(t):
        return round(args.batch / t, 2) if t else None

    size = "large" if args.large else ("small" if args.small else "base")
    metric = (f"bert_{size}_float_fallback_seq_per_sec_per_chip" if fallback
              else f"bert_{size}_w8a8_int8_inference_seq_per_sec_per_chip")
    result = {
        "metric": metric,
        "value": round(seqps, 2),
        "unit": "seq/s",
        "vs_baseline": (None if fallback else
                        round(t_sim / t_best, 3) if t_sim else None),
        "detail": {
            **({"fallback": True,
                "note": "int8 paths failed; value is a FLOAT run"}
               if fallback else {}),
            "batch": args.batch, "seq": args.seq,
            "baseline": "reference workload = W8A8 fake-quant simulation",
            "simulation_seq_per_sec": sps(t_sim),
            "engine_seq_per_sec": sps(t_eng),
            "engine_dispatch_seq_per_sec": sps(t_eng_disp),
            "dispatch_overhead_ms": (
                round((t_eng_disp - t_eng) * 1e3, 2)
                if t_eng and t_eng_disp else None),
            "timing": "fori_loop device throughput (dispatch_* fields = "
                      "r01-r03 per-dispatch wall methodology)",
            "engine_backend": backend,
            "bf16_dense_seq_per_sec": sps(t_bf16),
            "speedup_vs_bf16_dense": (round(t_bf16 / t_best, 3)
                                      if t_bf16 else None),
            "fp32_dense_seq_per_sec": sps(t_fp32),
            "int8_xla_seq_per_sec": sps(t_int8_xla),
            "int4_engine_seq_per_sec": sps(t_int4),
            "serving": serving,
            "matmul_gflops_per_seq": round(flops / 1e9, 2),
            "mfu_pct_of_int8_peak": (None if fallback else round(
                100.0 * seqps * flops / (MEASURED_INT8_PEAK_TOPS * 1e12), 1)),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
