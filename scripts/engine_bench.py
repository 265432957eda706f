"""TPU A/B bench for the full-handoff engine vs round-1 paths.

Run ONE at a time on the TPU (the tunnel serializes processes):
    timeout 1800 python scripts/engine_bench.py [--batch 128] [--variants ...]
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
    ap.add_argument("--variants", type=str,
                    default="sim,r1best,exla,epallas,epallas_bf16")
    args = ap.parse_args()
    variants = args.variants.split(",")

    from transformer_quantization_tpu.models import bert as B
    from transformer_quantization_tpu.quant.qconfig import QuantMode
    import __graft_entry__ as G

    cfg = B.BertConfig()
    t0 = time.perf_counter()
    params, qcfg, qstate = G._calibrated_bert(cfg, batch_size=2, seq=args.seq)
    int_params = jax.jit(
        lambda p, qs: B.build_bert_int_params(p, qcfg, qs))(params, qstate)
    static, plan, _ = B.build_bert_engine(params, cfg, qcfg, qstate,
                                          int_params=int_params)
    print(f"# setup {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    rng = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(
            rng.randint(0, cfg.vocab_size, (args.batch, args.seq)), jnp.int32),
        "attention_mask": jnp.ones((args.batch, args.seq), jnp.float32),
        "token_type_ids": jnp.zeros((args.batch, args.seq), jnp.int32),
    }
    q_mode = QuantMode()

    def make(variant):
        if variant == "sim":
            @jax.jit
            def f(params, batch):
                out, _ = B.bert_apply(params, batch, cfg, qcfg, qstate,
                                      q_mode)
                return out["logits"]
        elif variant == "r1best":
            @jax.jit
            def f(params, batch):
                out, _ = B.bert_apply(params, batch, cfg, qcfg, qstate,
                                      q_mode, int_params=int_params,
                                      attention_dtype=jnp.bfloat16)
                return out["logits"]
        elif variant.startswith(("exla", "epallas", "emix")):
            # emix_<mm>-<attn>-<ln>[_bf16], e.g. emix_xla-pallas-pallas
            if variant.startswith("emix"):
                parts = variant.split("_")[1]
                backend = "mix:" + parts.replace("-", ",")
            else:
                backend = "xla" if variant.startswith("exla") else "pallas"
            dt = jnp.bfloat16 if variant.endswith("bf16") else jnp.float32

            @jax.jit
            def f(params, batch):
                return B.bert_engine_apply(
                    params, batch, cfg, qcfg, qstate, static, plan,
                    int_params, backend=backend, engine_dtype=dt)["logits"]
        else:
            raise ValueError(variant)
        return f

    results = {}
    for v in variants:
        tt0 = time.perf_counter()
        try:
            f = make(v)
            t = timed(f, params, batch, iters=args.iters)
        except Exception as e:
            print(f"# {v}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  file=sys.stderr, flush=True)
            results[v] = {"error": str(e)[:300]}
            continue
        print(f"# {v}: {t * 1e3:.2f} ms  {args.batch / t:.1f} seq/s "
              f"(compile+run {time.perf_counter() - tt0:.0f}s)",
              file=sys.stderr, flush=True)
        results[v] = {"ms": round(t * 1e3, 3),
                      "seq_per_sec": round(args.batch / t, 1)}
    print(json.dumps({"batch": args.batch, "seq": args.seq,
                      "device": str(jax.devices()[0]), "results": results}))


if __name__ == "__main__":
    main()
