"""Engine vs fake-quant simulation across ALL six model families on TPU.

Each family runs its full-handoff int8 engine and its fake-quant
simulation at realistic base-size configs, B=64 S=128. Prints one JSON
line with per-family seq/s and speedups — evidence that the engine is a
framework capability, not a BERT-only path.

    timeout 3600 python -u scripts/family_bench.py [--small]
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


def timed(fn, *args, iters=10, warmup=2):
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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--small", action="store_true",
                    help="tiny configs for CPU debugging")
    ap.add_argument("--families", default=None,
                    help="comma-separated subset")
    args = ap.parse_args()

    from transformer_quantization_tpu.models.registry import build_model
    from transformer_quantization_tpu.quant.manager import init_weight_qstate
    from transformer_quantization_tpu.quant.qconfig import Phase, QuantMode
    import __graft_entry__ as G

    # one base-size model per family (registry names)
    MODEL = {
        "bert": "bert_base_uncased",
        "roberta": "roberta_base",
        "distilbert": "distilbert_base_uncased",
        "albert": "albert_base_v2",
        "squeezebert": "squeezebert_uncased",
        "mobilebert": "mobilebert_uncased",
    }
    names = (args.families.split(",") if args.families
             else list(MODEL))
    interp = jax.default_backend() == "cpu"
    results = {}
    for famname in names:
        t0 = time.perf_counter()
        fam, cfg, params = build_model(MODEL[famname], seed=0,
                                       tiny=args.small, num_labels=2)
        d = G._w8a8_defaults()
        qcfg = fam.declare_sites(d, cfg)
        qstate = jax.jit(lambda p: init_weight_qstate(
            qcfg, fam.weight_site_tensors(p)))(params)
        rng = np.random.RandomState(0)
        cal = {
            "input_ids": jnp.asarray(
                rng.randint(4, cfg.vocab_size, (2, args.seq)), jnp.int32),
            "attention_mask": jnp.ones((2, args.seq), jnp.float32),
            "token_type_ids": jnp.zeros((2, args.seq), jnp.int32),
        }

        @jax.jit
        def calibrate(params, qstate, b):
            _, qs = fam.apply(params, b, cfg, qcfg, qstate,
                              QuantMode(act_phase=Phase.estimate))
            return qs

        qstate = calibrate(params, qstate, cal)
        try:
            static, plan, e_int = fam.build_engine(params, cfg, qcfg,
                                                   qstate)
        except Exception as e:
            print(f"# {famname}: engine unavailable: {e}",
                  file=sys.stderr, flush=True)
            results[famname] = {"error": str(e)[:120]}
            continue
        batch = {
            "input_ids": jnp.asarray(
                rng.randint(4, cfg.vocab_size, (args.batch, args.seq)),
                jnp.int32),
            "attention_mask": jnp.ones((args.batch, args.seq),
                                       jnp.float32),
            "token_type_ids": jnp.zeros((args.batch, args.seq),
                                        jnp.int32),
        }

        @jax.jit
        def engine_step(params, plan, e_int, batch):
            return fam.engine_apply(
                params, batch, cfg, qcfg, qstate, static, plan, e_int,
                backend="xla" if interp else "pallas",
                engine_dtype=jnp.bfloat16)["logits"]

        @jax.jit
        def sim_step(params, batch):
            out, _ = fam.apply(params, batch, cfg, qcfg, qstate,
                               QuantMode())
            return out["logits"]

        t_eng = timed(engine_step, params, plan, e_int, batch,
                      iters=args.iters)
        t_sim = timed(sim_step, params, batch,
                      iters=max(args.iters // 2, 2))
        results[famname] = {
            "engine_seq_per_sec": round(args.batch / t_eng, 1),
            "sim_seq_per_sec": round(args.batch / t_sim, 1),
            "speedup": round(t_sim / t_eng, 3),
        }
        print(f"# {famname}: engine {args.batch / t_eng:.1f} seq/s, "
              f"sim {args.batch / t_sim:.1f}, "
              f"{t_sim / t_eng:.2f}x (setup+run "
              f"{time.perf_counter() - t0:.0f}s)",
              file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": "family_engine_speedup_vs_simulation",
        "batch": args.batch, "seq": args.seq,
        "device": str(jax.devices()[0]),
        "results": results,
    }))


if __name__ == "__main__":
    main()
