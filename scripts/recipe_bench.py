"""TPU throughput of the accuracy-preserving recipes on the engine.

Benches BERT-base engine inference for plain W8A8, mixed W8A{8,16}
({'x','h','y': 16} — 16-bit float value edges) and PEG
({'x','h','y': 'ngp6'} — per-column requant vectors), plus the generic
fake-quant simulation of each for context.

    timeout 2400 python -u scripts/recipe_bench.py [--batch 128]
"""

import argparse
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
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    from transformer_quantization_tpu.models import bert as B
    from transformer_quantization_tpu.quant.manager import init_weight_qstate
    from transformer_quantization_tpu.quant.qconfig import Phase, QuantMode
    from transformer_quantization_tpu.training import calibration as CAL
    import __graft_entry__ as G

    if args.small:
        cfg = B.BertConfig(vocab_size=512, hidden_size=126, # ng6-divisible
                           num_hidden_layers=2, num_attention_heads=2,
                           intermediate_size=252,
                           max_position_embeddings=128)
    else:
        cfg = B.BertConfig()
    params = jax.jit(lambda k: B.init_bert_params(k, cfg))(
        jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    cal = {
        "input_ids": jnp.asarray(
            rng.randint(0, cfg.vocab_size, (2, args.seq)), jnp.int32),
        "attention_mask": jnp.ones((2, args.seq), jnp.float32),
        "token_type_ids": jnp.zeros((2, args.seq), jnp.int32),
    }
    batch = {
        "input_ids": jnp.asarray(
            rng.randint(0, cfg.vocab_size, (args.batch, args.seq)),
            jnp.int32),
        "attention_mask": jnp.ones((args.batch, args.seq), jnp.float32),
        "token_type_ids": jnp.zeros((args.batch, args.seq), jnp.int32),
    }
    interp = jax.default_backend() == "cpu"

    def setup(quant_dict):
        qcfg = B.declare_bert_sites(G._w8a8_defaults(), cfg)
        if quant_dict:
            qcfg = B.apply_bert_quant_dict(qcfg, quant_dict,
                                           cfg.num_hidden_layers)
        qstate = jax.jit(lambda p: init_weight_qstate(
            qcfg, B.bert_weight_site_tensors(p)))(params)
        if quant_dict and any(isinstance(v, str) and v.startswith("ngp")
                              for v in quant_dict.values()):
            apply_fn = lambda p, b, qcfg, qstate, mode: B.bert_apply(  # noqa
                p, b, cfg, qcfg, qstate, mode)
            qstate = CAL.record_permutation_ranges(apply_fn, params, qcfg,
                                                   qstate, [cal])

        @jax.jit
        def calibrate(params, qstate, b):
            _, qs = B.bert_apply(params, b, cfg, qcfg, qstate,
                                 QuantMode(act_phase=Phase.estimate))
            return qs

        qstate = calibrate(params, qstate, cal)
        int_params = jax.jit(lambda p, qs: B.build_bert_int_params(
            p, qcfg, qs))(params, qstate)
        static, plan, _ = B.build_bert_engine(params, cfg, qcfg, qstate,
                                              int_params=int_params)
        return qcfg, qstate, static, plan, int_params

    results = {}
    for name, qd in [
        ("w8a8", None),
        ("mixed", {"x": 16, "h": 16, "y": 16}),
        ("peg", {"x": "ngp6", "h": "ngp6", "y": "ngp6"}),
    ]:
        t0 = time.perf_counter()
        qcfg, qstate, static, plan, int_params = setup(qd)
        print(f"# {name}: setup {time.perf_counter() - t0:.0f}s "
              f"(flex={static.any_flex})", file=sys.stderr, flush=True)

        @jax.jit
        def engine_step(params, plan, int_params, batch):
            return B.bert_engine_apply(
                params, batch, cfg, qcfg, qstate, static, plan, int_params,
                backend="pallas", engine_dtype=jnp.bfloat16,
                interpret=interp)["logits"]

        t = timed(engine_step, params, plan, int_params, batch,
                  iters=args.iters)
        results[name] = args.batch / t
        print(f"# {name}: engine {t * 1e3:.2f} ms  "
              f"{args.batch / t:.1f} seq/s", file=sys.stderr, flush=True)

        @jax.jit
        def sim_step(params, batch):
            out, _ = B.bert_apply(params, batch, cfg, qcfg, qstate,
                                  QuantMode())
            return out["logits"]

        ts = timed(sim_step, params, batch, iters=max(args.iters // 2, 2))
        print(f"# {name}: simulation {ts * 1e3:.2f} ms  "
              f"{args.batch / ts:.1f} seq/s", file=sys.stderr, flush=True)
        results[name + "_sim"] = args.batch / ts

    import json

    base = results["w8a8"]
    print(json.dumps({k: round(v, 1) for k, v in results.items()}
                     | {"mixed_vs_w8a8": round(results["mixed"] / base, 3),
                        "peg_vs_w8a8": round(results["peg"] / base, 3)}))


if __name__ == "__main__":
    main()
