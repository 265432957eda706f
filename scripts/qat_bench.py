"""TPU bench: QAT train-step throughput (the reference's other hot loop).

The reference's train-quantized path is fake-quant forward + STE
backward + AdamW (SURVEY.md §3.2). This times our jitted QAT step
(training/qat.py make_qat_train_step) on BERT-base W8A8 — learn-ranges
(LSQ-style, ranges are parameters) and estimate-fix variants — against
the FP32 baseline train step, sequences/sec on one chip.

    timeout 2400 python -u scripts/qat_bench.py [--batch 32]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seq", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--only", default=None,
                    help="comma-separated variant names to run")
    args = ap.parse_args()

    from transformer_quantization_tpu.models import bert as B
    from transformer_quantization_tpu.quant.qconfig import QuantModelConfig
    from transformer_quantization_tpu.training import qat as QAT
    from transformer_quantization_tpu.training.trainer import TrainConfig, \
        make_optimizer
    import __graft_entry__ as G

    # dropout 0 matches the reference QAT recipe flags
    # (README.md:190 --attn-dropout 0.0 --hidden-dropout 0.0) and keeps
    # the int8-forward variants on the int8 path (train-time hidden
    # dropout disables it: models/bert.py int8_sites_for_mode)
    cfg = B.BertConfig(hidden_dropout_prob=0.0,
                       attention_probs_dropout_prob=0.0)
    t0 = time.perf_counter()
    params, qcfg, qstate = G._calibrated_bert(cfg, batch_size=2,
                                              seq=args.seq)
    print(f"# setup {time.perf_counter() - t0:.1f}s", file=sys.stderr,
          flush=True)

    rng = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(
            rng.randint(0, cfg.vocab_size, (args.batch, args.seq)),
            jnp.int32),
        "attention_mask": jnp.ones((args.batch, args.seq), jnp.float32),
        "token_type_ids": jnp.zeros((args.batch, args.seq), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 2, (args.batch,)), jnp.int32),
    }

    def apply_fn(params, b, qcfg=None, qstate=None, mode=None, train=False,
                 dropout_rng=None, compute_dtype=None, remat=False,
                 scan_layers=False, int8_qat_sites=None):
        out, qs = B.bert_apply(params, b, cfg, qcfg, qstate, mode,
                               train=train, dropout_rng=dropout_rng,
                               compute_dtype=compute_dtype, remat=remat,
                               scan_layers=scan_layers,
                               int8_qat_sites=int8_qat_sites)
        return out, qs

    tcfg = TrainConfig(batch_size=args.batch, num_epochs=1)
    tx = make_optimizer(tcfg, 1000)

    results = {}
    int8_sites = QAT.int8_forward_sites(qcfg, qstate)
    variants = [
        ("qat_learn_ranges", QAT.QATConfig(learn_ranges=True)),
        ("qat_learn_int8fwd",
         QAT.QATConfig(learn_ranges=True, int8_sites=int8_sites)),
        ("qat_fix_int8fwd",
         QAT.QATConfig(fix_weight_ranges=True, fix_act_ranges=True,
                       int8_sites=int8_sites)),
        ("qat_est_int8fwd", QAT.QATConfig(int8_sites=int8_sites)),
        ("qat_fix_ranges",
         QAT.QATConfig(fix_weight_ranges=True, fix_act_ranges=True)),
        ("qat_learn_ranges_scan",
         QAT.QATConfig(learn_ranges=True, scan_layers=True)),
        ("qat_estimate_fix", QAT.QATConfig(learn_ranges=False)),
        ("qat_estimate_fix_amp",
         QAT.QATConfig(learn_ranges=False, compute_dtype="bfloat16")),
        ("qat_learn_ranges_amp",
         QAT.QATConfig(learn_ranges=True, compute_dtype="bfloat16")),
        ("qat_amp_remat",
         QAT.QATConfig(learn_ranges=False, compute_dtype="bfloat16",
                       remat=True)),
        # scan alone OOMs HBM at B=32 (the stacked per-layer ys double-
        # buffer the backward state); remat inside the scanned body is
        # the config that actually ships for big models
        ("qat_learn_scan_remat",
         QAT.QATConfig(learn_ranges=True, scan_layers=True, remat=True)),
        # round 5: q/k/v ride the int8 path under scan too (input-site
        # params carried through the scan carry, models/bert.py)
        ("qat_learn_scan_remat_int8fwd",
         QAT.QATConfig(learn_ranges=True, scan_layers=True, remat=True,
                       int8_sites=int8_sites)),
        ("baseline_fp32", None),
        ("baseline_amp", "amp"),
    ]
    if args.only:
        keep = set(args.only.split(","))
        variants = [v for v in variants if v[0] in keep]
    for name, qat_cfg in variants:
        t0 = time.perf_counter()
        if qat_cfg is None or qat_cfg == "amp":
            qc, qs = QuantModelConfig(()), {}
            qat_cfg = QAT.QATConfig(
                compute_dtype="bfloat16" if qat_cfg == "amp" else None)
        else:
            qc, qs = qcfg, qstate
        try:
            step = QAT.make_qat_train_step(apply_fn, qc, qat_cfg, tx,
                                           donate=False)
            p, learnable, rest, opt = QAT.init_qat_state(qc, qat_cfg,
                                                         params, qs, tx)
            key = jax.random.PRNGKey(0)
            out = step(p, learnable, rest, opt, batch, key)
            # the first step drops the learnable sites' qp entries from
            # the threaded qstate -> structure change -> one more
            # compile; warm past it before timing
            out = step(out[0], out[1], out[2], out[3], batch, out[4])
            _sync(out[-1])
            t1 = time.perf_counter()
            for _ in range(args.iters):
                out = step(out[0], out[1], out[2], out[3], batch, out[4])
            _sync(out[-1])
        except Exception as e:  # OOM on one variant must not kill the rest
            msg = str(e).split("\n")[0][:160]
            print(f"# {name}: FAILED ({msg})", file=sys.stderr, flush=True)
            results[name] = {"error": msg}
            continue
        dt = (time.perf_counter() - t1) / args.iters
        print(f"# {name}: {dt * 1e3:.2f} ms/step  "
              f"{args.batch / dt:.1f} seq/s "
              f"(compile+run {time.perf_counter() - t0:.0f}s)",
              file=sys.stderr, flush=True)
        results[name] = {"ms_per_step": round(dt * 1e3, 2),
                         "seq_per_sec": round(args.batch / dt, 1),
                         "compile_s": round(t1 - t0, 1)}
    print(json.dumps({"metric": "bert_base_w8a8_qat_train_seq_per_sec",
                      "batch": args.batch, "seq": args.seq,
                      "device": str(jax.devices()[0]),
                      "results": results}))


if __name__ == "__main__":
    main()
