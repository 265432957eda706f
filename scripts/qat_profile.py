"""Profile the learn-ranges QAT train step on TPU.

qat_bench measured learn-ranges at 112 ms/step vs 51 ms for
estimate-fix (B=32, S=128, v5e) — this attributes the 61 ms gap per
device op so the fix targets the right thing. Run with
JAX_COMPILATION_CACHE_DIR set; the step's compile is ~19 min cold.

    JAX_COMPILATION_CACHE_DIR=/root/repo/.jaxcache \
        timeout 3000 python -u scripts/qat_profile.py [--no-learn]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seq", type=int, default=128)
    ap.add_argument("--no-learn", dest="learn", action="store_false",
                    default=True)
    ap.add_argument("--outdir", default="/tmp/qat_trace")
    args = ap.parse_args()

    from transformer_quantization_tpu.models import bert as B
    from transformer_quantization_tpu.training import qat as QAT
    from transformer_quantization_tpu.training.trainer import TrainConfig, \
        make_optimizer
    import __graft_entry__ as G

    cfg = B.BertConfig()
    params, qcfg, qstate = G._calibrated_bert(cfg, batch_size=2,
                                              seq=args.seq)
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
                 dropout_rng=None):
        out, qs = B.bert_apply(params, b, cfg, qcfg, qstate, mode,
                               train=train, dropout_rng=dropout_rng)
        return out, qs

    tx = make_optimizer(TrainConfig(batch_size=args.batch, num_epochs=1),
                        1000)
    qat_cfg = QAT.QATConfig(learn_ranges=args.learn)
    step = QAT.make_qat_train_step(apply_fn, qcfg, qat_cfg, tx,
                                   donate=False)
    out = QAT.init_qat_state(qcfg, qat_cfg, params, qstate, tx)
    key = jax.random.PRNGKey(0)
    out = step(out[0], out[1], out[2], out[3], batch, key)
    out = step(out[0], out[1], out[2], out[3], batch, out[4])
    float(np.asarray(out[-1]))
    print("# warm; tracing", file=sys.stderr, flush=True)
    with jax.profiler.trace(args.outdir):
        for _ in range(5):
            out = step(out[0], out[1], out[2], out[3], batch, out[4])
        float(np.asarray(out[-1]))

    time.sleep(2)
    traces = sorted(glob.glob(
        os.path.join(args.outdir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not traces:
        print("NO TRACE FILES", file=sys.stderr)
        return
    with gzip.open(traces[-1], "rt") as fh:
        data = json.load(fh)
    pid_names = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    dur_by_name = defaultdict(float)
    cnt_by_name = defaultdict(int)
    total = 0.0
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pname = pid_names.get(ev.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        name = ev.get("name", "?")
        if name.startswith("jit_"):
            continue
        dur = ev.get("dur", 0) / 1e3
        dur_by_name[name] += dur
        cnt_by_name[name] += 1
        total += dur
    print(f"# total device-op time {total / 5:.2f} ms/step")
    import re
    grp = defaultdict(float)
    gcnt = defaultdict(int)
    for name, dur in dur_by_name.items():
        key = re.sub(r"[.\d]+$", "", name)
        grp[key] += dur
        gcnt[key] += cnt_by_name[name]
    for key, dur in sorted(grp.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{dur / 5:8.3f} ms/step  x{gcnt[key] // 5:<5d} {key}")


if __name__ == "__main__":
    main()
