"""Profile the engine forward on TPU and attribute device time per op.

Writes a jax.profiler trace, then parses the Chrome trace JSON to sum
device-stream op durations by fusion name.

    timeout 1200 python -u scripts/engine_profile.py [--backend xla]
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
    ap.add_argument("--backend", default="xla")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seq", type=int, default=128)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--outdir", default="/tmp/engine_trace")
    args = ap.parse_args()

    from transformer_quantization_tpu.models import bert as B
    import __graft_entry__ as G

    cfg = B.BertConfig()
    params, qcfg, qstate = G._calibrated_bert(cfg, batch_size=2, seq=args.seq)
    int_params = jax.jit(
        lambda p, qs: B.build_bert_int_params(p, qcfg, qs))(params, qstate)
    static, plan, _ = B.build_bert_engine(params, cfg, qcfg, qstate,
                                          int_params=int_params)
    rng = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(
            rng.randint(0, cfg.vocab_size, (args.batch, args.seq)), jnp.int32),
        "attention_mask": jnp.ones((args.batch, args.seq), jnp.float32),
        "token_type_ids": jnp.zeros((args.batch, args.seq), jnp.int32),
    }
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    @jax.jit
    def f(params, batch):
        return B.bert_engine_apply(
            params, batch, cfg, qcfg, qstate, static, plan, int_params,
            backend=args.backend, engine_dtype=dt)["logits"]

    # compiled HLO: maps fusion.NN names in the trace to their root ops
    hlo_roots = {}
    try:
        txt = f.lower(params, batch).compile().as_text()
        with open(os.path.join("/tmp", "engine_hlo.txt"), "w") as fh:
            fh.write(txt)
        import re
        for line in txt.splitlines():
            m = re.match(r"\s*%?([\w.\-]+) = (.*)", line)
            if m:
                hlo_roots[m.group(1)] = m.group(2)[:160]
    except Exception as e:  # pragma: no cover
        print(f"# HLO dump failed: {e}", file=sys.stderr)

    for _ in range(3):
        out = f(params, batch)
    float(np.asarray(out).ravel()[0])
    print("# warm; tracing", file=sys.stderr, flush=True)

    with jax.profiler.trace(args.outdir):
        for _ in range(5):
            out = f(params, batch)
        float(np.asarray(out).ravel()[0])

    time.sleep(2)
    traces = sorted(glob.glob(
        os.path.join(args.outdir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not traces:
        print("NO TRACE FILES", file=sys.stderr)
        return
    with gzip.open(traces[-1], "rt") as fh:
        data = json.load(fh)

    # device-stream complete events only; group by op name
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
        if "TPU" not in pname and "Device" not in pname and \
                "/device" not in pname.lower():
            continue
        name = ev.get("name", "?")
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        dur_by_name[name] += dur
        cnt_by_name[name] += 1
        total += dur
    print(f"# process names seen: {sorted(set(pid_names.values()))[:10]}",
          file=sys.stderr)
    items = sorted(dur_by_name.items(), key=lambda kv: -kv[1])
    print(f"# total device time {total:.2f} ms over 5 steps "
          f"({total / 5:.2f} ms/step)")
    import re

    def root_of(name):
        r = hlo_roots.get(name, "")
        return re.sub(r"\s+", " ", r)[:120]

    # grouped: same HLO-root signature (op kind + shape), else name prefix
    grp_dur = defaultdict(float)
    grp_cnt = defaultdict(int)
    grp_example = {}
    for name, dur in items:
        if name.startswith("jit_"):
            continue
        r = hlo_roots.get(name)
        if r:
            key = re.sub(r"%[\w.\-]+", "_", r)[:100]
        else:
            key = re.sub(r"[.\d]+$", "", name)
        grp_dur[key] += dur
        grp_cnt[key] += cnt_by_name[name]
        grp_example.setdefault(key, name)
    print("\n# --- grouped by op signature ---")
    for key, dur in sorted(grp_dur.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{dur / 5:8.3f} ms/step  x{grp_cnt[key] // 5:<4d} "
              f"[{grp_example[key]}]  {key}")
    print("\n# --- top single ops (with HLO root) ---")
    for name, dur in items[:25]:
        print(f"{dur / 5:8.3f} ms/step  x{cnt_by_name[name] // 5:<4d} "
              f"{name[:60]}  :: {root_of(name)}")


if __name__ == "__main__":
    main()
