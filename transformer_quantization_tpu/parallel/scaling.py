"""Inference scaling harness: DP(xTP) throughput over a device mesh.

The reference has no distributed code (SURVEY.md §2.6); the north star
asks for >=80% tokens/s scaling efficiency across chips/hosts. This
module measures it the TPU-native way: one jitted forward, inputs
committed to a ``dp``-sharded layout, parameters replicated (or
TP-sharded via ``parallel/mesh.py`` pspecs) — GSPMD partitions the
program, so the *same* step function serves every mesh size.

Two modes:

- ``fixed_work=True`` (strong scaling / partition-overhead mode): the
  same global batch runs at every mesh size. On real hardware this
  measures strong scaling; on the virtual CPU mesh (where all "devices"
  share one host's cores and total FLOPs are what they are) it isolates
  the *partitioning overhead* — efficiency = t(1 device)/t(n devices),
  which should stay >=0.8 because a DP forward has no collectives.
- ``fixed_work=False`` (weak scaling): per-device batch fixed, global
  batch grows with n; efficiency = per-device throughput at n vs at 1.
  The meaningful mode on real multi-chip hardware.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Sequence

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from transformer_quantization_tpu.parallel.mesh import make_mesh


def _time_step(step, args, iters: int, warmup: int = 2,
               repeats: int = 3) -> float:
    """Best-of-``repeats`` mean step time — the minimum is robust to
    transient load on a shared host (virtual-mesh CI runs)."""
    for _ in range(warmup):
        out = step(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def shard_for_dp(batch: Dict[str, np.ndarray], mesh) -> Dict:
    """Commit a host batch to the mesh, rows sharded over ``dp``."""
    out = {}
    for k, v in batch.items():
        spec = P(("dp",), *([None] * (np.ndim(v) - 1)))
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def dp_scaling_table(forward: Callable, params, batch: Dict[str, np.ndarray],
                     *, ns: Sequence[int] = (1, 2, 4, 8), tp: int = 1,
                     iters: int = 10, fixed_work: bool = True,
                     param_pspecs=None, devices=None) -> Dict:
    """Measure ``forward(params, batch)`` across mesh sizes.

    ``batch`` rows must divide by max(ns)·tp. Returns
    ``{n: {seconds, global_batch, seq_per_sec, efficiency}}`` where
    efficiency is relative to the n=1 row (see module docstring for the
    two modes).
    """
    devices = devices if devices is not None else jax.devices()
    b_total = len(next(iter(batch.values())))
    step = jax.jit(forward)
    rows: Dict[int, Dict] = {}
    for n in ns:
        if n * tp > len(devices):
            break
        mesh = make_mesh(dp=n, tp=tp, devices=devices[: n * tp])
        if fixed_work:
            local = batch
        else:
            per_dev = b_total // max(ns)
            local = {k: v[: per_dev * n] for k, v in batch.items()}
        gb = len(next(iter(local.values())))
        sharded = shard_for_dp(local, mesh)
        if param_pspecs is not None:
            p = jax.tree.map(
                lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
                params, param_pspecs)
        else:
            p = jax.device_put(params, NamedSharding(mesh, P()))
        t = _time_step(step, (p, sharded), iters)
        rows[n] = {"seconds": t, "global_batch": gb,
                   "seq_per_sec": gb / t}
    base = rows[min(rows)]
    n0 = min(rows)
    for n, r in rows.items():
        scale = n / n0
        # speedup: time ratio vs the smallest mesh (raw observation)
        r["speedup"] = base["seconds"] / r["seconds"]
        if fixed_work:
            # STRONG-scaling efficiency: ideal = time shrinks 1/n, so
            # eff = t(n0) / (scale * t(n)). The n0 row is 1.0 BY
            # DEFINITION — only larger rows carry information.
            r["efficiency"] = base["seconds"] / (scale * r["seconds"])
        else:
            # WEAK-scaling efficiency: per-device work fixed, ideal =
            # flat time, so eff = t(n0) / t(n).
            r["efficiency"] = base["seconds"] / r["seconds"]
        r["mode"] = "strong" if fixed_work else "weak"
    return rows


def format_scaling_table(rows: Dict[int, Dict], mode: str = None) -> str:
    """Table with BOTH the raw speedup and the per-mode efficiency
    (strong: t1/(n*tn); weak: t1/tn). The smallest-mesh row's efficiency
    is 1.0 by definition — read the n>=2 rows. On a virtual CPU mesh
    every 'device' shares one host's cores, so strong-mode efficiency
    cannot reach 1 and super-linear speedups are cache artifacts; the
    meaningful virtual-mesh signal is the strong-mode SPEEDUP staying
    near 1 (partitioning adds no overhead)."""
    first = rows[min(rows)]
    mode = mode or first.get("mode", "strong")
    lines = [f"# DP inference scaling ({mode} scaling; efficiency = "
             + ("t1/(n*tn), ideal 1.0 when time shrinks 1/n"
                if mode == "strong" else "t1/tn, ideal 1.0 = flat time")
             + ")",
             f"{'devices':>8} {'batch':>6} {'ms/step':>9} "
             f"{'seq/s':>10} {'speedup':>8} {'efficiency':>11}"]
    for n in sorted(rows):
        r = rows[n]
        tag = " (def)" if n == min(rows) else ""
        lines.append(f"{n:>8} {r['global_batch']:>6} "
                     f"{r['seconds'] * 1e3:>9.2f} {r['seq_per_sec']:>10.1f} "
                     f"{r['speedup']:>8.3f} {r['efficiency']:>11.3f}{tag}")
    return "\n".join(lines)
