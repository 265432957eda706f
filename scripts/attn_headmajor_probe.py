"""Head-major / block-diagonal attention layout probe (round-5 item 3).

The shipped engine attention (dots='bf16', g=1) runs 2*n_heads small
(seq, seq, d=64) MXU dots per batch row — K=64 fills half the MXU's
128-deep systolic array. Grouping g=2 heads reaches full depth but the
in-kernel mask/concat work measured a net LOSS for bf16 operands
(NOTES round-4 item 1). The untried idea (round-4 candidate #1): build
the block-diagonal operands at EMISSION time (head-major layout with
zero padding) so the dots see full depth without per-dot masking.

This probe isolates the question that decides the idea's ceiling:
with operands ALREADY laid out (prep outside the timed region), is a
full-depth block-diagonal dot actually faster than the per-head K=64
dots on bf16? Three timed kernels per phase shape:

  A. per-head:        n_heads dots of (seq, seq) x K=64
  B. block-diagonal:  n_heads/2 dots of (2*seq, seq) x K=128 (pre-built
                      zero-padded operands — the emission-time layout)
  C. single-dot:      1 dot of (n_heads*seq, seq) x K=768 block-diagonal
                      (12x zero-pad FLOPs — known-equal from round 3,
                      re-measured as the anchor)

If B ~= A, the layout cannot beat the shipped g=1 and the ~70% MFU at
B=128 is the structural ceiling of Mosaic-scheduled small attention
dots — document and stop (VERDICT r4 item 3's negative-result branch).

    JAX_COMPILATION_CACHE_DIR=/root/repo/.jaxcache \
        timeout 1800 python -u scripts/attn_headmajor_probe.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

SEQ, HEADS, D = 128, 12, 64
H = HEADS * D
BB = 4          # batch rows per grid cell (the shipped cell size)
B = 128         # batch rows total
ITERS = 30


def _kernel_perhead(q_ref, k_ref, o_ref, scr):
    for j in range(BB):
        rows = slice(j * SEQ, (j + 1) * SEQ)
        for h in range(HEADS):
            cols = slice(h * D, (h + 1) * D)
            scr[j * HEADS * SEQ + h * SEQ:
                j * HEADS * SEQ + (h + 1) * SEQ, :] = (
                jax.lax.dot_general(
                    q_ref[rows, cols], k_ref[rows, cols],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32))
    o_ref[:] = scr[0:8, :]


def _kernel_blockdiag(q_ref, k_ref, o_ref, scr):
    # q_ref: (BB * 2*SEQ, HEADS/2 * 128) pre-built block-diagonal pairs:
    # group p holds heads 2p,2p+1 — head h of the pair in rows h*SEQ and
    # lanes h*64, zeros elsewhere. k_ref: (BB*SEQ, H) plain layout.
    g = 2
    gw = g * D
    for j in range(BB):
        for p in range(HEADS // g):
            qbd = q_ref[j * g * SEQ * (HEADS // g)
                        + p * g * SEQ:
                        j * g * SEQ * (HEADS // g) + (p + 1) * g * SEQ,
                        :gw]
            kp = k_ref[j * SEQ:(j + 1) * SEQ, p * gw:(p + 1) * gw]
            scr[j * HEADS * SEQ + p * g * SEQ:
                j * HEADS * SEQ + (p + 1) * g * SEQ, :] = (
                jax.lax.dot_general(
                    qbd, kp, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32))
    o_ref[:] = scr[0:8, :]


def _kernel_singledot(q_ref, k_ref, o_ref, scr):
    # q_ref: (BB * HEADS*SEQ, H) full block-diagonal; k_ref (BB*SEQ, H)
    for j in range(BB):
        qbd = q_ref[j * HEADS * SEQ:(j + 1) * HEADS * SEQ, :]
        kp = k_ref[j * SEQ:(j + 1) * SEQ, :]
        scr[j * HEADS * SEQ:(j + 1) * HEADS * SEQ, :] = (
            jax.lax.dot_general(
                qbd, kp, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))
    o_ref[:] = scr[0:8, :]


def run(name, kernel, q, k):
    cells = B // BB
    call = pl.pallas_call(
        kernel,
        grid=(cells,),
        in_specs=[
            pl.BlockSpec((q.shape[0] // cells, q.shape[1]),
                         lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k.shape[0] // cells, k.shape[1]),
                         lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, SEQ), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cells * 8, SEQ), jnp.float32),
        # scores live in scratch (as in the shipped kernels) so timing
        # sees the DOTS, not a 100 MB HBM result write
        scratch_shapes=[pltpu.VMEM((BB * HEADS * SEQ, SEQ),
                                   jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )

    @jax.jit
    def step(q, k):
        def body(i, acc):
            return acc + call(q, k)[0, 0]

        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    t0 = time.perf_counter()
    float(step(q, k))  # compile+run
    t1 = time.perf_counter()
    float(step(q, k))
    t = (time.perf_counter() - t1) / ITERS
    print(f"# {name}: {t * 1e3:8.3f} ms/call  "
          f"(compile {t1 - t0:.0f}s)", flush=True)
    return t


def main():
    rng = np.random.RandomState(0)
    levels = rng.randint(0, 256, (B * SEQ, H)).astype(np.float32)
    q = jnp.asarray(levels, jnp.bfloat16)
    k = jnp.asarray(rng.randint(0, 256, (B * SEQ, H)), jnp.bfloat16)

    # B: block-diagonal pairs, zero-padded — (B * 2*SEQ * HEADS/2, 128)
    qb = np.zeros((B, HEADS // 2, 2 * SEQ, 2 * D), np.float32)
    lv = levels.reshape(B, SEQ, HEADS, D)
    for p in range(HEADS // 2):
        qb[:, p, :SEQ, :D] = lv[:, :, 2 * p]
        qb[:, p, SEQ:, D:] = lv[:, :, 2 * p + 1]
    qb = jnp.asarray(qb.reshape(B * (HEADS // 2) * 2 * SEQ, 2 * D),
                     jnp.bfloat16)

    # C: full block-diagonal — (B * HEADS*SEQ, H)
    qc = np.zeros((B, HEADS, SEQ, H), np.float32)
    for h in range(HEADS):
        qc[:, h, :, h * D:(h + 1) * D] = lv[:, :, h]
    qc = jnp.asarray(qc.reshape(B * HEADS * SEQ, H), jnp.bfloat16)

    ta = run("A per-head K=64 (shipped form)", _kernel_perhead, q, k)
    tb = run("B block-diag g=2 K=128 (pre-built)", _kernel_blockdiag,
             qb, k)
    tc = run("C single-dot K=768 (12x pad)", _kernel_singledot, qc, k)
    print(f"# B/A = {tb / ta:.3f}  C/A = {tc / ta:.3f}", flush=True)
    print(f"# verdict: {'LAYOUT CAN WIN' if tb < 0.9 * ta else 'layout is not the bottleneck — per-head dots already at the Mosaic ceiling'}")


if __name__ == "__main__":
    main()
