"""Probe: phase-major scheduling for the attention megakernel rows.

The shipped _attn_kernel runs phases 1-2-3 to completion per batch row:
MXU dots (phase 1/3) and the big softmax VPU pass (phase 2) serialize
within a row. Phase-major order runs phase 1 for ALL rows, then phase 2
for all, then phase 3 — giving Mosaic's VLIW scheduler adjacent
independent MXU/VPU work to interleave (phase-1 dots of row j+1 can
overlap phase-2 VPU of row j if the scheduler exploits it). Costs
scratch for every row's scores (n_batch x 786 KB at BERT-base shapes)
plus an int8 probs scratch.

    JAX_PLATFORMS=cpu python -u scripts/attn_pipeline_probe.py check
    timeout 3000 python -u scripts/attn_pipeline_probe.py
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

from transformer_quantization_tpu.ops.pallas import engine_kernels as EK  # noqa: E402

B, T, H, NH = 128, 128, 768, 12
D = H // NH
ITERS = 30


def _pipe_kernel(qkv_q, qkv_k, qkv_v, mask_ref, smem_ref, out_ref,
                 scores_scr, probs_scr, *, n_batch, g, skip_max):
    """Phase-major variant of the (grouped) attention kernel."""
    (q_s, q_sh, k_s, k_sh, v_s, v_sh,
     sc_s, sc_sh, p_s, p_sh, c_s, c_sh) = (smem_ref[0, i] for i in range(12))
    rsqrt_d = np.float32(1.0 / np.sqrt(D))
    base = pl.program_id(0) * n_batch
    seq, n_heads, head_dim = T, NH, D
    gw = g * head_dim
    rows_per = n_heads * seq
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, gw), 1)
    lmask = [(lane >= h * head_dim) & (lane < (h + 1) * head_dim)
             for h in range(g)]

    # ---- phase 1 for all rows ----
    for j in range(n_batch):
        rows = slice(j * seq, (j + 1) * seq)
        qj, kj = qkv_q[rows, :], qkv_k[rows, :]
        for p in range(n_heads // g):
            cols = slice(p * gw, (p + 1) * gw)
            qp, kp = qj[:, cols], kj[:, cols]
            qbd = jnp.concatenate(
                [jnp.where(lmask[h], qp, 0) for h in range(g)], axis=0)
            acc = jax.lax.dot_general(
                qbd, kp, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            ksum_rows = jnp.concatenate(
                [jnp.broadcast_to(
                    jnp.sum(jnp.where(lmask[h], kp, 0)
                            .astype(jnp.float32), axis=1,
                            keepdims=True).T, (seq, seq))
                 for h in range(g)], axis=0)
            qsum_col = jnp.concatenate(
                [jnp.sum(jnp.where(lmask[h], qp, 0)
                         .astype(jnp.float32), axis=1, keepdims=True)
                 for h in range(g)], axis=0)
            scores_scr[j * rows_per + p * g * seq:
                       j * rows_per + (p + 1) * g * seq, :] = (
                acc + q_sh * ksum_rows + k_sh * qsum_col
                + head_dim * q_sh * k_sh)

    # ---- phase 2 for all rows ----
    log2e = np.float32(np.log2(np.e))
    qk_over_sc = q_s * k_s * (1.0 / sc_s)
    a = sc_s * rsqrt_d * log2e
    for j in range(n_batch):
        mask_j = mask_ref[pl.ds(base + j, 1), :]
        mask2 = mask_j * log2e + a * sc_sh
        rows = slice(j * rows_per, (j + 1) * rows_per)
        r = jnp.clip(jnp.round(scores_scr[rows, :] * qk_over_sc) - sc_sh,
                     -128.0, 127.0)
        s2 = a * r + mask2
        if skip_max:
            e = jnp.exp2(s2)
        else:
            m = jnp.max(s2, axis=1, keepdims=True)
            e = jnp.exp2(s2 - m)
        denom = jnp.sum(e, axis=1, keepdims=True)
        probs_scr[rows, :] = jnp.clip(
            jnp.round(e * ((1.0 / p_s) / denom)) - p_sh,
            -128.0, 127.0).astype(jnp.int8)

    # ---- phase 3 for all rows ----
    pv_over_c = p_s * v_s * (1.0 / c_s)
    for j in range(n_batch):
        rows = slice(j * seq, (j + 1) * seq)
        vj = qkv_v[rows, :]
        p8 = probs_scr[j * rows_per:(j + 1) * rows_per, :]
        vsum = jnp.sum(vj.astype(jnp.float32), axis=0, keepdims=True)
        psum = jnp.sum(p8.astype(jnp.float32), axis=1, keepdims=True)
        ctx_heads = []
        for p in range(n_heads // g):
            cols = slice(p * gw, (p + 1) * gw)
            vp = vj[:, cols]
            vbd = jnp.concatenate(
                [jnp.where(lmask[h], vp, 0) for h in range(g)], axis=0)
            ap = jnp.concatenate(
                [p8[(p * g + h) * seq:(p * g + h + 1) * seq, :]
                 for h in range(g)], axis=1)
            acc2 = jax.lax.dot_general(
                ap, vbd, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            psum_cols = sum(
                jnp.where(lmask[h],
                          psum[(p * g + h) * seq:
                               (p * g + h + 1) * seq, :], 0.0)
                for h in range(g))
            ctx_heads.append(acc2 + p_sh * vsum[:, cols]
                             + v_sh * psum_cols
                             + seq * p_sh * v_sh)
        ctx = jnp.concatenate(ctx_heads, axis=1)
        out_ref[rows, :] = jnp.clip(
            jnp.round(ctx * pv_over_c) - c_sh, -128.0, 127.0
        ).astype(jnp.int8)


def pipelined(g, bb, skip_max, interpret=False):
    kernel = functools.partial(_pipe_kernel, n_batch=bb, g=g,
                               skip_max=skip_max)
    spec = lambda third: pl.BlockSpec(  # noqa: E731
        (bb * T, H), lambda i, third=third: (i, third),
        memory_space=pltpu.VMEM)

    def one(qkv8, mask, scal):
        return pl.pallas_call(
            kernel,
            grid=(B // bb,),
            in_specs=[
                spec(0), spec(1), spec(2),
                pl.BlockSpec((B, T), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 12), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((bb * T, H), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * T, H), jnp.int8),
            scratch_shapes=[
                pltpu.VMEM((bb * NH * T, T), jnp.float32),
                pltpu.VMEM((bb * NH * T, T), jnp.int8),
            ],
            compiler_params=(None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024)),
            interpret=interpret,
        )(qkv8, qkv8, qkv8, mask, scal)

    return one


def timed_loop(one):
    @jax.jit
    def run(qkv8, mask, scal):
        def body(i, acc):
            s2 = scal + (i.astype(jnp.float32) * 1e-12)
            y = one(qkv8, mask, s2)
            return acc + y[0, 0].astype(jnp.int32)

        return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))

    return run


def timed(run, *args):
    int(run(*args))
    t0 = time.perf_counter()
    int(run(*args))
    return (time.perf_counter() - t0) / ITERS * 1e3


def make_inputs():
    rng = np.random.RandomState(0)
    qkv8 = jnp.asarray(rng.randint(-128, 128, (B * T, 3 * H)), jnp.int8)
    mask = jnp.zeros((B, T), jnp.float32)
    mask = mask.at[:, 120:].set(-10000.0)
    scal = jnp.asarray([[0.02, 3.0, 0.02, -2.0, 0.015, 1.0,
                         0.11, 4.0, 1 / 255.0, 128.0, 0.01, 2.0]],
                       jnp.float32)
    return qkv8, mask, scal


def check():
    qkv8, mask, scal = make_inputs()
    want = EK.int8_attention_ref(qkv8, mask, scal, n_heads=NH, seq=T,
                                 skip_max=True)
    for g, bb in ((2, 1), (2, 2), (2, 4)):
        got = pipelined(g, bb, True, interpret=True)(qkv8, mask, scal)
        ok = bool(jnp.all(got == want))
        print(f"g={g} bb={bb}: {'OK' if ok else 'MISMATCH'}", flush=True)


def main():
    qkv8, mask, scal = make_inputs()
    for bb in (2, 4):
        t = timed(timed_loop(functools.partial(
            EK.int8_attention, n_heads=NH, seq=T, batch_block=bb,
            skip_max=True)), qkv8, mask, scal)
        print(f"# shipped   bb={bb}: {t:7.3f} ms per layer-call", flush=True)
    for g in (2,):
        for bb in (2, 4, 8):
            try:
                t = timed(timed_loop(pipelined(g, bb, True)),
                          qkv8, mask, scal)
            except Exception as e:
                print(f"# pipelined g={g} bb={bb}: FAILED {str(e)[:140]}",
                      flush=True)
                continue
            print(f"# pipelined g={g} bb={bb}: {t:7.3f} ms per layer-call",
                  flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "check":
        check()
    else:
        main()
