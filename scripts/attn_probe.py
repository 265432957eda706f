"""Decompose the int8 attention kernel's time on TPU.

Variants ablate kernel phases to find what the 0.65 ms/layer actually
pays for (MXU dots, softmax VPU pass, scratch traffic, per-head unroll):

  full          the shipped kernel (ops/pallas/engine_kernels.py)
  dots_only     phases 1+3, phase 2 replaced by a cast (no softmax)
  softmax_only  phase 2 over the scratch, phases 1/3 replaced by copies
  bb sweep      batch_block 1/2/4/8

    timeout 1800 python -u scripts/attn_probe.py
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


def _kernel(qkv_q, qkv_k, qkv_v, mask_ref, smem_ref, out_ref, scores_scr,
            *, n_batch, mode, skip_max):
    q_s, q_sh = smem_ref[0, 0], smem_ref[0, 1]
    k_s, k_sh = smem_ref[0, 2], smem_ref[0, 3]
    v_s, v_sh = smem_ref[0, 4], smem_ref[0, 5]
    sc_s, sc_sh = smem_ref[0, 6], smem_ref[0, 7]
    p_s, p_sh = smem_ref[0, 8], smem_ref[0, 9]
    c_s, c_sh = smem_ref[0, 10], smem_ref[0, 11]
    rsqrt_d = np.float32(1.0 / np.sqrt(D))
    base = pl.program_id(0) * n_batch
    seq, n_heads, head_dim = T, NH, D

    for j in range(n_batch):
        rows = slice(j * seq, (j + 1) * seq)
        qj = qkv_q[rows, :]
        kj = qkv_k[rows, :]
        vj = qkv_v[rows, :]
        mask_j = mask_ref[pl.ds(base + j, 1), :]

        if mode in ("full", "dots_only"):
            for hh in range(n_heads):
                cols = slice(hh * head_dim, (hh + 1) * head_dim)
                q8, k8 = qj[:, cols], kj[:, cols]
                acc = jax.lax.dot_general(
                    q8, k8, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
                qsum = jnp.sum(q8.astype(jnp.float32), axis=1,
                               keepdims=True)
                ksum = jnp.sum(k8.astype(jnp.float32), axis=1,
                               keepdims=True)
                scores_scr[hh * seq:(hh + 1) * seq, :] = (
                    acc + q_sh * ksum.T + k_sh * qsum
                    + head_dim * q_sh * k_sh)
        else:  # softmax_only: scratch <- cheap fill from q payload
            scores_scr[:, :] = jnp.broadcast_to(
                qj[:, :seq].astype(jnp.float32), (n_heads * seq, seq))

        if mode in ("full", "softmax_only"):
            log2e = np.float32(np.log2(np.e))
            qk_over_sc = q_s * k_s * (1.0 / sc_s)
            a = sc_s * rsqrt_d * log2e
            mask2 = mask_j * log2e + a * sc_sh
            r = jnp.clip(jnp.round(scores_scr[:, :] * qk_over_sc) - sc_sh,
                         -128.0, 127.0)
            s2 = a * r + mask2
            if skip_max:
                e = jnp.exp2(s2)
            else:
                m = jnp.max(s2, axis=1, keepdims=True)
                e = jnp.exp2(s2 - m)
            denom = jnp.sum(e, axis=1, keepdims=True)
            p8 = jnp.clip(jnp.round(e * ((1.0 / p_s) / denom)) - p_sh,
                          -128.0, 127.0).astype(jnp.int8)
        else:  # dots_only: skip softmax, cast scratch
            p8 = jnp.clip(scores_scr[:, :], -128.0, 127.0).astype(jnp.int8)

        if mode in ("full", "dots_only"):
            pv_over_c = p_s * v_s * (1.0 / c_s)
            vsum = jnp.sum(vj.astype(jnp.float32), axis=0, keepdims=True)
            psum = jnp.sum(p8.astype(jnp.float32), axis=1, keepdims=True)
            ctx_heads = []
            for hh in range(n_heads):
                hrows = slice(hh * seq, (hh + 1) * seq)
                cols = slice(hh * head_dim, (hh + 1) * head_dim)
                acc2 = jax.lax.dot_general(
                    p8[hrows, :], vj[:, cols],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
                ctx_heads.append(acc2 + p_sh * vsum[:, cols]
                                 + v_sh * psum[hrows, :]
                                 + seq * p_sh * v_sh)
            ctx = jnp.concatenate(ctx_heads, axis=1)
            out_ref[rows, :] = jnp.clip(
                jnp.round(ctx * (p_s * v_s / c_s)) - c_sh, -128.0, 127.0
            ).astype(jnp.int8)
        else:
            out_ref[rows, :] = jnp.broadcast_to(
                p8[:seq, :1], (seq, H)).astype(jnp.int8)


def variant(mode, bb, skip_max):
    kernel = functools.partial(_kernel, n_batch=bb, mode=mode,
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
            scratch_shapes=[pltpu.VMEM((NH * T, T), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(qkv8, qkv8, qkv8, mask, scal)

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


def shipped(bb, sm):
    @jax.jit
    def run(qkv8, mask, scal):
        def body(i, acc):
            s2 = scal + (i.astype(jnp.float32) * 1e-12)
            y = EK.int8_attention(qkv8, mask, s2, n_heads=NH, seq=T,
                                  batch_block=bb, skip_max=sm)
            return acc + y[0, 0].astype(jnp.int32)

        return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))

    return run


def main():
    rng = np.random.RandomState(0)
    qkv8 = jnp.asarray(rng.randint(-128, 128, (B * T, 3 * H)), jnp.int8)
    mask = jnp.zeros((B, T), jnp.float32)
    scal = jnp.asarray([[0.02, 3.0, 0.02, -2.0, 0.015, 1.0,
                         0.11, 4.0, 1 / 255.0, 128.0, 0.01, 2.0]],
                       jnp.float32)

    for bb in (1, 4):
        t = timed(shipped(bb, True), qkv8, mask, scal)
        print(f"# shipped       bb={bb} skip=1: {t:7.3f} ms per layer-call",
              flush=True)

    for mode in ("full", "dots_only", "softmax_only"):
        for bb in (1, 2, 4, 8):
            for sm in ((True, False) if mode != "dots_only" else (True,)):
                try:
                    t = timed(variant(mode, bb, sm), qkv8, mask, scal)
                except Exception as e:
                    print(f"# {mode:13s} bb={bb} skip={sm}: FAILED "
                          f"{str(e)[:120]}", flush=True)
                    continue
                print(f"# {mode:13s} bb={bb} skip={int(sm)}: {t:7.3f} ms "
                      f"per layer-call (bench layer ~0.651)", flush=True)


if __name__ == "__main__":
    main()
