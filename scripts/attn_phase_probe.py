"""Locate the remaining attention-middle time (round 4, bf16-dots era).

The shipped attention middle (shifted-bf16 dots, g=1, bb=4) costs
~1.25 ms per standalone layer-call at B=128/T=128 while its MXU work is
~30 us — the rest is phase-2 VPU chain, the f32 scores scratch
round-trip, and Mosaic scheduling. Variants:

  full        the shipped three-phase form (baseline; bit-checked)
  fused       per-head phases, NO scores scratch: dot -> softmax chain
              on the (T, T) tile in-register -> dot. Full semantics
              (bit-checked vs shipped) — shippable if faster.
  noq         full form, phase 2 WITHOUT the scores/probs fake-quant
              rounds/clips (plain softmax; WRONG numerics, ablation
              only) — isolates the quantization chain's VPU cost.
  dotsonly    phases 1+3 only, probs := cast of raw scores rows
              (WRONG numerics) — upper-bounds everything-but-phase-2.

    JAX_COMPILATION_CACHE_DIR=/root/repo/.jaxcache \
        timeout 2400 python -u scripts/attn_phase_probe.py
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


def _chain(s_raw, mask_j, sv, *, mode):
    """Phase-2 on one (rows, T) f32 tile -> shifted-bf16 prob levels."""
    (q_s, _, k_s, _, _, _, sc_s, sc_sh, p_s, p_sh, _, _) = sv
    rsqrt_d = np.float32(1.0 / np.sqrt(D))
    log2e = np.float32(np.log2(np.e))
    if mode == "noq":  # ablation: no fake-quant rounds/clips
        e = jnp.exp2(s_raw * (q_s * k_s * rsqrt_d * log2e) + mask_j * log2e)
        denom = jnp.sum(e, axis=1, keepdims=True)
        return (e * ((1.0 / p_s) / denom) + p_sh).astype(jnp.bfloat16)
    qk_over_sc = q_s * k_s * (1.0 / sc_s)
    a = sc_s * rsqrt_d * log2e
    mask2 = mask_j * log2e + a * sc_sh
    r = jnp.clip(jnp.round(s_raw * qk_over_sc) - sc_sh, -128.0, 127.0)
    e = jnp.exp2(a * r + mask2)
    denom = jnp.sum(e, axis=1, keepdims=True)
    return jnp.clip(jnp.round(e * ((1.0 / p_s) / denom)),
                    p_sh - 128.0, p_sh + 127.0).astype(jnp.bfloat16)


def _kernel(qkv_q, qkv_k, qkv_v, mask_ref, smem_ref, out_ref, scores_scr,
            *, n_batch, variant):
    sv = tuple(smem_ref[0, i] for i in range(12))
    (q_s, q_sh, k_s, k_sh, v_s, v_sh, _, _, p_s, p_sh, c_s, c_sh) = sv
    base = pl.program_id(0) * n_batch
    pv_over_c = p_s * v_s * (1.0 / c_s)
    dn = lambda a, b, tq: jax.lax.dot_general(  # noqa: E731
        a, b, dimension_numbers=(((1,), (tq,)), ((), ())),
        preferred_element_type=jnp.float32)

    for j in range(n_batch):
        rows = slice(j * T, (j + 1) * T)
        qj = (qkv_q[rows, :].astype(jnp.float32) + q_sh).astype(jnp.bfloat16)
        kj = (qkv_k[rows, :].astype(jnp.float32) + k_sh).astype(jnp.bfloat16)
        vj = (qkv_v[rows, :].astype(jnp.float32) + v_sh).astype(jnp.bfloat16)
        mask_j = mask_ref[pl.ds(base + j, 1), :]

        if variant == "fused":  # per-head, no scratch
            ctx = []
            for hh in range(NH):
                cols = slice(hh * D, (hh + 1) * D)
                s_raw = dn(qj[:, cols], kj[:, cols], 1)
                pb = _chain(s_raw, mask_j, sv, mode="q")
                ctx.append(dn(pb, vj[:, cols], 0))
            c = jnp.concatenate(ctx, axis=1)
        else:
            for hh in range(NH):
                cols = slice(hh * D, (hh + 1) * D)
                scores_scr[hh * T:(hh + 1) * T, :] = dn(
                    qj[:, cols], kj[:, cols], 1)
            if variant == "dotsonly":
                pb = scores_scr[:, :].astype(jnp.bfloat16)
            else:
                pb = _chain(scores_scr[:, :], mask_j, sv,
                            mode="noq" if variant == "noq" else "q")
            ctx = []
            for hh in range(NH):
                cols = slice(hh * D, (hh + 1) * D)
                ctx.append(dn(pb[hh * T:(hh + 1) * T, :], vj[:, cols], 0))
            c = jnp.concatenate(ctx, axis=1)
        out_ref[rows, :] = jnp.clip(
            jnp.round(c * pv_over_c) - c_sh, -128.0, 127.0
        ).astype(jnp.int8)


def variant_fn(variant, bb=4):
    kernel = functools.partial(_kernel, n_batch=bb, variant=variant)
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

    return one


def shipped(bb=4, dots="bf16"):
    def one(qkv8, mask, scal):
        return EK.int8_attention(qkv8, mask, scal, n_heads=NH, seq=T,
                                 batch_block=bb, skip_max=True, dots=dots)
    return one


def timed(one):
    @jax.jit
    def run(qkv8, mask, scal):
        def body(i, acc):
            s2 = scal + (i.astype(jnp.float32) * 1e-12)
            y = one(qkv8, mask, s2)
            return acc + y[0, 0].astype(jnp.int32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))

    def go(*args):
        int(run(*args))
        t0 = time.perf_counter()
        int(run(*args))
        return (time.perf_counter() - t0) / ITERS * 1e3
    return go


def main():
    rng = np.random.RandomState(0)
    qkv8 = jnp.asarray(rng.randint(-128, 128, (B * T, 3 * H)), jnp.int8)
    mask = jnp.concatenate(
        [jnp.zeros((B, T - 16), jnp.float32),
         jnp.full((B, 16), -10000.0, jnp.float32)], axis=1)
    scal = jnp.asarray([[0.02, 3.0, 0.02, -2.0, 0.015, 1.0,
                         0.11, 4.0, 1 / 255.0, 128.0, 0.01, 2.0]],
                       jnp.float32)

    ref = np.asarray(shipped()(qkv8, mask, scal))
    t = timed(shipped())(qkv8, mask, scal)
    print(f"# shipped  : {t:7.3f} ms", flush=True)
    for bb in (2, 4, 8):
        one = shipped(bb, dots="bf16ph")   # integrated per-head form
        out = np.asarray(one(qkv8, mask, scal))
        neq = int((out != ref).sum())
        t = timed(one)(qkv8, mask, scal)
        print(f"# bf16ph bb={bb}: {t:7.3f} ms (mismatches={neq})",
              flush=True)

    for name in ("full", "fused", "noq", "dotsonly"):
        one = variant_fn(name)
        try:
            out = np.asarray(one(qkv8, mask, scal))
        except Exception as e:
            print(f"# {name:9s}: FAILED {str(e)[:140]}", flush=True)
            continue
        neq = int((out != ref).sum())
        exact = (" (bit-exact)" if neq == 0
                 else f" (ablation, {neq} diffs)")
        t = timed(one)(qkv8, mask, scal)
        print(f"# {name:9s}: {t:7.3f} ms{exact}", flush=True)


if __name__ == "__main__":
    main()
