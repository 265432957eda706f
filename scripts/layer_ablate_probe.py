"""In-kernel ablation of int8_layer_ln at BERT-base shapes.

The round-4 profile puts 96% of the engine step inside the 12 layer
kernels (1.24 ms profiled each vs ~1.0 ms pure-matmul floor at the
measured 239 TOP/s int8 rate). This probe rebuilds the layer kernel
with pieces stubbed out to attribute the per-layer overhead.

Timing is done two unambiguous ways (a loop whose body ignores the
iteration index gets HOISTED by XLA — measurements from that are
garbage; this bit an earlier version of this script):
  carry     jitted fori_loop whose carry IS the kernel's (M, H) int8
            payload — 30 truly dependent executions (device throughput)
  dispatch  sequential blocking calls (includes dispatch latency)

Variants:
  full       the shipped kernel (baseline; EK.int8_layer_ln)
  noattn     attention middle replaced by ctx := q payload (WRONG
             numerics) — isolates phases 1-3 of attention
  nogelu     activation=None on the FFN inter matmul
  nosoftmax  attention dots kept, phase-2 chain replaced by a cast
             (upper-bounds everything-but-phase-2; WRONG numerics)
  mmonly     noattn + nogelu + LN bodies replaced by requant-only

    JAX_COMPILATION_CACHE_DIR=/root/repo/.jaxcache \
        timeout 2400 python -u scripts/layer_ablate_probe.py
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

B, T, H, NH, N1 = 128, 128, 768, 12, 3072
D = H // NH
BB = 4
ITERS = 30


def _kernel(x_ref, wq_ref, vq_ref, sq_ref, mask_ref, asm_ref,
            wo_ref, vo_ref, so_ref, gb1_ref, ln1_ref,
            wi_ref, vi_ref, si_ref, wd_ref, vd_ref, sd_ref,
            gb2_ref, ln2_ref, out_ref, scores_scr, *, variant):
    noattn = variant in ("noattn", "mmonly")
    act = None if variant in ("nogelu", "mmonly") else "gelu"
    x8 = x_ref[:]
    dots = "bf16"
    qkv8 = EK._mm_emit(x8, wq_ref, vq_ref, sq_ref, w4=False, dots=dots)
    sv = tuple(asm_ref[0, i] for i in range(12))
    base = pl.program_id(0) * BB
    if noattn:
        c8 = jnp.clip(jnp.round(qkv8[:, 0:H].astype(jnp.float32)),
                      -128.0, 127.0).astype(jnp.int8)
    elif variant == "nosoftmax":
        rows_out = []
        for j in range(BB):
            rows = slice(j * T, (j + 1) * T)
            qj = qkv8[rows, 0:H]
            kj = qkv8[rows, H:2 * H]
            vj = qkv8[rows, 2 * H:3 * H]
            for hh in range(NH):
                cols = slice(hh * D, (hh + 1) * D)
                scores_scr[hh * T:(hh + 1) * T, :] = jax.lax.dot_general(
                    qj[:, cols], kj[:, cols],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            pb = scores_scr[:, :].astype(jnp.bfloat16)
            ctx = []
            for hh in range(NH):
                cols = slice(hh * D, (hh + 1) * D)
                ctx.append(jax.lax.dot_general(
                    pb[hh * T:(hh + 1) * T, :], vj[:, cols],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
            c = jnp.concatenate(ctx, axis=1)
            rows_out.append(jnp.clip(jnp.round(c * sv[8]), -128.0, 127.0
                                     ).astype(jnp.int8))
        c8 = jnp.concatenate(rows_out, axis=0)
    else:
        rows_out = []
        for j in range(BB):
            rows = slice(j * T, (j + 1) * T)
            mask_j = mask_ref[pl.ds(base + j, 1), :]
            rows_out.append(EK._attn_row(
                qkv8[rows, 0:H], qkv8[rows, H:2 * H], qkv8[rows, 2 * H:3 * H],
                mask_j, sv, scores_scr, n_heads=NH, seq=T, head_dim=D,
                skip_max=True, group=1, dots=dots))
        c8 = jnp.concatenate(rows_out, axis=0)

    if variant == "mmonly":
        acc2 = EK._int_dot(c8, wo_ref, False)
        hx8 = jnp.clip(jnp.round(acc2.astype(jnp.float32) * 1e-3),
                       -128.0, 127.0).astype(jnp.int8)
        i8 = EK._mm_emit(hx8, wi_ref, vi_ref, si_ref, w4=False, dots="i8")
        acc3 = EK._int_dot(i8, wd_ref, False)
        out_ref[:] = jnp.clip(jnp.round(acc3.astype(jnp.float32) * 1e-3),
                              -128.0, 127.0).astype(jnp.int8)
        return
    hx8 = EK._mm_norm_val(c8, wo_ref, vo_ref, so_ref, x8, gb1_ref, ln1_ref,
                          eps=1e-12, res_quant=True, w4=False,
                          norm="layernorm")
    i8 = EK._mm_emit(hx8, wi_ref, vi_ref, si_ref, w4=False, dots="i8",
                     activation=act)
    out_ref[:] = EK._mm_norm_val(i8, wd_ref, vd_ref, sd_ref, hx8, gb2_ref,
                                 ln2_ref, eps=1e-12, res_quant=True,
                                 w4=False, norm="layernorm")


def make_variant(variant):
    kernel = functools.partial(_kernel, variant=variant)
    blk = lambda r, c: pl.BlockSpec(  # noqa: E731
        (r, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    smem = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0, 0), memory_space=pltpu.SMEM)

    def one(x8, wq, vq, sq, mask, asm, wo, vo, so, gb1, ln1,
            wi, vi, si, wd, vd, sd, gb2, ln2):
        return pl.pallas_call(
            kernel,
            grid=(B // BB,),
            in_specs=[
                blk(BB * T, H),
                full(wq.shape), full((5, 3 * H)), smem((1, 2)),
                full((B, T)), smem((1, 12)),
                full(wo.shape), full((5, H)), smem((1, 2)),
                full((2, H)), smem((1, 8)),
                full(wi.shape), full((5, N1)), smem((1, 2)),
                full(wd.shape), full((5, H)), smem((1, 2)),
                full((2, H)), smem((1, 8)),
            ],
            out_specs=blk(BB * T, H),
            out_shape=jax.ShapeDtypeStruct((B * T, H), jnp.int8),
            scratch_shapes=[pltpu.VMEM((NH * T, T), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x8, wq, vq, sq, mask, asm, wo, vo, so, gb1, ln1,
          wi, vi, si, wd, vd, sd, gb2, ln2)

    return one


def timed_carry(one, args):
    """fori_loop carrying the (M, H) int8 payload: 30 dependent execs.

    Everything rides as jit ARGUMENTS — weights captured as closure
    constants get embedded in the program and re-uploaded per call
    through the axon tunnel (~0.7 GB/s), swamping the measurement.
    """
    @jax.jit
    def run(x8, rest):
        def body(i, h8):
            return one(h8, *rest)
        return jax.lax.fori_loop(0, ITERS, body, x8)

    np.asarray(run(args[0], args[1:]))[0, 0]
    t0 = time.perf_counter()
    np.asarray(run(args[0], args[1:]))[0, 0]
    return (time.perf_counter() - t0) / ITERS * 1e3


def timed_dispatch(one, args, iters=20):
    f = jax.jit(one)
    f(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        y = f(*args)
    y.block_until_ready()
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.RandomState(0)
    s8 = lambda *s: jnp.asarray(rng.randint(-128, 128, s), jnp.int8)  # noqa
    vec = lambda n: jnp.asarray(  # noqa: E731
        np.stack([np.ones(n), rng.rand(n), rng.rand(n),
                  np.full(n, 1 / 50.0), np.zeros(n)]), jnp.float32)
    x8 = s8(B * T, H)
    wq, wo, wi, wd = s8(3 * H, H), s8(H, H), s8(N1, H), s8(H, N1)
    vq, vo, vi, vd = vec(3 * H), vec(H), vec(N1), vec(H)
    sc2 = jnp.asarray([[0.02, 1.0]], jnp.float32)
    mask = jnp.zeros((B, T), jnp.float32)
    asm = jnp.asarray([[0.02, 3.0, 0.02, -2.0, 0.015, 1.0,
                        0.11, 4.0, 1 / 255.0, 128.0, 0.01, 2.0]],
                      jnp.float32)
    gb = jnp.asarray(np.stack([np.ones(H), np.zeros(H)]), jnp.float32)
    ln = jnp.asarray([[1.0, 0.0, 0.02, 0.5, 0.02, 0.5, 0.02, 0.5]],
                     jnp.float32)
    args = (x8, wq, vq, sc2, mask, asm, wo, vo, sc2, gb, ln,
            wi, vi, sc2, wd, vd, sc2, gb, ln)

    def shipped(*a):
        return EK.int8_layer_ln(
            a[0], a[1], a[2], a[3], a[4], a[5], a[6], a[7], a[8], a[9],
            a[10], a[11], a[12], a[13], a[14], a[15], a[16], a[17], a[18],
            n_heads=NH, seq=T, eps=1e-12, activation="gelu",
            skip_max=True, batch_block=BB)

    tc = timed_carry(shipped, args)
    td = timed_dispatch(shipped, args)
    print(f"# shipped  : carry {tc:7.3f} ms   dispatch {td:7.3f} ms",
          flush=True)
    for name in ("full", "nosoftmax", "noattn", "nogelu", "mmonly"):
        one = make_variant(name)
        tc = timed_carry(one, args)
        print(f"# {name:9s}: carry {tc:7.3f} ms", flush=True)

    # --- 12-layer chain with distinct weights: the in-model context ---
    def layer_weights(seed):
        r = np.random.RandomState(seed)
        w8 = lambda *s: jnp.asarray(r.randint(-128, 128, s), jnp.int8)  # noqa
        return (w8(3 * H, H), w8(H, H), w8(N1, H), w8(H, N1))

    wsets = [layer_weights(100 + i) for i in range(12)]

    @jax.jit
    def loop(h8, wsets, rest):
        (vq, sc2, mask, asm, vo, gb, ln, vi, vd) = rest

        def run12(h8):
            for (cwq, cwo, cwi, cwd) in wsets:
                h8 = EK.int8_layer_ln(
                    h8, cwq, vq, sc2, mask, asm, cwo, vo, sc2, gb, ln,
                    cwi, vi, sc2, cwd, vd, sc2, gb, ln,
                    n_heads=NH, seq=T, eps=1e-12, activation="gelu",
                    skip_max=True, batch_block=BB)
            return h8

        return jax.lax.fori_loop(0, 10, lambda i, h: run12(h), h8)

    rest = (vq, sc2, mask, asm, vo, gb, ln, vi, vd)
    np.asarray(loop(x8, wsets, rest))[0, 0]
    t0 = time.perf_counter()
    np.asarray(loop(x8, wsets, rest))[0, 0]
    dt = (time.perf_counter() - t0) / 10 * 1e3
    print(f"# chain12 distinct-w: {dt:7.3f} ms  ({dt / 12:5.3f}/layer)",
          flush=True)


if __name__ == "__main__":
    main()
