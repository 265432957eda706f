"""A/B the int8 attention phases against bf16-operand variants on TPU.

Round-3 left the attention middle at ~0.47 ms/layer, bounded by the
phase-1/3 small dots PLUS their rank-1 payload-shift corrections
(qsum/ksum reductions, (seq,seq) broadcasts, int32->f32 converts) — the
`dots_only` ablation in scripts/attn_probe.py INCLUDED the corrections,
so removing them was never measured.

The bf16 idea: fold the payload shifts into the operands instead —
convert each (seq, H) q/k/v tile ONCE to bf16 as (p + shift) and let the
MXU compute the corrected product directly:

    (p_q + sh_q) . (p_k + sh_k)  ==  p_q.p_k + sh_q*ksum + sh_k*qsum
                                      + d*sh_q*sh_k

This is BIT-EXACT, not approximate: payload+shift <= 255 is exactly
representable in bf16 (8 mantissa bits hold integers to 256); bf16 x
bf16 MXU products are exact in f32 (16-bit product mantissa < 24); and
the f32 accumulation stays integer-exact (worst case 255^2 * 256 =
16.65M < 2^24 for the grouped phase-3 dot). The shipped int8 path's f32
correction adds are also integer-exact, so the two paths produce the
same f32 scores bit-for-bit (asserted below).

Variants (all produce the full attention output; bit-equality asserted
against the shipped kernel before timing):

  shipped       int8 dots + rank-1 corrections (g=2, the round-3 config)
  bf16 g=1      per-head bf16 dots, no masking, no corrections
  bf16 g=2      grouped block-diagonal bf16 dots (masked q/v), no corr.
  bf16 g=4      wider grouping (K=256 contraction, 3 dots/phase/row)
  bf16 batched  one 3-D dot_general per row with an n_heads batch dim

    JAX_COMPILATION_CACHE_DIR=/root/repo/.jaxcache \
        timeout 1800 python -u scripts/attn_bf16_probe.py
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


def _phase2(scores, mask_j, sv, *, skip_max):
    """The shipped phase-2 softmax chain, emitting (p + p_sh) levels as
    bf16 (instead of the int8 payload) so phase 3 can dot them directly.
    clip(round(x) - sh, -128, 127) + sh == clip(round(x), sh-128, sh+127),
    so the bf16 levels match the shipped payload's levels exactly."""
    (q_s, _, k_s, _, _, _, sc_s, sc_sh, p_s, p_sh, _, _) = sv
    rsqrt_d = np.float32(1.0 / np.sqrt(D))
    log2e = np.float32(np.log2(np.e))
    qk_over_sc = q_s * k_s * (1.0 / sc_s)
    a = sc_s * rsqrt_d * log2e
    mask2 = mask_j * log2e + a * sc_sh
    r = jnp.clip(jnp.round(scores * qk_over_sc) - sc_sh, -128.0, 127.0)
    s2 = a * r + mask2
    if skip_max:
        e = jnp.exp2(s2)
    else:
        m = jnp.max(s2, axis=1, keepdims=True)
        e = jnp.exp2(s2 - m)
    denom = jnp.sum(e, axis=1, keepdims=True)
    return jnp.clip(jnp.round(e * ((1.0 / p_s) / denom)),
                    p_sh - 128.0, p_sh + 127.0).astype(jnp.bfloat16)


def _bf16_kernel(qkv_q, qkv_k, qkv_v, mask_ref, smem_ref, out_ref,
                 scores_scr, *, n_batch, group, skip_max, batched):
    sv = tuple(smem_ref[0, i] for i in range(12))
    (q_s, q_sh, k_s, k_sh, v_s, v_sh, _, _, p_s, p_sh, c_s, c_sh) = sv
    base = pl.program_id(0) * n_batch
    g = group
    gw = g * D
    if g > 1:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, gw), 1)
        lmask = [(lane >= h * D) & (lane < (h + 1) * D) for h in range(g)]
    pv_over_c = p_s * v_s * (1.0 / c_s)

    for j in range(n_batch):
        rows = slice(j * T, (j + 1) * T)
        # ONE shifted-bf16 conversion per tile (amortized across heads)
        qj = (qkv_q[rows, :].astype(jnp.float32) + q_sh).astype(jnp.bfloat16)
        kj = (qkv_k[rows, :].astype(jnp.float32) + k_sh).astype(jnp.bfloat16)
        vj = (qkv_v[rows, :].astype(jnp.float32) + v_sh).astype(jnp.bfloat16)
        mask_j = mask_ref[pl.ds(base + j, 1), :]

        # phase 1: shifted-operand dots; scratch <- dot output, no
        # correction terms
        if batched:
            q3 = qj.reshape(T, NH, D).transpose(1, 0, 2)
            k3 = kj.reshape(T, NH, D).transpose(1, 0, 2)
            acc = jax.lax.dot_general(
                q3, k3, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            scores_scr[:, :] = acc.reshape(NH * T, T)
        elif g > 1:
            for p in range(NH // g):
                cols = slice(p * gw, (p + 1) * gw)
                qp, kp = qj[:, cols], kj[:, cols]
                qbd = jnp.concatenate(
                    [jnp.where(lmask[h], qp, 0) for h in range(g)], axis=0)
                scores_scr[p * g * T:(p + 1) * g * T, :] = (
                    jax.lax.dot_general(
                        qbd, kp, dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32))
        else:
            for hh in range(NH):
                cols = slice(hh * D, (hh + 1) * D)
                scores_scr[hh * T:(hh + 1) * T, :] = jax.lax.dot_general(
                    qj[:, cols], kj[:, cols],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)

        # phase 2 (unchanged chain), probs emitted as shifted bf16 levels
        pb = _phase2(scores_scr[:, :], mask_j, sv, skip_max=skip_max)

        # phase 3: shifted-operand dots -> exact corrected context
        ctx_heads = []
        if batched:
            p3 = pb.reshape(NH, T, T)
            v3 = vj.reshape(T, NH, D).transpose(1, 0, 2)
            acc2 = jax.lax.dot_general(
                p3, v3, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            ctx = acc2.transpose(1, 0, 2).reshape(T, H)
        elif g > 1:
            for p in range(NH // g):
                cols = slice(p * gw, (p + 1) * gw)
                vp = vj[:, cols]
                vbd = jnp.concatenate(
                    [jnp.where(lmask[h], vp, 0) for h in range(g)], axis=0)
                ap = jnp.concatenate(
                    [pb[(p * g + h) * T:(p * g + h + 1) * T, :]
                     for h in range(g)], axis=1)
                ctx_heads.append(jax.lax.dot_general(
                    ap, vbd, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
            ctx = jnp.concatenate(ctx_heads, axis=1)
        else:
            for hh in range(NH):
                hrows = slice(hh * T, (hh + 1) * T)
                cols = slice(hh * D, (hh + 1) * D)
                ctx_heads.append(jax.lax.dot_general(
                    pb[hrows, :], vj[:, cols],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
            ctx = jnp.concatenate(ctx_heads, axis=1)
        out_ref[rows, :] = jnp.clip(
            jnp.round(ctx * pv_over_c) - c_sh, -128.0, 127.0
        ).astype(jnp.int8)


def bf16_variant(bb, group, skip_max, batched=False):
    kernel = functools.partial(_bf16_kernel, n_batch=bb, group=group,
                               skip_max=skip_max, batched=batched)
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


def shipped_one(bb, sm, group=None, dots="i8"):
    def one(qkv8, mask, scal):
        return EK.int8_attention(qkv8, mask, scal, n_heads=NH, seq=T,
                                 batch_block=bb, skip_max=sm, group=group,
                                 dots=dots)
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
    # integer shifts (128 - STE-rounded zero point), realistic scales
    scal = jnp.asarray([[0.02, 3.0, 0.02, -2.0, 0.015, 1.0,
                         0.11, 4.0, 1 / 255.0, 128.0, 0.01, 2.0]],
                       jnp.float32)

    ref = np.asarray(shipped_one(4, True)(qkv8, mask, scal))

    cases = [("bf16 g=1 ", shipped_one(4, True, group=1, dots="bf16")),
             ("bf16 g=2 ", shipped_one(4, True, group=2, dots="bf16")),
             ("bf16 g=4 ", shipped_one(4, True, group=4, dots="bf16")),
             ("bf16 bat ", bf16_variant(4, 1, True, batched=True))]
    for name, one in cases:
        try:
            out = np.asarray(one(qkv8, mask, scal))
        except Exception as e:
            print(f"# {name} bb=4: FAILED {str(e)[:160]}", flush=True)
            continue
        neq = int((out != ref).sum())
        print(f"# {name} bb=4: mismatches={neq} / {out.size}", flush=True)
        if neq:
            continue
        t = timed(one)(qkv8, mask, scal)
        print(f"# {name} bb=4: {t:7.3f} ms per layer-call", flush=True)

    for bb in (2, 4, 8):
        t = timed(shipped_one(bb, True))(qkv8, mask, scal)
        print(f"# shipped  bb={bb}: {t:7.3f} ms per layer-call", flush=True)
    # best bf16 at other bb values
    for bb in (2, 8):
        for name, g, bat in (("bf16 g=1 ", 1, False), ("bf16 g=2 ", 2, False),
                             ("bf16 bat ", 1, True)):
            try:
                one = (bf16_variant(bb, g, True, batched=True) if bat
                       else shipped_one(bb, True, group=g, dots="bf16"))
                out = np.asarray(one(qkv8, mask, scal))
                neq = int((out != ref).sum())
                if neq:
                    print(f"# {name} bb={bb}: mismatches={neq}", flush=True)
                    continue
                t = timed(one)(qkv8, mask, scal)
                print(f"# {name} bb={bb}: {t:7.3f} ms per layer-call",
                      flush=True)
            except Exception as e:
                print(f"# {name} bb={bb}: FAILED {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
