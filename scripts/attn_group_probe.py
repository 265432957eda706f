"""Probe: grouped block-diagonal dots for the int8 attention kernel.

The shipped kernel (ops/pallas/engine_kernels.py) runs 24 per-head dots
per batch row: (T,64)@(64,T) and (T,T)@(T,64) — each contracts only 64
dims (half the MXU systolic depth) at M=N=128, so the MXU runs at a few
percent utilization and attention is the one stage still ~2 ms/step off
its floor (NOTES.md "Remaining headroom").

Grouped block-diagonal trick: pack g heads into ONE dot by placing each
head's q (or probs) block on the diagonal of a (g*T, g*64) operand built
with *lane-mask multiplies* (a zero/one (1, g*64) mask per head — no
sub-lane scatters, no transposes):

  phase 1, group p (heads p*g..p*g+g-1):
      Q_p = concat_rows(qj[:, cols_p] * mask_h  for h in group)
      S_p = dot(Q_p, kj[:, cols_p])          # contracts g*64 >= 128
      rows h*T..: exactly q_h @ k_h^T (cross-head terms killed by masks)
  phase 3, group p:
      A_p = concat_cols(p8[h*T:(h+1)*T, :])  # 128-aligned block moves
      B_p = concat_rows(vj[:, cols_p] * mask_h)
      C_p = dot(A_p, B_p)                    # (T, g*64) context cols

FLOP inflation = g, but contraction depth g*64 fills the MXU at g>=2 and
M = g*T amortizes pipeline fill. Sweep g in {2, 4, 6, 12} vs shipped.

    timeout 3600 python -u scripts/attn_group_probe.py          # TPU timing
    JAX_PLATFORMS=cpu python -u scripts/attn_group_probe.py check  # numerics
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


def _group_kernel(qkv_q, qkv_k, qkv_v, mask_ref, smem_ref, out_ref,
                  scores_scr, *, n_batch, g, skip_max):
    """Shipped kernel with phases 1+3 re-expressed as g-head grouped dots."""
    q_s, q_sh = smem_ref[0, 0], smem_ref[0, 1]
    k_s, k_sh = smem_ref[0, 2], smem_ref[0, 3]
    v_s, v_sh = smem_ref[0, 4], smem_ref[0, 5]
    sc_s, sc_sh = smem_ref[0, 6], smem_ref[0, 7]
    p_s, p_sh = smem_ref[0, 8], smem_ref[0, 9]
    c_s, c_sh = smem_ref[0, 10], smem_ref[0, 11]
    rsqrt_d = np.float32(1.0 / np.sqrt(D))
    base = pl.program_id(0) * n_batch
    seq, head_dim = T, D
    gw = g * head_dim  # group column width
    n_groups = NH // g

    # (1, gw) boolean lane masks selecting head h's 64 lanes within a
    # group (iota-built: pallas kernels can't capture array constants;
    # int8 elementwise multiply doesn't lower in Mosaic, so masking is
    # jnp.where selects)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, gw), 1)
    masks = [(lane >= h * head_dim) & (lane < (h + 1) * head_dim)
             for h in range(g)]

    for j in range(n_batch):
        rows = slice(j * seq, (j + 1) * seq)
        qj = qkv_q[rows, :]
        kj = qkv_k[rows, :]
        vj = qkv_v[rows, :]
        mask_j = mask_ref[pl.ds(base + j, 1), :]

        # ---- phase 1: grouped scores dots -> scratch ----
        for p in range(n_groups):
            cols = slice(p * gw, (p + 1) * gw)
            qp = qj[:, cols]
            kp = kj[:, cols]
            qbd = jnp.concatenate(
                [jnp.where(masks[h], qp, 0) for h in range(g)], axis=0)
            acc = jax.lax.dot_general(
                qbd, kp, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            # rank-1 payload-shift corrections, per head within the group
            # (2-D masked sums — minor-dim-splitting reshapes don't lower)
            corr = []
            for h in range(g):
                ksum_h = jnp.sum(jnp.where(masks[h], kp, 0)
                                 .astype(jnp.float32), axis=1,
                                 keepdims=True)  # (T, 1)
                qsum_h = jnp.sum(jnp.where(masks[h], qp, 0)
                                 .astype(jnp.float32), axis=1,
                                 keepdims=True)  # (T, 1)
                corr.append(q_sh * jnp.broadcast_to(ksum_h.T, (seq, seq))
                            + k_sh * qsum_h)
            scores_scr[p * g * seq:(p + 1) * g * seq, :] = (
                acc + jnp.concatenate(corr, axis=0)
                + head_dim * q_sh * k_sh)

        # ---- phase 2: one softmax pass over the whole tile (unchanged) ----
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

        # ---- phase 3: grouped context dots ----
        pv_over_c = p_s * v_s * (1.0 / c_s)
        vsum = jnp.sum(vj.astype(jnp.float32), axis=0, keepdims=True)
        psum = jnp.sum(p8.astype(jnp.float32), axis=1, keepdims=True)
        ctx_groups = []
        corr_groups = []
        for p in range(n_groups):
            cols = slice(p * gw, (p + 1) * gw)
            vp = vj[:, cols]
            vbd = jnp.concatenate(
                [jnp.where(masks[h], vp, 0) for h in range(g)], axis=0)
            ap = jnp.concatenate(
                [p8[(p * g + h) * seq:(p * g + h + 1) * seq, :]
                 for h in range(g)], axis=1)            # (T, g*T)
            acc2 = jax.lax.dot_general(
                ap, vbd, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            psum_cols = sum(
                jnp.where(masks[h],
                          psum[(p * g + h) * seq:(p * g + h + 1) * seq, :],
                          0.0) for h in range(g))
            ctx_groups.append(acc2)
            corr_groups.append(p_sh * vsum[:, cols] + v_sh * psum_cols
                               + seq * p_sh * v_sh)
        ctx = jnp.concatenate(ctx_groups, axis=1) + jnp.concatenate(
            corr_groups, axis=1)
        out_ref[rows, :] = jnp.clip(
            jnp.round(ctx * pv_over_c) - c_sh, -128.0, 127.0
        ).astype(jnp.int8)


def grouped(g, bb, skip_max, interpret=False):
    kernel = functools.partial(_group_kernel, n_batch=bb, g=g,
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
            compiler_params=(None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024)),
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
    for g in (2, 4, 6, 12):
        got = grouped(g, 1, True, interpret=True)(qkv8, mask, scal)
        ok = bool(jnp.all(got == want))
        print(f"g={g}: {'OK' if ok else 'MISMATCH'} "
              f"(maxdiff {int(jnp.max(jnp.abs(got.astype(jnp.int32) - want.astype(jnp.int32))))})",
              flush=True)


def main():
    qkv8, mask, scal = make_inputs()
    for bb in (1, 4):
        t = timed(timed_loop(functools.partial(
            EK.int8_attention, n_heads=NH, seq=T, batch_block=bb,
            skip_max=True)), qkv8, mask, scal)
        print(f"# shipped g=1 bb={bb}: {t:7.3f} ms per layer-call",
              flush=True)
    for g in (2, 4, 6, 12):
        for bb in (1, 4):
            try:
                t = timed(timed_loop(grouped(g, bb, True)),
                          qkv8, mask, scal)
            except Exception as e:
                print(f"# grouped g={g} bb={bb}: FAILED {str(e)[:140]}",
                      flush=True)
                continue
            print(f"# grouped g={g} bb={bb}: {t:7.3f} ms per layer-call",
                  flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "check":
        check()
    else:
        main()
