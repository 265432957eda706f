"""Per-kernel A/B: Pallas engine kernels vs their XLA reference impls at
BERT-base shapes (B=128, S=128). Pinpoints which kernel wins/loses.

    timeout 1800 python -u scripts/engine_kernel_bench.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from transformer_quantization_tpu.ops.pallas import engine_kernels as EK  # noqa: E402


def _sync(out):
    return float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])


def timed(fn, *args, iters=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def report(name, t_pallas, t_ref):
    print(f"# {name}: pallas {t_pallas:.3f} ms  vs xla {t_ref:.3f} ms  "
          f"({t_ref / t_pallas:.2f}x)", flush=True)


def main():
    rng = np.random.RandomState(0)
    M, H, I = 128 * 128, 768, 3072
    B, T, NH = 128, 128, 12

    def payload(shape):
        return jnp.asarray(rng.randint(-128, 128, shape), jnp.int8)

    def vecs(n):
        return jnp.asarray(np.stack([
            np.full(n, 0.01), rng.normal(0, 30, n), rng.normal(0, 0.1, n),
            np.full(n, 0.02), np.full(n, 3.0)]), jnp.float32)

    scal = jnp.asarray([[0.015, 11.0]], jnp.float32)

    cases = [
        ("qkv_emit (MxHx3H)", payload((M, H)), payload((3 * H, H)),
         vecs(3 * H), None, "emit"),
        ("attn_out_fold (MxHxH)", payload((M, H)), payload((H, H)),
         vecs(H), None, "fold"),
        ("inter_gelu_emit (MxHxI)", payload((M, H)), payload((I, H)),
         vecs(I), "gelu", "emit"),
        ("dense_fold (MxIxH)", payload((M, I)), payload((H, I)),
         vecs(H), None, "fold"),
    ]
    for name, x8, w8, v, act, mode in cases:
        fp = jax.jit(lambda a, b, c, d, act=act, mode=mode: EK.int8_matmul(
            a, b, c, d, activation=act, out_mode=mode,
            out_dtype=jnp.bfloat16))
        fr = jax.jit(lambda a, b, c, d, act=act, mode=mode: EK.int8_matmul_ref(
            a, b, c, d, activation=act, out_mode=mode,
            out_dtype=jnp.bfloat16))
        report(name, timed(fp, x8, w8, v, scal), timed(fr, x8, w8, v, scal))

    qkv8 = payload((M, 3 * H))
    mask = jnp.zeros((B, T), jnp.float32)
    ascal = jnp.asarray([np.concatenate([
        np.tile([0.02, 7.0], 3), [0.9, 12.0, 1 / 255.0, 128.0, 0.015,
                                  9.0]])], jnp.float32)
    for bb in (1, 2, 4):
        fa = jax.jit(lambda q, m, s, bb=bb: EK.int8_attention(
            q, m, s, n_heads=NH, seq=T, batch_block=bb))
        try:
            t = timed(fa, qkv8, mask, ascal)
            print(f"# attention pallas bb={bb}: {t:.3f} ms", flush=True)
        except Exception as e:
            print(f"# attention pallas bb={bb}: FAILED "
                  f"{str(e)[:160]}", flush=True)
    fr = jax.jit(lambda q, m, s: EK.int8_attention_ref(
        q, m, s, n_heads=NH, seq=T))
    print(f"# attention xla: {timed(fr, qkv8, mask, ascal):.3f} ms",
          flush=True)

    y = jnp.asarray(rng.normal(0, 1, (M, H)), jnp.bfloat16)
    r = jnp.asarray(rng.normal(0, 1, (M, H)), jnp.bfloat16)
    gb = jnp.asarray(rng.normal(0, 1, (2, H)), jnp.float32)
    lscal = jnp.asarray([[0.02, 3.0, 0.03, 5.0, 0.05, 6.0, 0.02, 11.0]],
                        jnp.float32)
    fp = jax.jit(lambda a, b, c, d: EK.fused_add_ln(
        a, b, c, d, eps=1e-12, out_dtype=jnp.bfloat16))
    fr = jax.jit(lambda a, b, c, d: EK.fused_add_ln_ref(
        a, b, c, d, eps=1e-12, out_dtype=jnp.bfloat16))
    report("add_ln (MxH)", timed(fp, y, r, gb, lscal),
           timed(fr, y, r, gb, lscal))

    y8 = payload((M, H))
    r8 = payload((M, H))
    fp = jax.jit(lambda a, b, c, d: EK.fused_add_ln_payload(
        a, b, c, d, eps=1e-12))
    fr = jax.jit(lambda a, b, c, d: EK.fused_add_ln_payload_ref(
        a, b, c, d, eps=1e-12))
    report("add_ln_payload (MxH)", timed(fp, y8, r8, gb, lscal),
           timed(fr, y8, r8, gb, lscal))


if __name__ == "__main__":
    main()
