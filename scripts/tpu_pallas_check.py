"""Quick TPU-side check of the fused int8 Pallas kernel vs the XLA path."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from transformer_quantization_tpu.ops import int_linear as IL
from transformer_quantization_tpu.ops.pallas import fused_int8_linear
from transformer_quantization_tpu.quant import quantizers as Q
from transformer_quantization_tpu.quant.quantizers import QMethod


def main(m=4096, k=768, n=768):
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.normal(0, 0.1, (n, k)), jnp.float32)
    x = jnp.asarray(rng.normal(0, 1.0, (m, k)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.05, (n,)), jnp.float32)
    wspec = Q.QuantizerSpec(n_bits=8, method=QMethod.symmetric_uniform)
    aspec = Q.QuantizerSpec(n_bits=8, method=QMethod.asymmetric_uniform)
    wqp = Q.set_quant_range(wspec, jnp.min(w, 1), jnp.max(w, 1))
    aqp = Q.set_quant_range(aspec, jnp.min(x), jnp.max(x))
    packed = IL.pack_weight_int8(wspec, wqp, w)

    y = fused_int8_linear(x, packed, aspec, aqp, bias=b, activation="gelu",
                          interpret=False)
    assert y is not None
    x8, s, shift = IL.quantize_activation_int8(aspec, aqp, x)
    y_ref = jax.nn.gelu(IL.int8_linear(x8, s, shift, packed, b, None),
                        approximate=False)
    err = float(jnp.max(jnp.abs(y - y_ref)))
    print("max abs err vs XLA int path:", err)
    assert err < 1e-3, err

    def timeit(fn, iters=50):
        o = fn()
        float(np.asarray(o).ravel()[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            o = fn()
        float(np.asarray(o).ravel()[0])
        return (time.perf_counter() - t0) / iters

    f_pl = jax.jit(lambda: fused_int8_linear(x, packed, aspec, aqp, bias=b,
                                             activation="gelu",
                                             interpret=False))
    def xla():
        x8, s, shift = IL.quantize_activation_int8(aspec, aqp, x)
        return jax.nn.gelu(IL.int8_linear(x8, s, shift, packed, b, None),
                           approximate=False)
    f_x = jax.jit(xla)
    w_bf = w.astype(jnp.bfloat16)
    f_bf = jax.jit(lambda: jax.nn.gelu(
        x.astype(jnp.bfloat16) @ w_bf.T + b.astype(jnp.bfloat16),
        approximate=False))
    t_pl, t_x, t_bf = timeit(f_pl), timeit(f_x), timeit(f_bf)
    fl = 2 * m * n * k
    print(f"pallas {t_pl*1e6:.1f}us ({fl/t_pl/1e12:.2f} TFLOP/s)  "
          f"xla-int {t_x*1e6:.1f}us ({fl/t_x/1e12:.2f})  "
          f"bf16 {t_bf*1e6:.1f}us ({fl/t_bf/1e12:.2f})")


if __name__ == "__main__":
    shapes = [(4096, 768, 768), (4096, 768, 3072), (4096, 3072, 768)]
    for m, k, n in shapes:
        print(f"--- m={m} k={k} n={n}")
        main(m, k, n)
