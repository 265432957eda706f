"""Probe: device-time of act-site fake-quant chains, f32 vs bf16.

Runs each elementwise chain 50x inside one jit program (fori_loop) so the
remote tunnel's per-dispatch overhead (~2.5ms) amortizes away.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from transformer_quantization_tpu.quant import quantizers as Q
from transformer_quantization_tpu.quant.quantizers import QMethod

SPEC = Q.QuantizerSpec(n_bits=8, method=QMethod.asymmetric_uniform)
QP = Q.set_quant_range(SPEC, jnp.asarray(-3.0), jnp.asarray(3.0))


def timed(fn, x, iters=5):
    out = fn(x)
    float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    float(np.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / iters


def loop(body, n=50):
    @jax.jit
    def f(x):
        return jax.lax.fori_loop(0, n, lambda i, v: body(v) + 0 * i, x)
    return f


def main():
    rng = np.random.RandomState(0)
    shape = (32 * 128, 768)
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.normal(0, 1, shape), dtype)
        n = 50
        fq = loop(lambda v: Q.fake_quant(SPEC, QP, v), n)
        t = timed(fq, x)
        gb = 2 * x.nbytes * n / 1e9
        print(f"fake_quant {x.dtype!s:9s}: {t*1e3/n:7.3f} ms/op  "
              f"{gb/t:6.1f} GB/s", flush=True)
        idn = loop(lambda v: v * 1.0000001, n)
        t = timed(idn, x)
        print(f"mul        {x.dtype!s:9s}: {t*1e3/n:7.3f} ms/op  "
              f"{2*x.nbytes*n/1e9/t:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
