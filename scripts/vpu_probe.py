"""Measure VPU epilogue costs on TPU: requant / gelu variants / exp variants.

Informs the engine's fast-epilogue design (ops/pallas/engine_kernels.py):
the FFN-inter fusion runs at ~31% MFU because the exact-erf GELU epilogue
dominates; this probe quantifies cheaper, int8-grid-equivalent variants.

Loops IN-PROGRAM (lax.fori_loop around the kernel, iteration-dependent
SMEM scalar so XLA can't hoist) — the axon tunnel's ~2.5 ms per-dispatch
overhead makes Python-level timing loops meaningless (NOTES.md).

    timeout 1200 python -u scripts/vpu_probe.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from transformer_quantization_tpu.ops.pallas.int_matmul import (  # noqa: E402
    _gelu_exact,
    _gelu_new,
)

M, N = 16384, 3072
BM = 512
ITERS = 50

from numpy.polynomial import chebyshev as C  # noqa: E402

try:
    from scipy.special import erf as _erf
except ImportError:  # pragma: no cover
    from math import erf as _m

    _erf = np.vectorize(_m)


def fit_poly(deg, xmax=5.0):
    """Power coefficients in the scaled variable t = 2(x^2)/umax - 1.

    Fitting in u = x^2 then converting to the raw power basis is
    catastrophically ill-conditioned in f32 at deg 10; cheb2poly keeps
    the evaluation on [-1, 1] where Horner is stable (max err 9.4e-5)."""
    x = np.linspace(0, xmax, 40001)
    u = x * x
    h = 0.5 * x * _erf(x / np.sqrt(2))
    c = C.Chebyshev.fit(u, h, deg)
    return np.asarray(C.cheb2poly(c.coef), np.float32), np.float32(xmax * xmax)


P10, UMAX = fit_poly(10)


def gelu_poly(x):
    u = jnp.minimum(x * x, UMAX)
    t = u * np.float32(2.0 / UMAX) - 1.0
    acc = jnp.full_like(x, P10[-1])
    for c in P10[-2::-1]:
        acc = acc * t + c
    h = jnp.where(x * x > UMAX, 0.5 * jnp.abs(x), acc)
    return 0.5 * x + h


def requant(y):
    return jnp.clip(jnp.round(y * 8.3) - 3.0, -128.0, 127.0).astype(jnp.int8)


EPILOGUES = {
    "requant_only": lambda y: requant(y),
    "gelu_exact": lambda y: requant(_gelu_exact(y)),
    "gelu_tanh": lambda y: requant(_gelu_new(y)),
    "gelu_poly10": lambda y: requant(gelu_poly(y)),
    "exp": lambda y: requant(jnp.exp(-jnp.abs(y))),
    "exp2": lambda y: requant(jnp.exp2(-jnp.abs(y))),
}


def pallas_loop(fn):
    def kern(s_ref, x_ref, o_ref):
        o_ref[:] = fn(x_ref[:] + s_ref[0, 0])

    def one(x, s):
        return pl.pallas_call(
            kern,
            grid=(M // BM,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((BM, N), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BM, N), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.int8),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(s, x)

    @jax.jit
    def run(x):
        def body(i, acc):
            s = (i.astype(jnp.float32) * 1e-6).reshape(1, 1)
            y = one(x, s)
            return acc + y[0, 0].astype(jnp.int32)

        return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))

    return run


def xla_loop(fn):
    @jax.jit
    def run(x):
        def body(i, acc):
            y = fn(x + i.astype(jnp.float32) * 1e-6)
            return acc + y[0, 0].astype(jnp.int32)

        return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))

    return run


def timed(run, x):
    int(run(x))  # compile + warm
    t0 = time.perf_counter()
    int(run(x))
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(0, 2.5, (M, N)), jnp.float32)

    xs = jnp.asarray(np.linspace(-9, 9, 100001), jnp.float32)
    err = float(jnp.max(jnp.abs(gelu_poly(xs) - _gelu_exact(xs))))
    print(f"# gelu_poly10 max |err| on [-9,9]: {err:.3e}", flush=True)

    gel = M * N / 1e9
    for name, fn in EPILOGUES.items():
        tp = timed(pallas_loop(fn), x)
        tx = timed(xla_loop(fn), x)
        print(f"# {name:14s}: pallas {tp:7.3f} ms ({gel / tp * 1e3:6.1f} "
              f"Gelem/s)   xla {tx:7.3f} ms ({gel / tx * 1e3:6.1f} Gelem/s)",
              flush=True)


if __name__ == "__main__":
    main()
