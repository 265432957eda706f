"""Pallas TPU kernel: fused quantize -> int8 matmul -> dequant epilogue.

The XLA int8 path (ops/int_linear.py) materializes the quantized
activation and the dequantized output as separate HBM tensors; at BERT's
sizes the quantized forward is bandwidth-bound on exactly these elementwise
passes, not on the matmuls. This kernel performs, in one pass over VMEM
tiles (one HBM read of x, one HBM write of y):

    x_int8 = clip(round(x / s_x) + zp_x)            # quantize-on-load
    acc    = x_int8 @ w_int8^T                      # MXU, int32 accumulate
    y      = s_x*s_w_n*(acc + shift*colsum_n) + b   # dequant fold + bias
    y      = act(y)                                 # optional fused GELU/Tanh
    y      = fake_quant(y; s_o, zp_o)               # optional output site

Weights stay resident as int8 (N, K) — 4x less weight HBM traffic than
f32. Per-channel weight scales supported. Grid over M only: BERT's K/N
(768/3072) fit VMEM whole.

No counterpart exists in the reference — it has no kernels at all
(SURVEY.md §2.6); this is the TPU-native replacement for its fake-quant
``forward`` hot path (quantization/quantizers.py:189-211 +
hijacker.py:66-116 fused into one device program).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS = True
except Exception:  # pragma: no cover
    _PALLAS = False


def pallas_available() -> bool:
    return _PALLAS


def _erf(x):
    # Mosaic has no erf/erfc primitive; Abramowitz-Stegun 7.1.26 rational
    # approximation (max abs error 1.5e-7) using only exp on the VPU
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    # jax.nn.gelu(approximate=False) lowers via erfc, which Mosaic lacks;
    # the erf formulation is mathematically identical
    return 0.5 * x * (1.0 + _erf(x * np.float32(1.0 / np.sqrt(2.0))))


def _gelu_new(x):
    # tanh-approximate gelu (ALBERT's gelu_new)
    c = np.float32(np.sqrt(2.0 / np.pi))
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))


# Even-part degree-10 polynomial GELU: gelu(x) = x/2 + h(x^2) with h even,
# fit as Chebyshev in u = x^2 on [0, 25] and evaluated by Horner in the
# scaled variable t = 2u/25 - 1 (f32-stable; the raw power basis in u is
# catastrophically ill-conditioned at this degree). Max |err| vs exact-erf
# GELU is 9.4e-5 on [-9, 9] — two orders below any 8-bit activation step —
# at ~16 VPU ops/element with no exp/divide (the A-S erf epilogue costs a
# reciprocal + exp + 12-op polynomial). Tail |x| > 5: h = |x|/2 exactly
# (gelu(x>5) = x to 1.5e-6, gelu(x<-5) = 0 to 1.5e-6).
# Fit recipe: scripts/vpu_probe.py:fit_poly(10, xmax=5.0).
_GELU_P10 = np.array(
    [1.7670614, 0.8885467, -0.23558326, 0.13436185, -0.10342609,
     0.12484333, -0.11978161, 0.01713814, -0.00230207, 0.08504884,
     -0.05600321], dtype=np.float32)
_GELU_UMAX = np.float32(25.0)


def _gelu_poly(x):
    u = jnp.minimum(x * x, _GELU_UMAX)
    t = u * np.float32(2.0 / _GELU_UMAX) - 1.0
    acc = jnp.full_like(x, _GELU_P10[-1])
    for c in _GELU_P10[-2::-1]:
        acc = acc * t + c
    h = jnp.where(x * x > _GELU_UMAX, 0.5 * jnp.abs(x), acc)
    return 0.5 * x + h


_ACTS = {
    None: None,
    "gelu": _gelu_exact,
    "gelu_new": _gelu_new,
    "gelu_poly10": _gelu_poly,
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
}


def _kernel(x_ref, w_ref, wscale_ref, colsum_ref, bias_ref, scal_ref,
            out_ref, *, activation, asym_in, out_bits, out_sym, has_bias,
            w4, in_int8, out_int8):
    """One (BM, K) x-tile against the full (N, K) weight.

    ``w4``: the weight ref holds split-half packed int4 nibbles
    (N, K/2) uint8 — byte j carries columns j (lo) and j + K/2 (hi)
    (int_linear.pack_weight_int4); unpacked in VMEM, contracted as two
    int8 halves on the MXU.

    ``in_int8``/``out_int8``: the int8 hand-off protocol — the input is
    already the quantized payload of its activation site (skip
    quantize-on-load), and/or the output site's quantized payload is
    emitted directly as int8 (4x less HBM write than f32, and the
    consumer skips ITS quantize-on-load). Payload convention matches
    int_linear.quantize_activation_int8: asym uint grid shifted by -128.
    """
    s_x = scal_ref[0, 0]
    zp_x = scal_ref[0, 1]
    if in_int8:
        x_int8 = x_ref[:]
    else:
        x = x_ref[:].astype(jnp.float32)  # bf16 engine: f32 math in VMEM
        # quantize-on-load (int_linear.quantize_activation_int8 semantics)
        xq = jnp.round(x * (1.0 / s_x)) + (zp_x if asym_in else 0.0)
        if asym_in:
            xq = jnp.clip(xq, 0.0, 255.0) - 128.0
        else:
            xq = jnp.clip(xq, -128.0, 127.0)
        x_int8 = xq.astype(jnp.int8)

    dims = (((1,), (1,)), ((), ()))
    if w4:
        p = w_ref[:].astype(jnp.int32)
        lo = p & 0xF
        hi = p >> 4
        lo = jnp.where(lo >= 8, lo - 16, lo).astype(jnp.int8)
        hi = jnp.where(hi >= 8, hi - 16, hi).astype(jnp.int8)
        k2 = x_int8.shape[1] // 2
        acc = (jax.lax.dot_general(
                   x_int8[:, :k2], lo, dimension_numbers=dims,
                   preferred_element_type=jnp.int32)
               + jax.lax.dot_general(
                   x_int8[:, k2:], hi, dimension_numbers=dims,
                   preferred_element_type=jnp.int32)).astype(jnp.float32)
    else:
        acc = jax.lax.dot_general(
            x_int8, w_ref[:], dimension_numbers=dims,
            preferred_element_type=jnp.int32).astype(jnp.float32)

    if asym_in:
        acc = acc + (128.0 - zp_x) * colsum_ref[0, :]
    y = (s_x * wscale_ref[0, :]) * acc
    if has_bias:
        y = y + bias_ref[0, :]
    act = _ACTS[activation]
    if act is not None:
        y = act(y)
    if out_bits:
        s_o = scal_ref[0, 2]
        zp_o = scal_ref[0, 3]
        signed_o = scal_ref[0, 4]
        if out_sym:
            imax = jnp.where(signed_o > 0, 2.0 ** (out_bits - 1) - 1,
                             2.0 ** out_bits - 1)
            imin = jnp.where(signed_o > 0, -(2.0 ** (out_bits - 1)), 0.0)
        else:
            imin, imax = 0.0, 2.0 ** out_bits - 1
        y_int = jnp.clip(jnp.round(y * (1.0 / s_o)) + zp_o, imin, imax)
        if out_int8:
            # emit the next matmul's input payload directly
            out_ref[:] = (y_int - (0.0 if out_sym else 128.0)).astype(
                jnp.int8)
            return
        y = s_o * (y_int - zp_o)
    out_ref[:] = y.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("activation", "asym_in", "out_bits", "out_sym",
                     "block_m", "interpret", "w4", "out_int8"))
def _fused_call(x2d, w_int8, w_scale, colsum, bias, scalars, *, activation,
                asym_in, out_bits, out_sym, block_m, interpret=False,
                w4=False, out_int8=False):
    m, k2d = x2d.shape
    in_int8 = x2d.dtype == jnp.int8
    n = w_int8.shape[0]
    kw = w_int8.shape[1]  # k for int8, k/2 for packed int4
    k = kw * (2 if w4 else 1)
    has_bias = bias is not None
    if bias is None:
        bias = jnp.zeros((n,), jnp.float32)
    w_scale = w_scale.reshape(1, n)
    colsum = colsum.reshape(1, n)
    bias = bias.reshape(1, n)
    grid = (m // block_m,)
    kernel = functools.partial(_kernel, activation=activation,
                               asym_in=asym_in, out_bits=out_bits,
                               out_sym=out_sym, has_bias=has_bias, w4=w4,
                               in_int8=in_int8, out_int8=out_int8)
    flops = 2 * m * n * k
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, k2d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, kw), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block_m, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (m, n), jnp.int8 if out_int8
            else (jnp.float32 if in_int8 else x2d.dtype)),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=m * k * 4 + n * k + m * n * 4,
            transcendentals=m * n if activation else 0),
        compiler_params=(None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT)),
        interpret=interpret,
    )(x2d, w_int8, w_scale, colsum, bias, scalars)


_VMEM_LIMIT = 32 * 1024 * 1024   # raise Mosaic's 16M default scoped limit
_VMEM_BUDGET = 26 * 1024 * 1024  # block-picker headroom under the limit


def _pick_block_m(m: int, k: int, n: int, kw: int,
                  requested: Optional[int]) -> int:
    """Largest block_m that divides m and fits the VMEM budget.

    Per grid step: x tile (bm, k) f32 + out tile (bm, n) f32 + resident
    weight (n, kw) int8 (+ f32 epilogue vectors). Measured on v5e: the
    16M scoped limit trips at bm=1024 for the BERT FFN shape; bm=512 is
    the sweet spot (30% faster than 256 there).
    """
    bm = requested or 1024
    while bm > 8:
        if m % bm == 0 and (bm * k * 4 + bm * n * 4 + n * kw
                            + 4 * 4 * n) <= _VMEM_BUDGET:
            return bm
        bm //= 2
    return bm


def fused_int8_linear(x, packed, in_spec, in_qp, bias=None, activation=None,
                      out_spec=None, out_qp=None,
                      block_m: Optional[int] = None,
                      interpret: Optional[bool] = None,
                      emit_int8: bool = False) -> Optional[jax.Array]:
    """Fused quantize+int8-matmul+dequant(+act)(+output fake-quant).

    Returns None when the shape/config doesn't fit the fast path (caller
    falls back to the XLA int path): requires f32/bf16 (or int8-payload)
    input, per-tensor input quantization, int8 or split-half packed int4
    weights, and a flattened batch divisible by ``block_m``.

    ``emit_int8``: write the *output site's* quantized int8 payload
    instead of the dequantized floats — the hand-off for sites consumed
    only by the next int8 matmul (which then takes the payload as its
    ``x``, skipping its quantize-on-load). Requires an 8-bit foldable
    output site.
    """
    if not _PALLAS:
        return None
    from transformer_quantization_tpu.quant import quantizers as Q

    w4 = "w_packed" in packed
    w_arr = packed["w_packed"] if w4 else packed.get("w_int")
    if w_arr is None:
        return None
    k = x.shape[-1]
    n = w_arr.shape[0]
    if x.dtype not in (jnp.float32, jnp.bfloat16, jnp.int8):
        return None
    if w_arr.shape[1] * (2 if w4 else 1) != k:
        return None
    if emit_int8 and (out_spec is None or out_qp is None
                      or out_spec.n_bits != 8):
        return None
    if interpret is None:
        # interpret only where Mosaic can't compile (CPU tests); the TPU
        # backend here may be named 'tpu' or 'axon' (remote tunnel)
        interpret = jax.default_backend() == "cpu"
    if not interpret and (n % 128 or k % 128):
        return None  # sub-MXU-tile layers (classifier head): XLA path wins
    lead = x.shape[:-1]
    m = int(np.prod(lead)) if lead else 1
    bm = _pick_block_m(m, k, n, w_arr.shape[1], block_m)
    if m % bm or m < 8:
        return None

    s_x = Q.scale_of(in_spec, in_qp).reshape(())
    zp_x = Q.zero_point_of(in_spec, in_qp).reshape(())
    asym_in = not in_spec.symmetric

    out_bits = 0
    out_sym = False
    s_o = zp_o = signed_o = jnp.zeros(())
    if out_spec is not None and out_qp is not None:
        if out_qp.delta.ndim == 0:  # per-tensor output site only
            out_bits = out_spec.n_bits
            out_sym = out_spec.symmetric
            s_o = Q.scale_of(out_spec, out_qp).reshape(())
            zp_o = Q.zero_point_of(out_spec, out_qp).reshape(())
            signed_o = out_qp.signed.reshape(())

    scalars = jnp.stack([s_x, zp_x, s_o, zp_o, signed_o,
                         jnp.zeros(()), jnp.zeros(()), jnp.zeros(())]
                        ).reshape(1, 8).astype(jnp.float32)
    w_scale = packed["scale"]
    if w_scale.shape[0] == 1 and n > 1:
        w_scale = jnp.broadcast_to(w_scale, (n,))
    y = _fused_call(x.reshape(m, k), w_arr, w_scale,
                    packed["colsum"],
                    None if bias is None else bias.astype(jnp.float32),
                    scalars, activation=activation, asym_in=asym_in,
                    out_bits=out_bits, out_sym=out_sym, block_m=bm,
                    interpret=interpret, w4=w4, out_int8=emit_int8)
    return y.reshape(*lead, n)
