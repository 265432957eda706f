"""QAT forward on the int8 MXU: fake-quant values, STE gradients.

The reference's QAT (and round-2's here) pays float fake-quant matmuls:
``fq(x) @ fq(w)^T`` with both operands materialized in f32. But at fixed
(or per-step-frozen) ranges the quantized operands ARE int8 grids, so the
matmul itself can run int8 x int8 -> int32 on the MXU — the values are
*exactly* the fake-quant composition's (integer accumulation is exact
where the f32 GEMM rounds) — while the backward keeps the STE gradients
of the fake-quant composition, including the LSQ-style range gradients
(d loss / d delta, d loss / d zero_float) that learn-ranges QAT trains.

This is a TPU-native capability no torch QAT framework has: training
*through* the deployment arithmetic. Semantics oracle: the composition
``fake_quant(spec_x, qp_x, x) @ fake_quant(spec_w, qp_w, w)^T + b``
(reference: quantization/quantizers.py:189-211 forward, hijacker.py
pipeline), verified gradient-for-gradient in
tests/test_int8_qat.py.

Scope (prototype): per-tensor asymmetric 8-bit activations x symmetric
signed int8 weights (per-tensor or per-channel) — the paper's QAT base
configuration (README.md:187-200 uses W4A8; 4-bit weights also fit, the
grid just uses the narrower clip bounds).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from transformer_quantization_tpu.quant import quantizers as Q

Array = jax.Array


def _act_levels(x, s, zp):
    """Asymmetric 8-bit activation levels u (pre-clip) and the clip mask."""
    u = jnp.round(x / s) + zp
    keep = (u >= 0.0) & (u <= 255.0)
    return jnp.clip(u, 0.0, 255.0), keep


def _w_levels(w, s, lo, hi):
    u = jnp.round(w / s)
    keep = (u >= lo) & (u <= hi)
    return jnp.clip(u, lo, hi), keep


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def int8_qat_linear(x: Array, w: Array, bias: Optional[Array],
                    x_delta: Array, x_zero: Array, w_delta: Array,
                    w_bits: int = 8, w_per_channel: bool = False,
                    quantize_input: bool = True) -> Array:
    """``fake_quant(x) @ fake_quant(w)^T + bias`` with the matmul on the
    int8 MXU and STE/LSQ gradients.

    ``x``: (..., K) float. ``w``: (N, K) float (torch layout).
    ``x_delta``/``x_zero``: the activation site's trainable range params
    (linear scale domain). ``w_delta``: the weight site's trainable scale
    (scalar, or (N,) when ``w_per_channel``). Weights use the signed
    symmetric grid of ``w_bits``.

    ``quantize_input=False``: ``x`` is ALREADY the fake-quantized site
    value (the producer applied fake_quant — the standard QuantCtx flow,
    where the consumer matmul takes the quantized activation as-is).
    The level reconstruction ``round(x/s)+zp`` is then exact, the
    forward is unchanged, and the backward treats x_delta/x_zero as
    constants with d y/d x = fq_w (no STE mask — this op applies no
    quantization of its own to x; the producer's fake_quant owns those
    gradients).
    """
    y, _ = _fwd(x, w, bias, x_delta, x_zero, w_delta, w_bits,
                w_per_channel, quantize_input)
    return y


def _params(x_delta, x_zero, w_delta, w_per_channel, eps=1e-8):
    s_x = jnp.maximum(x_delta, eps)
    zp = jnp.clip(jnp.round(x_zero), 0.0, 255.0)
    s_w = jnp.maximum(w_delta, eps)
    if w_per_channel:
        s_w = s_w.reshape(-1, 1)  # (N, 1) against (N, K) weights
    return s_x, zp, s_w


def _fwd(x, w, bias, x_delta, x_zero, w_delta, w_bits, w_per_channel,
         quantize_input=True):
    s_x, zp, s_w = _params(x_delta, x_zero, w_delta, w_per_channel)
    lo, hi = -(2.0 ** (w_bits - 1)), 2.0 ** (w_bits - 1) - 1.0
    r_x, _ = _act_levels(x, s_x, zp)
    r_w, _ = _w_levels(w, s_w, lo, hi)
    # int8 payloads: acts shifted by -128 so both operands are int8
    p_x = (r_x - 128.0).astype(jnp.int8)
    p_w = r_w.astype(jnp.int8)
    acc = jax.lax.dot_general(
        p_x, p_w, dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    colsum = jnp.sum(r_w, axis=1)  # (N,) f32 (exact: integers)
    shift = 128.0 - zp
    y = (s_x * s_w.reshape(-1)) * (acc + shift * colsum)
    if bias is not None:
        y = y + bias
    return y, (x, w, bias is not None, x_delta, x_zero, w_delta)


def _bwd(w_bits, w_per_channel, quantize_input, res, g):
    x, w, has_bias, x_delta, x_zero, w_delta = res
    eps = 1e-8
    s_x, zp, s_w = _params(x_delta, x_zero, w_delta, w_per_channel)
    lo, hi = -(2.0 ** (w_bits - 1)), 2.0 ** (w_bits - 1) - 1.0
    r_x, keep_x = _act_levels(x, s_x, zp)
    r_w, keep_w = _w_levels(w, s_w, lo, hi)
    zkeep = (jnp.round(x_zero) >= 0.0) & (jnp.round(x_zero) <= 255.0)
    fq_x = s_x * (r_x - zp)
    fq_w = s_w * r_w

    nd = x.ndim - 1
    g_fqx = jax.lax.dot_general(
        g, fq_w, dimension_numbers=(((nd,), (0,)), ((), ())))
    # d loss / d fq_w: contract g and fq_x over all batch dims -> (N, K)
    bdims = tuple(range(nd))
    g_fqw = jax.lax.dot_general(
        g, fq_x, dimension_numbers=((bdims, bdims), ((), ())))

    if quantize_input:
        # activation STE grads (quantizers.py:184-186 with torch clamp
        # semantics — gradient on the closed interval, zero outside)
        kx = keep_x.astype(g.dtype)
        g_x = g_fqx * kx
        dmask_x = (x_delta >= eps).astype(g.dtype)
        g_xd = jnp.sum(g_fqx * ((r_x - zp) - kx * x / s_x)) * dmask_x
        g_xz = jnp.sum(g_fqx * s_x * (kx - 1.0)) * zkeep.astype(g.dtype)
    else:
        # x is the producer's fake-quantized value: this op adds no x
        # quantization, so the matmul gradient passes through unmasked
        # and the x-site range params are constants here
        g_x = g_fqx
        g_xd = jnp.zeros_like(x_delta)
        g_xz = jnp.zeros_like(x_zero)

    # weight grads (symmetric: no zero point)
    kw = keep_w.astype(g.dtype)
    g_w = g_fqw * kw
    dW = g_fqw * (r_w - kw * w / s_w)
    if w_per_channel:
        g_wd = jnp.sum(dW, axis=1) * (w_delta >= eps).astype(g.dtype)
    else:
        g_wd = jnp.sum(dW) * (w_delta >= eps).astype(g.dtype)

    g_b = (jnp.sum(g.reshape(-1, g.shape[-1]), axis=0) if has_bias
           else None)
    return g_x, g_w, g_b, g_xd, g_xz, g_wd


int8_qat_linear.defvjp(_fwd, _bwd)


def fakequant_qat_linear(x, w, bias, x_delta, x_zero, w_delta,
                         w_bits: int = 8, w_per_channel: bool = False):
    """The float fake-quant composition this module replaces — the
    semantics oracle for values AND gradients (differentiable via the
    quantizers' own STE paths)."""
    x_spec = Q.QuantizerSpec(n_bits=8, method=Q.QMethod.asymmetric_uniform)
    w_spec = Q.QuantizerSpec(n_bits=w_bits,
                             method=Q.QMethod.symmetric_uniform)
    qp_x = Q.QuantParams(delta=x_delta, zero_float=x_zero,
                         signed=jnp.zeros(()))
    qp_w = Q.QuantParams(delta=w_delta, zero_float=jnp.zeros_like(w_delta),
                         signed=jnp.ones(()))
    fx = Q.fake_quant(x_spec, qp_x, x)
    fw = Q.fake_quant(w_spec, qp_w, w, axis=0 if w_per_channel else None)
    y = jnp.einsum("...k,nk->...n", fx, fw)
    return y + bias if bias is not None else y
