"""Real-integer (INT8 / packed INT4) linear algebra.

The reference only *simulates* quantization — every tensor stays float32 and
each site does quantize->dequantize (reference: quantization/quantizers.py:
189-211). This module provides the real execution path the TPU build adds on
top: weights stored as int8 (or two int4 nibbles per byte), activations
re-quantized to int8 on entry, and the matmul executed on the MXU in
int8 x int8 -> int32 with the dequantization folded into the epilogue:

    y = s_x * s_w * (x_q @ w_q^T + (128 - z_x) * colsum(w_q))

where ``x_q`` is the (zero-point-shifted) int8 activation and ``colsum``
pre-absorbs the asymmetric activation zero-point. This is numerically the
same affine map the fake-quant path computes (exact int32 accumulation, so
it is *more* faithful than the float GEMM), which the parity tests check.

Supported fast path: symmetric int<=8 weights (per-tensor or per-channel
over dim 0) with per-tensor activation quantization — the paper's W8A8
recipe (README.md:148-156). Other configurations fall back to the
fake-quant path transparently.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from transformer_quantization_tpu.quant import quantizers as Q

Array = jax.Array


def can_pack_weight(spec: Q.QuantizerSpec) -> bool:
    return spec.symmetric and spec.n_bits <= 8


def pack_weight_int8(spec: Q.QuantizerSpec, qp: Q.QuantParams,
                     w: Array, alpha: Optional[Array] = None) -> Dict:
    """Quantize a weight tensor to a real int8 (or int4-in-int8) payload.

    Packs: ``w_int`` int8 ``(O, I)``, ``scale`` f32 ``()`` or ``(O,)``,
    ``colsum`` f32 ``(O,)`` (sum over the contraction dim, for asymmetric
    activation zero-point correction). ``alpha`` applies AdaRound's hard
    up/down rounding decision instead of round-to-nearest
    (reference: quantization/adaround/quantizer.py:74).
    """
    assert can_pack_weight(spec), "int8 packing needs symmetric <=8-bit weights"
    qpe = Q.expand_qparams(qp, w.ndim, 0)
    scale = Q.scale_of(spec, qpe)
    int_min, int_max = Q.int_min_max(spec, qp.signed)
    if alpha is not None:
        w_round = jnp.floor(w / scale) + (alpha >= 0).astype(jnp.float32)
    else:
        w_round = jnp.round(w / scale)
    w_int = jnp.clip(w_round, int_min, int_max).astype(jnp.int8)
    return {
        "w_int": w_int,
        "scale": jnp.reshape(Q.scale_of(spec, qp), (-1,)).astype(jnp.float32),
        "colsum": jnp.sum(w_int.astype(jnp.float32), axis=-1),
        "n_bits": spec.n_bits,
    }


def dequantize_packed_weight(packed: Dict) -> Array:
    """Packed int weight -> the dequantized f32 ``(O, I)`` tensor.

    Bit-identical to the fake-quant output (symmetric grid, zero point 0,
    AdaRound applied at pack time), but the weight is READ from HBM as
    int8 / packed int4 — 4-8x less weight traffic than f32. This is the
    weight-only execution mode (e.g. the paper's W4A32 AdaRound eval,
    README.md:176-183, where activations stay float): XLA fuses the
    dequant multiply into the consuming matmul's prologue.
    """
    if "w_packed" in packed:
        w_int = unpack_int4(packed["w_packed"], packed["in_features"])
    else:
        w_int = packed["w_int"]
    scale = packed["scale"]  # (1,) per-tensor or (O,) per-channel
    return w_int.astype(jnp.float32) * scale[:, None]


def quantize_activation_int8(spec: Q.QuantizerSpec, qp: Q.QuantParams,
                             x: Array):
    """Re-quantize a (fake-quantized) float activation to its int8 payload.

    Asymmetric uint grids are shifted by -128 into int8; returns
    ``(x_int8, scale, shift)`` with ``shift = 128 - zero_point`` such that
    the true integer value is ``x_int8 + shift``. Symmetric grids pass
    through with ``shift = -zero_point = 0``.
    """
    scale = Q.scale_of(spec, qp)
    zp = Q.zero_point_of(spec, qp)
    int_min, int_max = Q.int_min_max(spec, qp.signed)
    if x.dtype in (jnp.bfloat16, jnp.float16):
        x = x.astype(jnp.float32)  # grid arithmetic needs f32 mantissa
    x_int = jnp.clip(jnp.round(x / scale) + zp, int_min, int_max)
    if not spec.symmetric:
        x_int = x_int - 128.0
        shift = 128.0 - zp
    else:
        shift = jnp.zeros_like(zp)
    return x_int.astype(jnp.int8), scale.astype(jnp.float32), shift


def dequantize_activation_int8(spec: Q.QuantizerSpec, qp: Q.QuantParams,
                               x_int8: Array) -> Array:
    """Inverse of :func:`quantize_activation_int8` — payload -> floats."""
    scale = Q.scale_of(spec, qp)
    zp = Q.zero_point_of(spec, qp)
    x = x_int8.astype(jnp.float32)
    if not spec.symmetric:
        x = x + 128.0
    return scale * (x - zp)


def int8_linear(x_int8: Array, x_scale: Array, x_shift: Array, packed: Dict,
                bias: Optional[Array], activation=None,
                matmul=None) -> Array:
    """Fused dequantize-int8-matmul + bias + optional activation.

    ``matmul`` lets callers swap in a Pallas kernel; default is XLA
    ``dot_general`` with int32 accumulation on the MXU.
    """
    if "w_packed" in packed:
        w_int = unpack_int4(packed["w_packed"], packed["in_features"])
    else:
        w_int = packed["w_int"]
    if matmul is None:
        acc = jax.lax.dot_general(
            x_int8, w_int,
            dimension_numbers=(((x_int8.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
    else:
        acc = matmul(x_int8, w_int)
    acc = acc.astype(jnp.float32)
    acc = acc + x_shift * packed["colsum"]
    y = (x_scale * packed["scale"]) * acc
    if bias is not None:
        y = y + bias
    if activation is not None:
        y = activation(y)
    return y


def int8_grouped_linear(x_int8: Array, x_scale: Array, x_shift: Array,
                        packed: Dict, bias: Optional[Array], groups: int,
                        activation=None) -> Array:
    """Block-diagonal (grouped) variant of :func:`int8_linear` —
    SqueezeBERT's kernel-size-1 grouped convs on the int8 MXU path.

    The packed weight is ``(O, I/groups)``; output group j contracts
    input group j only, so ``colsum`` (per output row, over that row's
    own contracted inputs) makes the asymmetric-input zero-point
    correction exact per group, and input scales fold into the epilogue
    exactly as in the dense case.
    """
    if "w_packed" in packed:
        w_int = unpack_int4(packed["w_packed"], packed["in_features"])
    else:
        w_int = packed["w_int"]
    out_f, in_g = w_int.shape
    lead = x_int8.shape[:-1]
    xg = x_int8.reshape(*lead, groups, in_g)
    wg = w_int.reshape(groups, out_f // groups, in_g)
    acc = jnp.einsum("...gi,goi->...go", xg, wg,
                     preferred_element_type=jnp.int32)
    acc = acc.reshape(*lead, out_f).astype(jnp.float32)
    acc = acc + x_shift * packed["colsum"]
    y = (x_scale * packed["scale"]) * acc
    if bias is not None:
        y = y + bias
    if activation is not None:
        y = activation(y)
    return y


def pack_embedding_int8(spec: Q.QuantizerSpec, qp: Q.QuantParams,
                        table: Array) -> Dict:
    """Int8 embedding table; dequantized per gathered row."""
    qpe = Q.expand_qparams(qp, table.ndim, 0)
    scale = Q.scale_of(spec, qpe)
    zp = Q.zero_point_of(spec, qpe)
    int_min, int_max = Q.int_min_max(spec, qp.signed)
    t_int = jnp.clip(jnp.round(table / scale) + zp, int_min, int_max)
    if spec.symmetric:
        t_int8 = t_int.astype(jnp.int8)
        zp8 = jnp.zeros_like(zp)
    else:
        t_int8 = (t_int - 128.0).astype(jnp.int8)
        zp8 = zp - 128.0
    return {
        "t_int": t_int8,
        "scale": jnp.broadcast_to(scale, (table.shape[0], 1)).astype(
            jnp.float32) if scale.ndim else scale.astype(jnp.float32),
        "zp": jnp.broadcast_to(zp8, (table.shape[0], 1)).astype(jnp.float32)
        if zp8.ndim else zp8.astype(jnp.float32),
    }


def int8_embedding_lookup(ids: Array, packed: Dict) -> Array:
    rows = jnp.take(packed["t_int"], ids, axis=0).astype(jnp.float32)
    scale = packed["scale"]
    zp = packed["zp"]
    if getattr(scale, "ndim", 0):
        scale = jnp.take(scale, ids, axis=0)
        zp = jnp.take(zp, ids, axis=0)
    return scale * (rows - zp)


# ---------------------------------------------------------------------------
# INT8 attention: scores and context einsums on the MXU in int8
# ---------------------------------------------------------------------------
#
# The reference quantizes q/k/v outputs, attention scores, and softmax
# probabilities to 8 bits (models/quantized_bert.py:116-218) but computes
# the einsums in float. Since both operands of each einsum are tensors
# that sit ON an 8-bit grid, the einsum can run as int8 x int8 -> int32
# on the MXU with exact integer accumulation — bit-identical to the
# fake-quant semantics (stronger than float, which accumulates rounding)
# and ~1.6x the bf16 matmul rate. Zero-point cross terms are absorbed
# with per-row int8 sums:
#
#   sum_d (a8+sa)(b8+sb) = a8.b8 + sa*rowsum(b8) + sb*rowsum(a8) + d*sa*sb


def _q8(spec: Q.QuantizerSpec, qp: Q.QuantParams, x: Array):
    x8, s, shift = quantize_activation_int8(spec, qp, x)
    return x8, s.reshape(()), shift.reshape(())


def int8_attention_scores(q: Array, k: Array, q_spec, q_qp, k_spec, k_qp
                          ) -> Array:
    """(B,T,n,d) x (B,T,n,d) -> (B,n,Tq,Tk) raw attention scores.

    ``q``/``k`` are the (possibly not-yet-fake-quantized) outputs of the
    q/k projections; they are quantized here with their activation sites'
    params, so producer-side fake-quant may be skipped entirely.
    """
    d = q.shape[-1]
    q8, s_q, sh_q = _q8(q_spec, q_qp, q)
    k8, s_k, sh_k = _q8(k_spec, k_qp, k)
    acc = jnp.einsum("bqnd,bknd->bnqk", q8, k8,
                     preferred_element_type=jnp.int32).astype(jnp.float32)
    ksum = jnp.sum(k8.astype(jnp.float32), axis=-1)  # (B,Tk,n)
    qsum = jnp.sum(q8.astype(jnp.float32), axis=-1)  # (B,Tq,n)
    acc = (acc + sh_q * ksum.transpose(0, 2, 1)[:, :, None, :]
           + sh_k * qsum.transpose(0, 2, 1)[:, :, :, None]
           + d * sh_q * sh_k)
    return (s_q * s_k) * acc


def int8_attention_context(probs: Array, v: Array, p_spec, p_qp,
                           v_spec, v_qp) -> Array:
    """(B,n,Tq,Tk) x (B,Tk,n,d) -> (B,Tq,n,d) attention context."""
    tk = probs.shape[-1]
    p8, s_p, sh_p = _q8(p_spec, p_qp, probs)
    v8, s_v, sh_v = _q8(v_spec, v_qp, v)
    acc = jnp.einsum("bnqk,bknd->bqnd", p8, v8,
                     preferred_element_type=jnp.int32).astype(jnp.float32)
    vsum = jnp.sum(v8.astype(jnp.float32), axis=1)     # (B,n,d)
    psum = jnp.sum(p8.astype(jnp.float32), axis=-1)    # (B,n,Tq)
    acc = (acc + sh_p * vsum[:, None, :, :]
           + sh_v * psum.transpose(0, 2, 1)[:, :, :, None]
           + tk * sh_p * sh_v)
    return (s_p * s_v) * acc


# ---------------------------------------------------------------------------
# INT4 packing (two nibbles per byte) — unpacked in the consumer's prologue
# ---------------------------------------------------------------------------


def pack_weight_int4(spec: Q.QuantizerSpec, qp: Q.QuantParams,
                     w: Array) -> Dict:
    """Pack a symmetric 4-bit weight into nibbles, split-half layout:
    ``byte[:, j] = w[:, j] | (w[:, j + K/2] << 4)``.

    TPUs have no native int4 matmul; consumers unpack to int8 before the
    MXU (SURVEY.md §7 'Int4 on TPU'). The split-half layout makes the
    in-kernel unpack a major-axis concat (two contraction halves) instead
    of a minor-axis interleave, which Mosaic vectorizes cleanly.
    """
    assert spec.symmetric and spec.n_bits == 4
    qpe = Q.expand_qparams(qp, w.ndim, 0)
    scale = Q.scale_of(spec, qpe)
    int_min, int_max = Q.int_min_max(spec, qp.signed)
    w_int = jnp.clip(jnp.round(w / scale), int_min, int_max).astype(jnp.int32)
    o, i = w_int.shape
    assert i % 2 == 0
    k2 = i // 2
    lo = jnp.asarray(w_int[:, :k2] & 0xF, jnp.uint8)
    hi = jnp.asarray(w_int[:, k2:] & 0xF, jnp.uint8)
    packed = (lo | (hi << 4)).astype(jnp.uint8)
    return {
        "w_packed": packed,
        "scale": jnp.reshape(Q.scale_of(spec, qp), (-1,)).astype(jnp.float32),
        "colsum": jnp.sum(w_int.astype(jnp.float32), axis=-1),
        "n_bits": 4,
        "in_features": i,
    }


def unpack_int4(packed: Array, in_features: int) -> Array:
    """Split-half uint8 nibbles -> int8 in [-8, 7] (sign-extended)."""
    lo = (packed & 0xF).astype(jnp.int8)
    hi = (packed >> 4).astype(jnp.int8)
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    return jnp.concatenate([lo, hi], axis=1).astype(jnp.int8)
