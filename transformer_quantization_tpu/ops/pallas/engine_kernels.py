"""Pallas TPU kernels for the full-handoff int8 inference engine.

Round-1 profiling showed the int8 path was bandwidth-bound on elementwise
quantize/dequantize passes between matmuls, not on the matmuls themselves
(NOTES.md "Where the time goes"). These kernels close every encoder edge:
activations travel between matmuls as *int8 payloads* (the quantized site
value, int8, asym grids shifted by -128 — the convention of
ops/int_linear.quantize_activation_int8), and every elementwise region
(dequant epilogue, GELU, softmax, residual add, LayerNorm, site
fake-quant) is fused into the producing kernel. Per encoder layer the
only HBM tensors are the five matmul payloads plus one bf16/f32 residual
stream.

Three kernels:

- :func:`int8_matmul` — payload x payload matmul with the dequant fold,
  bias, optional fused activation, and *per-column* output-site
  requantization in the epilogue. Per-column out params let one kernel
  emit the fused q|k|v payload (three sites, one matmul) at full MXU
  shape (M, 768) @ (768, 2304).
- :func:`int8_attention` — flash-style fused attention over payloads:
  scores = q8@k8^T (MXU int32) -> scores-site fake-quant -> 1/sqrt(d) ->
  mask -> f32 softmax -> probs-site quantize -> p8@v8 (MXU int32) ->
  context-site payload. The (B, n, T, T) scores/probs tensors never
  touch HBM (100 MB/layer of f32 traffic in the XLA path at B=128).
- :func:`fused_add_ln` — residual add + residual-site fake-quant +
  LayerNorm (quantized gamma) + ln-site quantization, emitting BOTH the
  int8 payload (for the consumer matmuls) and the float value (for the
  next residual branch) in one pass.

Quantization semantics are exactly the reference's fake-quant forward
(reference: quantization/quantizers.py:189-211) evaluated on the int
grid; the site inventory and ordering follow models/quantized_bert.py
(scores quantized before 1/sqrt(d), probs after softmax, residual sums
before LayerNorm). Each kernel has a pure-jnp reference implementation
(``*_ref``) used as the CPU/test oracle and as an alternative
XLA-composed backend.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from transformer_quantization_tpu.ops.pallas.int_matmul import _ACTS

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = pltpu = None

Array = jax.Array

_VMEM_LIMIT = 64 * 1024 * 1024
_VMEM_BUDGET = 24 * 1024 * 1024


def _grid_params(n_dims: int = 1):
    """CompilerParams for the M-gridded kernels. The grid dimension is
    semantically parallel (each step owns a disjoint row block; the
    scores scratch carries no cross-step state); declaring it
    ``parallel`` measured NEUTRAL on v5e with fresh executables per
    variant (round 5, scripts/engine_ab.py with cache clearing:
    unset 17.145 / parallel 17.164 / arbitrary 17.166 ms at B=128) —
    the ``TQ_DIMSEM`` env var keeps the knob without forking kernels."""
    dimsem = os.environ.get("TQ_DIMSEM") or None
    return pltpu.CompilerParams(
        vmem_limit_bytes=_VMEM_LIMIT,
        dimension_semantics=(dimsem,) * n_dims if dimsem else None)


# ---------------------------------------------------------------------------
# Payload helpers (shared by kernels and jnp reference paths)
#
# payload convention: int8 ``p`` with value ``s * (p + shift)``;
# shift = 128 - zero_point for asymmetric sites (int_linear's -128 shift),
# 0 for symmetric-signed sites.
# ---------------------------------------------------------------------------


def quantize_payload(x: Array, s, shift) -> Array:
    """float -> int8 payload of a per-tensor 8-bit site."""
    r = jnp.round(x.astype(jnp.float32) * (1.0 / s)) - shift
    return jnp.clip(r, -128.0, 127.0).astype(jnp.int8)


def dequantize_payload(p: Array, s, shift) -> Array:
    """int8 payload -> float site value."""
    return s * (p.astype(jnp.float32) + shift)


def _clip_bounds(bits: int) -> Tuple[float, float]:
    """Payload-grid clip bounds of a ``bits``-bit site.

    The b-bit generalization of the int8 payload convention: levels are
    shifted by ``2^(b-1) - zero_point`` so the grid is symmetric around 0
    (``clip(round(x/s)+zp, 0, 2^b-1) - zp == clip(round(x/s)-sh, -H, H-1)
    + sh`` with ``H = 2^(b-1)``, ``sh = H - zp``). 16-bit sites of the
    mixed W8A{8,16} recipe use (-32768, 32767); levels stay exact in f32.
    """
    half = float(2 ** (bits - 1))
    return -half, half - 1.0


def fakequant_f32(x: Array, s, shift, lo: float = -128.0,
                  hi: float = 127.0) -> Array:
    """Fake-quant through the payload grid (quantizers.py:189-211)."""
    r = jnp.clip(jnp.round(x * (1.0 / s)) - shift, lo, hi)
    return s * (r + shift)


def _attn3(attn_bits) -> Tuple[int, int, int]:
    """Normalize an attention-sites bit tuple to (scores, probs, context).

    Context defaults to 8 (the int8 payload protocol); 2-tuples are the
    pre-context-flex static form and stay accepted everywhere.
    """
    ab = tuple(attn_bits)
    return (ab[0], ab[1], ab[2] if len(ab) > 2 else 8)


def _emit_ctx(ctx, pv_over_c, c_s, c_sh, c_bits: int):
    """Context-site emission from the f32 context accumulator.

    1..8-bit sites emit the int8 payload (narrower grids just clip
    tighter — the payload still fits int8). Disabled (bits 0) and
    16-bit sites emit a FLOAT VALUE edge — the consuming attn_out
    matmul runs ``in_mode='f'`` ('c': 'fp32' / 'c': 16 quant_dict keys,
    MobileBERT ``attn_output: False``). For bits 0 the builders pass
    identity (c_s=1, c_sh=0) params, so ``pv_over_c == p_s * v_s`` and
    the edge carries the raw p@v dequantization.
    """
    if c_bits == 0:
        return (ctx * pv_over_c).astype(jnp.float32)
    if c_bits > 8:
        half = float(2 ** (c_bits - 1))
        return (c_s * jnp.clip(jnp.round(ctx * pv_over_c),
                               c_sh - half, c_sh + half - 1.0)
                ).astype(jnp.float32)
    lo, hi = _clip_bounds(c_bits)
    return jnp.clip(jnp.round(ctx * pv_over_c) - c_sh, lo, hi
                    ).astype(jnp.int8)


# ---------------------------------------------------------------------------
# Kernel 1: payload matmul with per-column output requantization
# ---------------------------------------------------------------------------


def _int_dot(x8, w_ref, w4):
    """(BM, K) int8 tile @ full (N, K) int8 (or (N, K/2) packed-int4)
    weight ref -> f32 accumulator. The packed-int4 form unpacks nibbles
    in-register and contracts each half of x against its nibble plane."""
    dims = (((1,), (1,)), ((), ()))
    if w4:
        p = w_ref[:].astype(jnp.int32)
        lo = p & 0xF
        hi = p >> 4
        lo = jnp.where(lo >= 8, lo - 16, lo).astype(jnp.int8)
        hi = jnp.where(hi >= 8, hi - 16, hi).astype(jnp.int8)
        k2 = x8.shape[1] // 2
        acc = (jax.lax.dot_general(x8[:, :k2], lo, dimension_numbers=dims,
                                   preferred_element_type=jnp.int32)
               + jax.lax.dot_general(x8[:, k2:], hi, dimension_numbers=dims,
                                     preferred_element_type=jnp.int32))
    else:
        acc = jax.lax.dot_general(x8, w_ref[:], dimension_numbers=dims,
                                  preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32)


def _f_dot(x, w_ref, w4):
    """Float-edge variant of :func:`_int_dot`: (BM, K) bf16/f32 activation
    tile against the int8/int4 weight ref, cast in-register (int8 -> bf16
    is exact), MXU matmul with f32 accumulation. Used for 16-bit / PEG
    activation edges whose per-column scales can't factor out of the
    contraction."""
    dims = (((1,), (1,)), ((), ()))
    if w4:
        p = w_ref[:].astype(jnp.int32)
        lo = p & 0xF
        hi = p >> 4
        lo = jnp.where(lo >= 8, lo - 16, lo).astype(x.dtype)
        hi = jnp.where(hi >= 8, hi - 16, hi).astype(x.dtype)
        k2 = x.shape[1] // 2
        return (jax.lax.dot_general(x[:, :k2], lo, dimension_numbers=dims,
                                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(x[:, k2:], hi, dimension_numbers=dims,
                                      preferred_element_type=jnp.float32))
    return jax.lax.dot_general(x, w_ref[:].astype(x.dtype),
                               dimension_numbers=dims,
                               preferred_element_type=jnp.float32)


def _mm_body(x, w_ref, vec_ref, smem_ref, *, w4, in_mode):
    """Shared matmul + dequant-fold: returns the pre-activation f32 tile."""
    if in_mode == "i8":
        in_s = smem_ref[0, 0]
        in_shift = smem_ref[0, 1]
        acc = _int_dot(x, w_ref, w4)
        # x = s_x (p + shift)  =>  x @ W^T = s_x s_w (p @ w8^T + sh colsum)
        y = (in_s * vec_ref[0, :]) * (acc + in_shift * vec_ref[1, :])
    else:  # 'f': x carries the (fake-quantized) site VALUE
        acc = _f_dot(x, w_ref, w4)
        y = vec_ref[0, :] * acc
    return y + vec_ref[2, :]


def _mm_kernel(x_ref, w_ref, vec_ref, smem_ref, out_ref, *, activation,
               out_mode, w4, in_mode="i8", out_bits=8):
    """One (BM, K) payload tile against the full (N, K) int8 weight.

    ``vec_ref`` rows: 0 wscale, 1 colsum, 2 bias, 3 out_s, 4 out_shift
    (all (1, N) f32). ``smem_ref``: [in_s, in_shift] (i8 edges only).
    ``in_mode``: 'i8' int8-payload input | 'f' float value-edge input.
    ``out_bits`` generalizes the fold grid (16-bit mixed-recipe sites).
    """
    y = _mm_body(x_ref[:], w_ref, vec_ref, smem_ref, w4=w4, in_mode=in_mode)
    act = _ACTS[activation]
    if act is not None:
        y = act(y)
    if out_mode == "float":
        out_ref[:] = y.astype(out_ref.dtype)
        return
    lo, hi = _clip_bounds(out_bits)
    r = jnp.clip(jnp.round(y * (1.0 / vec_ref[3, :])) - vec_ref[4, :],
                 lo, hi)
    if out_mode == "emit":
        out_ref[:] = r.astype(jnp.int8)
    else:  # fold: fake-quantized float output
        out_ref[:] = (vec_ref[3, :] * (r + vec_ref[4, :])).astype(
            out_ref.dtype)


def _pick_block_m(m: int, bytes_per_row: int, requested: Optional[int]) -> int:
    bm = requested or 2048
    while bm > 8:
        if m % bm == 0 and bm * bytes_per_row <= _VMEM_BUDGET:
            return bm
        bm //= 2
    return bm


@functools.partial(
    jax.jit,
    static_argnames=("activation", "out_mode", "out_dtype", "block_m",
                     "interpret", "w4", "in_mode", "out_bits"))
def int8_matmul(x8: Array, w8: Array, vecs: Array, scalars: Array, *,
                activation=None, out_mode="emit", out_dtype=jnp.float32,
                block_m: Optional[int] = None, interpret: bool = False,
                w4: bool = False, in_mode: str = "i8",
                out_bits: int = 8) -> Array:
    """Payload matmul ``y = act(s_x s_w (x8 @ w8^T + shift colsum) + b)``.

    ``x8``: (M, K) int8 payload (``in_mode='i8'``) or bf16/f32 value edge
    (``in_mode='f'``). ``w8``: (N, K) int8 (or (N, K/2) packed int4
    nibbles when ``w4``). ``vecs``: (5, N) f32 rows
    [wscale, colsum, bias, out_s, out_shift]. ``scalars``: (1, 2) f32
    [in_s, in_shift]. ``out_mode``: 'emit' int8 payload of the output
    site | 'fold' fake-quantized float (grid of ``out_bits``) | 'float'
    raw float.
    """
    m, k = x8.shape
    n = w8.shape[0]
    out_is_int8 = out_mode == "emit"
    assert not (out_is_int8 and out_bits != 8)
    in_bytes = 1 if in_mode == "i8" else x8.dtype.itemsize
    row_bytes = k * in_bytes + n * (1 if out_is_int8 else 4) + 6 * 4
    bm = _pick_block_m(m, row_bytes, block_m)
    kernel = functools.partial(_mm_kernel, activation=activation,
                               out_mode=out_mode, w4=w4, in_mode=in_mode,
                               out_bits=out_bits)
    return pl.pallas_call(
        kernel,
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w8.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (m, n), jnp.int8 if out_is_int8 else out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k + n * k + m * n * (1 if out_is_int8 else 4),
            transcendentals=m * n if activation else 0),
        compiler_params=None if interpret else _grid_params(),
        interpret=interpret,
    )(x8, w8, vecs, scalars)


def int8_matmul_ref(x8, w8, vecs, scalars, *, activation=None,
                    out_mode="emit", out_dtype=jnp.float32, w4=False,
                    in_mode="i8", out_bits=8):
    """jnp oracle / XLA-composed backend for :func:`int8_matmul`."""
    if w4:
        from transformer_quantization_tpu.ops.int_linear import unpack_int4

        w8 = unpack_int4(w8, x8.shape[1])
    dims = (((1,), (1,)), ((), ()))
    if in_mode == "i8":
        acc = jax.lax.dot_general(
            x8, w8, dimension_numbers=dims,
            preferred_element_type=jnp.int32).astype(jnp.float32)
        in_s, in_shift = scalars[0, 0], scalars[0, 1]
        y = (in_s * vecs[0]) * (acc + in_shift * vecs[1]) + vecs[2]
    else:
        acc = jax.lax.dot_general(
            x8, w8.astype(x8.dtype), dimension_numbers=dims,
            preferred_element_type=jnp.float32)
        y = vecs[0] * acc + vecs[2]
    act = _ACTS[activation]
    if act is not None:
        y = act(y)
    if out_mode == "float":
        return y.astype(out_dtype)
    lo, hi = _clip_bounds(out_bits)
    r = jnp.clip(jnp.round(y / vecs[3]) - vecs[4], lo, hi)
    if out_mode == "emit":
        return r.astype(jnp.int8)
    return (vecs[3] * (r + vecs[4])).astype(out_dtype)


# ---------------------------------------------------------------------------
# Kernel 2: fused int8 attention over payloads
# ---------------------------------------------------------------------------


def _bf16_dots_ok(seq: int, head_dim: int) -> bool:
    """Whether the bf16-operand dot path is exact for these shapes.

    The bf16 path folds the payload shifts into the operands; its f32
    accumulator must hold every partial sum as an exact integer. Worst
    case per output element: phase 1 sums ``head_dim`` products <= 255^2,
    phase 3 sums ``seq`` of them — both must stay < 2^24 (f32's exact
    integer range). head_dim <= 128 always holds for the supported
    families; seq is the binding constraint (<= 257, i.e. every bucket
    up to 256).
    """
    return seq * 65025 < 2 ** 24 and head_dim * 65025 < 2 ** 24


def _resolve_dots(dots: str, seq: int, head_dim: int) -> str:
    """Resolve the attention ``dots`` mode.

    ``'auto'`` picks the shifted-bf16-operand path whenever it is exact
    for the shapes (A/B-measured 21% faster than the int8+corrections
    path on v5e — scripts/attn_bf16_probe.py); the ``TQ_ATTN_DOTS`` env
    var ('i8' | 'bf16', read at trace time) overrides for benchmarking.
    An explicit 'bf16' on shapes where the f32 accumulator can't hold
    the partial sums exactly is an error, never a silent approximation.
    """
    if dots == "auto":
        env = os.environ.get("TQ_ATTN_DOTS", "")
        dots = env if env in ("i8", "bf16", "bf16ph") else (
            "bf16" if _bf16_dots_ok(seq, head_dim) else "i8")
    if dots.startswith("bf16") and not _bf16_dots_ok(seq, head_dim):
        raise ValueError(
            f"dots='bf16' is not exact at seq={seq}, head_dim={head_dim} "
            "(f32 accumulator would round; use dots='i8' or 'auto')")
    return dots


def _attn_kernel(qkv_q, qkv_k, qkv_v, mask_ref, smem_ref, out_ref,
                 scores_scr, *, n_batch, n_heads, seq, head_dim, skip_max,
                 group=1, dots="i8", sc_bits=8, p_bits=8, c_bits=8):
    """One batch-block cell: phased attention over all heads at once.

    The q/k/v refs are (n_batch*seq, H) int8 blocks — full hidden width,
    because Mosaic block shapes need 128-divisible (or full) minor dims;
    per-head 64-lane slices happen in-register here instead.

    Three phases per batch row, so the VPU work runs on one large
    (n_heads*seq, seq) tile instead of n_heads small ones (the per-head
    unrolled form measured ~6 us per head-batch — MXU and VPU serialized
    on 16K-element tiles):
      1. all per-head q@k^T dots into a VMEM scores scratch,
      2. ONE fakequant+mask+softmax+probs-quant pass over the whole tile,
      3. per-head p8@v dots, concatenated, context-site quantize.

    ``group`` packs g heads per MXU dot in phases 1+3 via block-diagonal
    operands built with lane-mask selects: a per-head dot contracts only
    head_dim (64) lanes — half the MXU's 128 systolic depth at M=N=seq —
    so the grouped form trades g× zero-padding FLOPs for full contraction
    depth (g*head_dim >= 128) and g×-larger M. Head h of group p lives in
    rows h*seq of the group operand and lanes h*head_dim of the group's
    column slice; masks kill the cross-head terms, so results are
    bit-identical to the per-head dots (integer MXU accumulation, and the
    f32 correction adds keep the same association order).

    smem layout: [q_s, q_sh, k_s, k_sh, v_s, v_sh,
                  sc_s, sc_sh, p_s, p_sh, c_s, c_sh].
    """
    sv = tuple(smem_ref[0, i] for i in range(12))
    # the mask ref holds the FULL (B, T) array (tiny); Mosaic block shapes
    # can't be (n_batch, T) with n_batch < 8, so rows index dynamically
    base = pl.program_id(0) * n_batch
    for j in range(n_batch):
        rows = slice(j * seq, (j + 1) * seq)
        mask_j = mask_ref[pl.ds(base + j, 1), :]
        if dots.startswith("bf16"):
            # one shifted conversion per tile (p + shift, exact in bf16;
            # see _attn_row) replaces ALL rank-1 correction work below
            qj = (qkv_q[rows, :].astype(jnp.float32)
                  + sv[1]).astype(jnp.bfloat16)
            kj = (qkv_k[rows, :].astype(jnp.float32)
                  + sv[3]).astype(jnp.bfloat16)
            vj = (qkv_v[rows, :].astype(jnp.float32)
                  + sv[5]).astype(jnp.bfloat16)
        else:
            qj, kj, vj = qkv_q[rows, :], qkv_k[rows, :], qkv_v[rows, :]
        out_ref[rows, :] = _attn_row(
            qj, kj, vj, mask_j, sv,
            scores_scr, n_heads=n_heads, seq=seq, head_dim=head_dim,
            skip_max=skip_max, group=group, dots=dots, sc_bits=sc_bits,
            p_bits=p_bits, c_bits=c_bits)


def _attn_row_perhead(qj, kj, vj, mask_j, sv, *, n_heads, seq, head_dim,
                      skip_max, sc_bits=8, p_bits=8, c_bits=8):
    """Per-head fused-phase form of :func:`_attn_row` (``dots='bf16ph'``,
    shifted-bf16 operands): each head goes dot -> softmax chain -> dot
    on its own (seq, seq) tile in-register — NO scores scratch, trading
    the phased form's large-tile VPU batching for zero scratch traffic
    and MXU/VPU interleaving freedom. Same ops on the same values in the
    same reduction axis as the phased form, so bit-identical to it and
    to the oracle."""
    (q_s, q_sh, k_s, k_sh, v_s, v_sh,
     sc_s, sc_sh, p_s, p_sh, c_s, c_sh) = sv
    rsqrt_d = np.float32(1.0 / np.sqrt(head_dim))
    log2e = np.float32(np.log2(np.e))
    pv_over_c = p_s * v_s * (1.0 / c_s)
    ctx_heads = []
    for hh in range(n_heads):
        cols = slice(hh * head_dim, (hh + 1) * head_dim)
        s_raw = jax.lax.dot_general(
            qj[:, cols], kj[:, cols],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if sc_bits == 0:
            s2 = (q_s * k_s * rsqrt_d * log2e) * s_raw + mask_j * log2e
        else:
            qk_over_sc = q_s * k_s * (1.0 / sc_s)
            a = sc_s * rsqrt_d * log2e
            mask2 = mask_j * log2e + a * sc_sh
            lo_sc, hi_sc = _clip_bounds(sc_bits)
            r = jnp.clip(jnp.round(s_raw * qk_over_sc) - sc_sh,
                         lo_sc, hi_sc)
            s2 = a * r + mask2
        if skip_max:
            e = jnp.exp2(s2)
        else:
            m = jnp.max(s2, axis=1, keepdims=True)
            e = jnp.exp2(s2 - m)
        denom = jnp.sum(e, axis=1, keepdims=True)
        if p_bits == 0:
            pb = e * (1.0 / denom)
            vv = vj[:, cols].astype(jnp.float32)
        elif p_bits > 8:
            half = float(2 ** (p_bits - 1))
            pb = jnp.clip(jnp.round(e * ((1.0 / p_s) / denom)),
                          p_sh - half, p_sh + half - 1.0)
            vv = vj[:, cols].astype(jnp.float32)
        else:
            lo_p, hi_p = _clip_bounds(p_bits)
            pb = jnp.clip(jnp.round(e * ((1.0 / p_s) / denom)),
                          p_sh + lo_p, p_sh + hi_p).astype(jnp.bfloat16)
            vv = vj[:, cols]
        ctx_heads.append(jax.lax.dot_general(
            pb, vv, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    ctx = jnp.concatenate(ctx_heads, axis=1)
    return _emit_ctx(ctx, pv_over_c, c_s, c_sh, c_bits)


def _attn_row(qj, kj, vj, mask_j, sv, scores_scr, *, n_heads, seq,
              head_dim, skip_max, group, dots="i8", sc_bits=8, p_bits=8,
              c_bits=8):
    """Attention phases for ONE batch row's (seq, H) q/k/v payload tiles;
    returns the (seq, H) int8 context-site payload. Shared by the
    standalone attention kernel and the fused attention megakernel.

    ``dots="i8"``: int8-operand MXU dots plus rank-1 payload-shift
    corrections applied in phase 1 per group, on the f32 scratch.
    A/B-measured alternatives that LOST (round 3, v5e model-level):
    int32 scratch with exact-integer corrections folded into phase 2 on
    a (n_heads, seq, seq) reshape was 5% slower (3-D int32 VPU adds cost
    more than the saved converts); group/batch-block retunes
    (scripts/attn_sweep.py) confirmed g=2, bb=4 optimal.

    ``dots="bf16"``: the q/k/v tiles arrive as SHIFTED bf16 levels
    (payload + shift — exact: integers <= 256 are representable in
    bf16's 8 mantissa bits), so each MXU dot computes the corrected
    product directly:

        (p_q + sh_q) . (p_k + sh_k) == p_q.p_k + sh_q*ksum + sh_k*qsum
                                        + d*sh_q*sh_k

    and ALL rank-1 correction work (sums, (seq, seq) broadcasts,
    int32->f32 converts) vanishes. Bit-exact, not approximate: bf16 x
    bf16 products are exact in f32 (16-bit product mantissa < 24) and
    the f32 accumulation stays integer-exact for the shapes admitted by
    :func:`_bf16_dots_ok`. Phase 2 emits the probs as shifted bf16
    levels for the same reason (clip(round(x) - sh, -128, 127) + sh ==
    clip(round(x), sh - 128, sh + 127), so the levels match the int8
    payload's levels exactly).

    ``dots="f32"``: the q/k/v tiles carry FLOAT VALUES (16-bit q/k/v
    sites — quant_dict 'L'/'L{i}': 16 — whose grids fit neither int8
    payloads nor bf16 operands); the per-site sv scalars are identity
    (s=1, shift=0), so the same formulas compute value-space dots on
    f32 MXU operands. Probs emit as shifted f32 levels; context math is
    unchanged (v_s=1 makes the shifted level the value itself). A
    tolerance edge like the other flex paths, not bit-exact — the f32
    dots round exactly like the reference's own float matmuls.
    """
    if dots == "bf16ph":
        return _attn_row_perhead(qj, kj, vj, mask_j, sv, n_heads=n_heads,
                                 seq=seq, head_dim=head_dim,
                                 skip_max=skip_max, sc_bits=sc_bits,
                                 p_bits=p_bits, c_bits=c_bits)
    (q_s, q_sh, k_s, k_sh, v_s, v_sh,
     sc_s, sc_sh, p_s, p_sh, c_s, c_sh) = sv
    rsqrt_d = np.float32(1.0 / np.sqrt(head_dim))
    g = group
    gw = g * head_dim
    # (1, gw) boolean lane masks selecting head h's lanes within a group
    # (iota-built: pallas kernels can't capture array constants; int8
    # elementwise multiply doesn't lower in Mosaic, so masking is select)
    if g > 1:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, gw), 1)
        lmask = [(lane >= h * head_dim) & (lane < (h + 1) * head_dim)
                 for h in range(g)]

    # phase 1: q@k^T dots with the corrections applied in-register
    # (bf16 path: corrections are already folded into the operands)
    if dots in ("bf16", "f32") and g > 1:
        for p in range(n_heads // g):
            cols = slice(p * gw, (p + 1) * gw)
            qp, kp = qj[:, cols], kj[:, cols]
            qbd = jnp.concatenate(
                [jnp.where(lmask[h], qp, 0) for h in range(g)], axis=0)
            scores_scr[p * g * seq:(p + 1) * g * seq, :] = (
                jax.lax.dot_general(
                    qbd, kp, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32))
    elif dots in ("bf16", "f32"):
        for hh in range(n_heads):
            cols = slice(hh * head_dim, (hh + 1) * head_dim)
            scores_scr[hh * seq:(hh + 1) * seq, :] = jax.lax.dot_general(
                qj[:, cols], kj[:, cols],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
    elif g > 1:
        for p in range(n_heads // g):
            cols = slice(p * gw, (p + 1) * gw)
            qp, kp = qj[:, cols], kj[:, cols]
            qbd = jnp.concatenate(
                [jnp.where(lmask[h], qp, 0) for h in range(g)], axis=0)
            acc = jax.lax.dot_general(
                qbd, kp, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            ksum_rows = jnp.concatenate(
                [jnp.broadcast_to(
                    jnp.sum(jnp.where(lmask[h], kp, 0)
                            .astype(jnp.float32), axis=1,
                            keepdims=True).T, (seq, seq))
                 for h in range(g)], axis=0)
            qsum_col = jnp.concatenate(
                [jnp.sum(jnp.where(lmask[h], qp, 0)
                         .astype(jnp.float32), axis=1, keepdims=True)
                 for h in range(g)], axis=0)
            scores_scr[p * g * seq:(p + 1) * g * seq, :] = (
                acc + q_sh * ksum_rows + k_sh * qsum_col
                + head_dim * q_sh * k_sh)
    else:
        for hh in range(n_heads):
            cols = slice(hh * head_dim, (hh + 1) * head_dim)
            q8, k8 = qj[:, cols], kj[:, cols]
            acc = jax.lax.dot_general(
                q8, k8, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            qsum = jnp.sum(q8.astype(jnp.float32), axis=1,
                           keepdims=True)
            ksum = jnp.sum(k8.astype(jnp.float32), axis=1,
                           keepdims=True)
            scores_scr[hh * seq:(hh + 1) * seq, :] = (
                acc + q_sh * ksum.T + k_sh * qsum
                + head_dim * q_sh * k_sh)

    # phase 2: ONE elementwise/softmax pass over the whole tile, with
    # every scale folded so each step is a single VPU op chain:
    #   - scores-site fake-quant on RAW scores (quantized_bert.py:154)
    #     via one fused multiplier qk_over_sc = q_s k_s / sc_s,
    #   - 1/sqrt(d), mask and log2(e) folded into (a, mask2), so the
    #     softmax exponential is a bare exp2 (the VPU-native op; exp
    #     lowers to exp2 + a multiply),
    #   - softmax denominator and probs-site scale folded into one
    #     multiplier before the probs round.
    log2e = np.float32(np.log2(np.e))
    if sc_bits == 0:
        # scores site disabled ('s': 'fp32' / attn_scores: False):
        # no fake-quant — dequantized raw scores straight into softmax
        s2 = ((q_s * k_s * rsqrt_d * log2e) * scores_scr[:, :]
              + mask_j * log2e)
    else:
        qk_over_sc = q_s * k_s * (1.0 / sc_s)
        a = sc_s * rsqrt_d * log2e
        mask2 = mask_j * log2e + a * sc_sh
        lo_sc, hi_sc = _clip_bounds(sc_bits)
        r = jnp.clip(jnp.round(scores_scr[:, :] * qk_over_sc) - sc_sh,
                     lo_sc, hi_sc)
        s2 = a * r + mask2
    if skip_max:
        # quantized scores are grid-bounded (|s2| provably << 126,
        # checked at plan time); masked lanes underflow to exactly 0
        e = jnp.exp2(s2)
    else:
        m = jnp.max(s2, axis=1, keepdims=True)
        e = jnp.exp2(s2 - m)
    denom = jnp.sum(e, axis=1, keepdims=True)
    if p_bits == 0:
        # probs site disabled: raw softmax probabilities, f32-dot phase 3
        p8 = e * (1.0 / denom)
    elif p_bits > 8:
        # 16-bit probs site ('p': 16 / attn_probs_n_bits_act): levels
        # don't fit int8 payloads or bf16 operands — phase 3 runs f32
        # MXU dots on SHIFTED f32 levels (exact representation; the f32
        # accumulation rounds exactly like the reference's own float
        # probs @ v matmul, so this edge is tolerance-tested vs the
        # oracle on hardware, like the other flex value edges)
        half = float(2 ** (p_bits - 1))
        p8 = jnp.clip(jnp.round(e * ((1.0 / p_s) / denom)),
                      p_sh - half, p_sh + half - 1.0)
    elif dots in ("bf16", "f32"):
        lo_p, hi_p = _clip_bounds(p_bits)   # <=8-bit grids fit payloads
        p8 = jnp.clip(jnp.round(e * ((1.0 / p_s) / denom)),
                      p_sh + lo_p, p_sh + hi_p).astype(
            jnp.bfloat16 if dots == "bf16" else jnp.float32)
    else:
        lo_p, hi_p = _clip_bounds(p_bits)
        p8 = jnp.clip(jnp.round(e * ((1.0 / p_s) / denom)) - p_sh,
                      lo_p, hi_p).astype(jnp.int8)

    # phase 3: p8 @ v8 dots; the (p_s v_s) dequant scale and the
    # context-site 1/c_s fold into one multiplier pv_over_c
    pv_over_c = p_s * v_s * (1.0 / c_s)
    if dots not in ("bf16", "f32") and p_bits in range(1, 9):
        vsum = jnp.sum(vj.astype(jnp.float32), axis=0, keepdims=True)
        psum = jnp.sum(p8.astype(jnp.float32), axis=1, keepdims=True)
    ctx_heads = []
    if p_bits == 0 or p_bits > 8:
        vf = (vj.astype(jnp.float32) if dots in ("bf16", "f32")
              else vj.astype(jnp.float32) + v_sh)
        for hh in range(n_heads):
            hrows = slice(hh * seq, (hh + 1) * seq)
            cols = slice(hh * head_dim, (hh + 1) * head_dim)
            ctx_heads.append(jax.lax.dot_general(
                p8[hrows, :], vf[:, cols],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
    elif dots in ("bf16", "f32") and g > 1:
        for p in range(n_heads // g):
            cols = slice(p * gw, (p + 1) * gw)
            vp = vj[:, cols]
            vbd = jnp.concatenate(
                [jnp.where(lmask[h], vp, 0) for h in range(g)], axis=0)
            ap = jnp.concatenate(
                [p8[(p * g + h) * seq:(p * g + h + 1) * seq, :]
                 for h in range(g)], axis=1)
            ctx_heads.append(jax.lax.dot_general(
                ap, vbd, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
    elif dots in ("bf16", "f32"):
        for hh in range(n_heads):
            hrows = slice(hh * seq, (hh + 1) * seq)
            cols = slice(hh * head_dim, (hh + 1) * head_dim)
            ctx_heads.append(jax.lax.dot_general(
                p8[hrows, :], vj[:, cols],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
    elif g > 1:
        for p in range(n_heads // g):
            cols = slice(p * gw, (p + 1) * gw)
            vp = vj[:, cols]
            vbd = jnp.concatenate(
                [jnp.where(lmask[h], vp, 0) for h in range(g)], axis=0)
            ap = jnp.concatenate(
                [p8[(p * g + h) * seq:(p * g + h + 1) * seq, :]
                 for h in range(g)], axis=1)
            acc2 = jax.lax.dot_general(
                ap, vbd, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            psum_cols = sum(
                jnp.where(lmask[h],
                          psum[(p * g + h) * seq:
                               (p * g + h + 1) * seq, :], 0.0)
                for h in range(g))
            ctx_heads.append(acc2 + p_sh * vsum[:, cols]
                             + v_sh * psum_cols
                             + seq * p_sh * v_sh)
    else:
        for hh in range(n_heads):
            hrows = slice(hh * seq, (hh + 1) * seq)
            cols = slice(hh * head_dim, (hh + 1) * head_dim)
            acc2 = jax.lax.dot_general(
                p8[hrows, :], vj[:, cols],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            ctx_heads.append(acc2 + p_sh * vsum[:, cols]
                             + v_sh * psum[hrows, :]
                             + seq * p_sh * v_sh)
    ctx = jnp.concatenate(ctx_heads, axis=1)
    return _emit_ctx(ctx, pv_over_c, c_s, c_sh, c_bits)


def _attention_call(q_arr: Array, k_arr: Array, v_arr: Array, cols,
                    mask_bias: Array, scalars: Array, *, n_heads: int,
                    seq: int, hidden: int, batch_block: Optional[int],
                    skip_max: bool, interpret: bool,
                    group: Optional[int] = None,
                    dots: str = "auto",
                    attn_bits: Tuple[int, int] = (8, 8)) -> Array:
    """Shared pallas_call builder: each of q/k/v is an (M, n*hidden)
    array; ``cols`` picks the hidden-wide block column per input."""
    mt = q_arr.shape[0]
    h = hidden
    d = h // n_heads
    b = mt // seq
    # batch sub-blocks per grid cell trade Mosaic per-cell overhead
    # against unrolled program size (n_batch * n_heads inner bodies)
    if batch_block is None:
        bb = 1
        while b % (bb * 2) == 0 and (bb * 2) * seq <= 512:
            bb *= 2
    else:
        bb = batch_block
        while b % bb:
            bb = max(1, bb // 2)
    dots = _resolve_dots(dots, seq, d)
    if group is None:
        if dots in ("bf16", "f32"):
            # corrected products come straight off the MXU; the masking/
            # concat work of grouping only costs (probe: g=1 1.25 ms vs
            # g=2 1.37 at B=128/T=128 on v5e)
            group = 1
        else:
            # smallest head-group whose contraction g*d fills the MXU's
            # 128 systolic depth (scripts/attn_group_probe.py: g=2 at
            # d=64 is the sweet spot — larger g only inflates the
            # zero-padding FLOPs)
            group = 1
            while d * group < 128 and n_heads % (group * 2) == 0:
                group *= 2
    sc_bits, p_bits, c_bits = _attn3(attn_bits)
    kernel = functools.partial(_attn_kernel, n_batch=bb, n_heads=n_heads,
                               seq=seq, head_dim=d, skip_max=skip_max,
                               group=group, dots=dots,
                               sc_bits=sc_bits, p_bits=p_bits,
                               c_bits=c_bits)
    grid = (b // bb,)
    out_t = jnp.int8 if 1 <= c_bits <= 8 else jnp.float32
    spec = lambda col: pl.BlockSpec(  # noqa: E731
        (bb * seq, h), lambda i, col=col: (i, col),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            spec(cols[0]), spec(cols[1]), spec(cols[2]),
            pl.BlockSpec((b, seq), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 12), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((bb * seq, h), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mt, h), out_t),
        scratch_shapes=[pltpu.VMEM((n_heads * seq, seq), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n_heads * seq * seq * d,
            bytes_accessed=4 * mt * h + b * seq * 4,
            transcendentals=b * n_heads * seq * seq),
        compiler_params=None if interpret else _grid_params(),
        interpret=interpret,
    )(q_arr, k_arr, v_arr, mask_bias, scalars)


@functools.partial(
    jax.jit,
    static_argnames=("n_heads", "seq", "batch_block", "skip_max",
                     "interpret", "group", "dots", "attn_bits"))
def int8_attention(qkv8: Array, mask_bias: Array, scalars: Array, *,
                   n_heads: int, seq: int,
                   batch_block: Optional[int] = None,
                   skip_max: bool = False,
                   interpret: bool = False,
                   group: Optional[int] = None,
                   dots: str = "auto",
                   attn_bits: Tuple[int, int] = (8, 8)) -> Array:
    """Fused attention over the fused-QKV payload.

    ``qkv8``: (B*T, 3*H) int8 — columns [q | k | v], head-minor inside
    each third. ``mask_bias``: (B, T) f32 additive mask (-10000 on pads).
    ``scalars``: (1, 12) f32 site params (see :func:`_attn_kernel`).
    ``group``: heads per MXU dot (None = auto; see :func:`_attn_kernel`).
    Returns the (B*T, H) int8 payload of the context site.
    """
    h = qkv8.shape[1] // 3
    return _attention_call(qkv8, qkv8, qkv8, (0, 1, 2), mask_bias, scalars,
                           n_heads=n_heads, seq=seq, hidden=h,
                           batch_block=batch_block, skip_max=skip_max,
                           interpret=interpret, group=group, dots=dots,
                           attn_bits=attn_bits)


@functools.partial(
    jax.jit,
    static_argnames=("n_heads", "seq", "hidden", "cols", "batch_block",
                     "skip_max", "interpret", "group", "dots",
                     "attn_bits"))
def int8_attention_qkv(q_arr: Array, k_arr: Array, v_arr: Array,
                       mask_bias: Array, scalars: Array, *, n_heads: int,
                       seq: int, hidden: int,
                       cols: Tuple[int, int, int] = (0, 0, 0),
                       batch_block: Optional[int] = None,
                       skip_max: bool = False,
                       interpret: bool = False,
                       group: Optional[int] = None,
                       dots: str = "auto",
                       attn_bits: Tuple[int, int] = (8, 8)) -> Array:
    """Attention over SEPARATE q/k/v payload arrays (MobileBERT: q and k
    come from a fused [q|k] matmul over the shared bottleneck while v is
    its own matmul). ``cols[i]`` selects the ``hidden``-wide block column
    inside each input — a fused producer's halves are addressed without
    any slicing copies."""
    return _attention_call(q_arr, k_arr, v_arr, cols, mask_bias, scalars,
                           n_heads=n_heads, seq=seq, hidden=hidden,
                           batch_block=batch_block, skip_max=skip_max,
                           interpret=interpret, group=group, dots=dots,
                           attn_bits=attn_bits)


def int8_attention_ref(qkv8, mask_bias, scalars, *, n_heads, seq,
                       skip_max=False, attn_bits=(8, 8), dots="i8"):
    """jnp oracle / XLA backend for :func:`int8_attention`.

    ``dots='f32'``: ``qkv8`` carries fake-quantized f32 VALUES (16-bit
    q/k/v sites) with identity site scalars — value-space f32 einsums,
    no payload-shift corrections (see :func:`_attn_row`)."""
    mt, h3 = qkv8.shape
    h = h3 // 3
    d = h // n_heads
    b = mt // seq
    c_bits = _attn3(attn_bits)[2]
    s = scalars[0]
    q8, k8, v8 = (qkv8[:, i * h:(i + 1) * h].reshape(b, seq, n_heads, d)
                  for i in range(3))
    if dots == "f32":
        scr = jnp.einsum("bqnd,bknd->bnqk", q8, k8,
                         preferred_element_type=jnp.float32)
    else:
        acc = jnp.einsum(
            "bqnd,bknd->bnqk", q8, k8,
            preferred_element_type=jnp.int32).astype(jnp.float32)
        qsum = jnp.sum(q8.astype(jnp.float32), axis=-1)  # (b, T, n)
        ksum = jnp.sum(k8.astype(jnp.float32), axis=-1)
        scr = (acc + s[1] * ksum.transpose(0, 2, 1)[:, :, None, :]
               + s[3] * qsum.transpose(0, 2, 1)[:, :, :, None]
               + d * s[1] * s[3])
    # mirror the kernel's folded phase-2 math op-for-op (scale folds +
    # exp2 softmax) so interpret-mode kernel and oracle stay bit-equal
    log2e = np.float32(np.log2(np.e))
    rsqrt_d = np.float32(1.0 / np.sqrt(d))
    if attn_bits[0] == 0:
        s2 = ((s[0] * s[2] * rsqrt_d * log2e) * scr
              + mask_bias[:, None, None, :] * log2e)
    else:
        qk_over_sc = s[0] * s[2] * (1.0 / s[6])
        a = s[6] * rsqrt_d * log2e
        mask2 = mask_bias[:, None, None, :] * log2e + a * s[7]
        lo_sc, hi_sc = _clip_bounds(attn_bits[0])
        r = jnp.clip(jnp.round(scr * qk_over_sc) - s[7], lo_sc, hi_sc)
        s2 = a * r + mask2
    if skip_max:
        e = jnp.exp2(s2)
    else:
        m = jnp.max(s2, axis=-1, keepdims=True)
        e = jnp.exp2(s2 - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    pv_over_c = s[8] * s[4] * (1.0 / s[10])
    if attn_bits[1] == 0 or attn_bits[1] > 8 or dots == "f32":
        # 16-bit probs / f32 value dots: shifted f32 levels, f32 einsum
        # (see _attn_row); bits 0 = probs site disabled, raw softmax
        if attn_bits[1] == 0:
            pf = e * (1.0 / denom)
        elif attn_bits[1] > 8:
            half = float(2 ** (attn_bits[1] - 1))
            pf = jnp.clip(jnp.round(e * ((1.0 / s[8]) / denom)),
                          s[9] - half, s[9] + half - 1.0)
        else:
            lo_p, hi_p = _clip_bounds(attn_bits[1])
            pf = jnp.clip(jnp.round(e * ((1.0 / s[8]) / denom)),
                          s[9] + lo_p, s[9] + hi_p)
        vf = v8.astype(jnp.float32) + s[5]
        ctx = jnp.einsum("bnqk,bknd->bqnd", pf, vf,
                         preferred_element_type=jnp.float32)
        return _emit_ctx(ctx, pv_over_c, s[10], s[11],
                         c_bits).reshape(mt, h)
    lo_p, hi_p = _clip_bounds(attn_bits[1])
    p8 = jnp.clip(jnp.round(e * ((1.0 / s[8]) / denom)) - s[9],
                  lo_p, hi_p).astype(jnp.int8)
    acc2 = jnp.einsum("bnqk,bknd->bqnd", p8, v8,
                      preferred_element_type=jnp.int32).astype(jnp.float32)
    vsum = jnp.sum(v8.astype(jnp.float32), axis=1)   # (b, n, d)
    psum = jnp.sum(p8.astype(jnp.float32), axis=-1)  # (b, n, T)
    ctx = (acc2 + s[9] * vsum[:, None, :, :]
           + s[5] * psum.transpose(0, 2, 1)[:, :, :, None]
           + seq * s[9] * s[5])
    return _emit_ctx(ctx, pv_over_c, s[10], s[11], c_bits).reshape(mt, h)


def int8_attention_qkv_ref(q_arr, k_arr, v_arr, mask_bias, scalars, *,
                           n_heads, seq, hidden, cols=(0, 0, 0),
                           skip_max=False, attn_bits=(8, 8)):
    """jnp oracle / XLA backend for :func:`int8_attention_qkv`."""
    h = hidden
    q = q_arr[:, cols[0] * h:(cols[0] + 1) * h]
    k = k_arr[:, cols[1] * h:(cols[1] + 1) * h]
    v = v_arr[:, cols[2] * h:(cols[2] + 1) * h]
    return int8_attention_ref(jnp.concatenate([q, k, v], axis=1),
                              mask_bias, scalars, n_heads=n_heads, seq=seq,
                              skip_max=skip_max, attn_bits=attn_bits)


# ---------------------------------------------------------------------------
# Kernel 3: fused residual add + res-site quant + LayerNorm + ln-site quant
# ---------------------------------------------------------------------------


def _site_vals(smem_ref, lnv_ref):
    """LN-stage site params (res_s, res_sh, ln_s, ln_sh): per-column (1, N)
    rows from a VMEM vector ref when the sites are per-axis/grouped (PEG),
    else scalars from smem."""
    if lnv_ref is not None:
        return (lnv_ref[0:1, :], lnv_ref[1:2, :],
                lnv_ref[2:3, :], lnv_ref[3:4, :])
    return (smem_ref[0, 4], smem_ref[0, 5], smem_ref[0, 6], smem_ref[0, 7])


def _ln_body(x, gb_ref, site_vals, *, eps, res_quant, norm="layernorm",
             res_bits=8, ln_bits=8):
    """res-site fake-quant -> LayerNorm/NoNorm -> norm-site quant levels.

    ``site_vals`` = (res_s, res_sh, ln_s, ln_sh), scalars or per-column
    (1, N) rows (PEG sites). ``res_bits``/``ln_bits`` generalize the site
    grids (16-bit sites of the mixed recipe). ``norm='nonorm'`` is
    MobileBERT's reduction-free affine (ops/layers.py quant_nonorm):
    z = x * gamma_q + beta_q.
    """
    res_s, res_sh, ln_s, ln_sh = site_vals
    if res_quant:
        lo, hi = _clip_bounds(res_bits)
        x = fakequant_f32(x, res_s, res_sh, lo, hi)
    if norm == "nonorm":
        z = x * gb_ref[0, :] + gb_ref[1, :]
    else:
        # one-pass stats: E[x^2] - mean^2 runs both row reductions over
        # the same tile read instead of serializing mean -> center -> var
        # passes. Cancellation is benign here (LN inputs are O(1)-scale
        # residuals; the max(., 0) guards the pathological case).
        mean = jnp.mean(x, axis=1, keepdims=True)
        ms = jnp.mean(x * x, axis=1, keepdims=True)
        var = jnp.maximum(ms - mean * mean, 0.0)
        z = ((x - mean) * jax.lax.rsqrt(var + eps) * gb_ref[0, :]
             + gb_ref[1, :])
    lo, hi = _clip_bounds(ln_bits)
    return jnp.clip(jnp.round(z * (1.0 / ln_s)) - ln_sh, lo, hi), ln_s, ln_sh


def _add_ln_kernel(y_ref, r_ref, gb_ref, smem_ref, p_ref, f_ref, *, eps,
                   res_quant):
    x = y_ref[:].astype(jnp.float32) + r_ref[:].astype(jnp.float32)
    q, s_l, sh_l = _ln_body(x, gb_ref, _site_vals(smem_ref, None), eps=eps,
                            res_quant=res_quant)
    p_ref[:] = q.astype(jnp.int8)
    f_ref[:] = (s_l * (q + sh_l)).astype(f_ref.dtype)


def _add_ln_payload_kernel(y_ref, r_ref, gb_ref, smem_ref, p_ref, *, eps,
                           res_quant):
    """Payload-in/payload-out variant: the residual stream never touches
    HBM as float. Reads two int8 payloads (4x less traffic than the f32
    pair), reconstructs the float sum in-register (bit-exact: payload
    levels are integers <= 255, exactly representable; the scale products
    round identically to the float path), and emits only the ln-site
    payload."""
    y_s, y_sh = smem_ref[0, 0], smem_ref[0, 1]
    r_s, r_sh = smem_ref[0, 2], smem_ref[0, 3]
    x = (y_s * (y_ref[:].astype(jnp.float32) + y_sh)
         + r_s * (r_ref[:].astype(jnp.float32) + r_sh))
    q, _, _ = _ln_body(x, gb_ref, _site_vals(smem_ref, None), eps=eps,
                       res_quant=res_quant)
    p_ref[:] = q.astype(jnp.int8)


@functools.partial(
    jax.jit,
    static_argnames=("eps", "res_quant", "out_dtype", "block_m", "interpret"))
def fused_add_ln(y: Array, r: Array, gb: Array, scalars: Array, *,
                 eps: float, res_quant: bool = True,
                 out_dtype=jnp.float32, block_m: Optional[int] = None,
                 interpret: bool = False) -> Tuple[Array, Array]:
    """(residual add -> res-site fake-quant -> LayerNorm -> ln-site quant)
    in one HBM pass, emitting (int8 payload, float value).

    ``y``/``r``: (M, H) float. ``gb``: (2, H) f32 [gamma_q; beta].
    ``scalars``: (1, 8) f32 [y_s, y_sh, r_s, r_sh, res_s, res_shift,
    ln_s, ln_shift] (first four unused here; shared layout with
    :func:`fused_add_ln_payload`). Replaces four XLA elementwise passes
    over the residual stream (quantized_bert.py:233-277 res-quant + LN,
    plus the consumer's quantize-on-load).
    """
    m, hdim = y.shape
    fbytes = 4 if out_dtype == jnp.float32 else 2
    bm = _pick_block_m(m, hdim * (4 + 4 + 1 + fbytes), block_m)
    kernel = functools.partial(_add_ln_kernel, eps=eps, res_quant=res_quant)
    return pl.pallas_call(
        kernel,
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, hdim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, hdim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, hdim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((bm, hdim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, hdim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, hdim), jnp.int8),
            jax.ShapeDtypeStruct((m, hdim), out_dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * m * hdim,
            bytes_accessed=m * hdim * (4 + 4 + 1 + fbytes),
            transcendentals=m),
        compiler_params=None if interpret else _grid_params(),
        interpret=interpret,
    )(y, r, gb, scalars)


@functools.partial(
    jax.jit,
    static_argnames=("eps", "res_quant", "block_m", "interpret"))
def fused_add_ln_payload(y8: Array, r8: Array, gb: Array, scalars: Array, *,
                         eps: float, res_quant: bool = True,
                         block_m: Optional[int] = None,
                         interpret: bool = False) -> Array:
    """Payload-in/payload-out fused add+LN: reads the producing matmul's
    int8 payload and the int8 residual payload, emits only the ln-site
    payload. The float residual stream never exists in HBM (9 bytes/elem
    vs 17 for :func:`fused_add_ln` with f32 in/out).

    ``scalars``: (1, 8) f32 [y_s, y_sh, r_s, r_sh, res_s, res_shift,
    ln_s, ln_shift].
    """
    m, hdim = y8.shape
    bm = _pick_block_m(m, hdim * 3, block_m)
    kernel = functools.partial(_add_ln_payload_kernel, eps=eps,
                               res_quant=res_quant)
    return pl.pallas_call(
        kernel,
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, hdim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, hdim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, hdim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((bm, hdim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, hdim), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=12 * m * hdim,
            bytes_accessed=m * hdim * 3,
            transcendentals=m),
        compiler_params=None if interpret else _grid_params(),
        interpret=interpret,
    )(y8, r8, gb, scalars)


# ---------------------------------------------------------------------------
# Kernel 4: payload matmul + residual add + LayerNorm in ONE pass
# ---------------------------------------------------------------------------


def _mm_norm_val(x8, w_ref, vec_ref, smem_ref, r8, gb_ref, ln_smem_ref, *,
                 eps, res_quant, w4, norm, in_mode="i8"):
    """Value-level residual-feeding matmul + add + norm: ``x8``/``r8``
    are in-register tiles (``r8`` None = no residual); returns the int8
    norm-site payload tile. Shared by the standalone kernels and the
    whole-layer megakernels. ``in_mode='f'``: ``x8`` is a float value
    edge (flex context site) instead of an int8 payload."""
    y = _mm_body(x8, w_ref, vec_ref, smem_ref, w4=w4, in_mode=in_mode)
    # fold-site fake-quant (the producing matmul's .out site)
    r = jnp.clip(jnp.round(y * (1.0 / vec_ref[3, :])) - vec_ref[4, :],
                 -128.0, 127.0)
    y = vec_ref[3, :] * (r + vec_ref[4, :])
    if r8 is not None:
        r_s, r_sh = ln_smem_ref[0, 2], ln_smem_ref[0, 3]
        y = y + r_s * (r8.astype(jnp.float32) + r_sh)
    q, _, _ = _ln_body(y, gb_ref, _site_vals(ln_smem_ref, None), eps=eps,
                       res_quant=res_quant, norm=norm)
    return q.astype(jnp.int8)


def _mm_emit(x8, w_ref, vec_ref, smem_ref, *, w4, dots, activation=None):
    """Value-level matmul emitting the out-site payload: int8 (the
    payload protocol) or the SHIFTED bf16 levels the bf16-dots attention
    consumes directly (see :func:`_attn_row`; bit-exact because the
    per-column requant shift vec[4] IS the consuming site's shift)."""
    y = _mm_body(x8, w_ref, vec_ref, smem_ref, w4=w4, in_mode="i8")
    act = _ACTS[activation]
    if act is not None:
        y = act(y)
    if dots.startswith("bf16"):
        return jnp.clip(jnp.round(y * (1.0 / vec_ref[3, :])),
                        vec_ref[4, :] - 128.0,
                        vec_ref[4, :] + 127.0).astype(jnp.bfloat16)
    return jnp.clip(jnp.round(y * (1.0 / vec_ref[3, :])) - vec_ref[4, :],
                    -128.0, 127.0).astype(jnp.int8)


def _mm_norm_core(x_ref, w_ref, vec_ref, smem_ref, r_ref, gb_ref,
                  ln_smem_ref, out_ref, *, eps, res_quant, w4, norm,
                  in_mode="i8"):
    """Residual-feeding matmul with the whole add+norm epilogue fused.

    Matmul part == :func:`_mm_kernel` with ``out_mode='fold'`` (the fold
    site's fake-quant, bit-identical to emit-payload -> dequantize-in-LN
    of the separate two-kernel path), then optional residual add from the
    int8 residual payload (``r_ref`` None when the op has no residual,
    e.g. MobileBERT bottleneck-in), res-site fake-quant, LayerNorm or
    NoNorm, norm-site quantize — the intermediate y payload never touches
    HBM and the norm pass's read of it disappears (measured 4.17 ms/step
    across 24 separate add+LN launches at B=128, S=128).
    """
    out_ref[:] = _mm_norm_val(
        x_ref[:], w_ref, vec_ref, smem_ref,
        r_ref[:] if r_ref is not None else None, gb_ref, ln_smem_ref,
        eps=eps, res_quant=res_quant, w4=w4, norm=norm, in_mode=in_mode)


def _mm_add_ln_kernel(x_ref, w_ref, vec_ref, smem_ref, r_ref, gb_ref,
                      ln_smem_ref, out_ref, *, eps, res_quant, w4,
                      norm="layernorm", in_mode="i8"):
    _mm_norm_core(x_ref, w_ref, vec_ref, smem_ref, r_ref, gb_ref,
                  ln_smem_ref, out_ref, eps=eps, res_quant=res_quant,
                  w4=w4, norm=norm, in_mode=in_mode)


def _mm_norm_kernel(x_ref, w_ref, vec_ref, smem_ref, gb_ref, ln_smem_ref,
                    out_ref, *, eps, res_quant, w4, norm):
    _mm_norm_core(x_ref, w_ref, vec_ref, smem_ref, None, gb_ref,
                  ln_smem_ref, out_ref, eps=eps, res_quant=res_quant,
                  w4=w4, norm=norm)


@functools.partial(
    jax.jit,
    static_argnames=("eps", "res_quant", "block_m", "interpret", "w4",
                     "norm", "in_mode"))
def int8_matmul_add_ln(x8: Array, w8: Array, vecs: Array, scalars: Array,
                       r8: Array, gb: Array, ln_scalars: Array, *,
                       eps: float, res_quant: bool = True,
                       block_m: Optional[int] = None,
                       interpret: bool = False, w4: bool = False,
                       norm: str = "layernorm",
                       in_mode: str = "i8") -> Array:
    """Fused (payload matmul -> fold-site fake-quant -> +residual payload
    -> res-site fake-quant -> LayerNorm -> ln-site payload).

    ``x8``: (M, K) int8 payload. ``w8``: (N, K) int8 (or packed int4).
    ``vecs``/``scalars``: as :func:`int8_matmul` — rows 3/4 are the fold
    site. ``r8``: (M, N) int8 residual payload. ``gb``: (2, N)
    [gamma_q; beta]. ``ln_scalars``: (1, 8) as :func:`fused_add_ln`
    (rows 2/3 = residual payload params, 4/5 res site, 6/7 ln site).
    Bit-identical to int8_matmul(out_mode='emit') followed by
    :func:`fused_add_ln_payload`.
    """
    m, k = x8.shape
    n = w8.shape[0]
    in_b = 1 if in_mode == "i8" else x8.dtype.itemsize
    bm = _pick_block_m(m, in_b * k + 2 * n + 64, block_m)
    kernel = functools.partial(_mm_add_ln_kernel, eps=eps,
                               res_quant=res_quant, w4=w4, norm=norm,
                               in_mode=in_mode)
    return pl.pallas_call(
        kernel,
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w8.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k + 20 * m * n,
            bytes_accessed=m * k + n * k + 2 * m * n,
            transcendentals=m),
        compiler_params=None if interpret else _grid_params(),
        interpret=interpret,
    )(x8, w8, vecs, scalars, r8, gb, ln_scalars)


def int8_matmul_add_ln_ref(x8, w8, vecs, scalars, r8, gb, ln_scalars, *,
                           eps, res_quant=True, w4=False,
                           norm="layernorm", in_mode="i8"):
    """jnp oracle / XLA-composed backend for :func:`int8_matmul_add_ln`.
    ``r8`` None == no residual (the :func:`int8_matmul_norm` form)."""
    y = int8_matmul_ref(x8, w8, vecs, scalars, activation=None,
                        out_mode="fold", w4=w4, in_mode=in_mode)
    s = ln_scalars[0]
    if r8 is not None:
        y = y + s[2] * (r8.astype(jnp.float32) + s[3])
    q = _ln_ref_body(y, gb, s, eps=eps, res_quant=res_quant, norm=norm)
    return q.astype(jnp.int8)


@functools.partial(
    jax.jit,
    static_argnames=("eps", "res_quant", "block_m", "interpret", "w4",
                     "norm"))
def int8_matmul_norm(x8: Array, w8: Array, vecs: Array, scalars: Array,
                     gb: Array, ln_scalars: Array, *, eps: float,
                     res_quant: bool = False,
                     block_m: Optional[int] = None,
                     interpret: bool = False, w4: bool = False,
                     norm: str = "nonorm") -> Array:
    """No-residual variant of :func:`int8_matmul_add_ln` — payload matmul
    -> fold-site fake-quant -> LayerNorm/NoNorm -> norm-site payload
    (MobileBERT's bottleneck-in / bottleneck-attention branches)."""
    m, k = x8.shape
    n = w8.shape[0]
    bm = _pick_block_m(m, k + n + 64, block_m)
    kernel = functools.partial(_mm_norm_kernel, eps=eps,
                               res_quant=res_quant, w4=w4, norm=norm)
    return pl.pallas_call(
        kernel,
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w8.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((2, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k + 12 * m * n,
            bytes_accessed=m * k + n * k + m * n,
            transcendentals=m if norm == "layernorm" else 0),
        compiler_params=None if interpret else _grid_params(),
        interpret=interpret,
    )(x8, w8, vecs, scalars, gb, ln_scalars)


def int8_matmul_norm_ref(x8, w8, vecs, scalars, gb, ln_scalars, *, eps,
                         res_quant=False, w4=False, norm="nonorm"):
    """jnp oracle / XLA backend for :func:`int8_matmul_norm`."""
    return int8_matmul_add_ln_ref(x8, w8, vecs, scalars, None, gb,
                                  ln_scalars, eps=eps, res_quant=res_quant,
                                  w4=w4, norm=norm)


def _ln_body_ref(x, gb, sv, *, eps, res_quant, norm="layernorm",
                 res_bits=8, ln_bits=8):
    res_s, res_sh, ln_s, ln_sh = sv
    if res_quant:
        lo, hi = _clip_bounds(res_bits)
        x = fakequant_f32(x, res_s, res_sh, lo, hi)
    if norm == "nonorm":
        z = x * gb[0] + gb[1]
    else:
        # mirrors _ln_body's one-pass stats op-for-op (bit-equal in tests)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        ms = jnp.mean(x * x, axis=-1, keepdims=True)
        var = jnp.maximum(ms - mean * mean, 0.0)
        z = (x - mean) * jax.lax.rsqrt(var + eps) * gb[0] + gb[1]
    lo, hi = _clip_bounds(ln_bits)
    return jnp.clip(jnp.round(z / ln_s) - ln_sh, lo, hi)


def _ln_ref_body(x, gb, s, *, eps, res_quant, norm="layernorm"):
    return _ln_body_ref(x, gb, (s[4], s[5], s[6], s[7]), eps=eps,
                        res_quant=res_quant, norm=norm)


def fused_add_ln_ref(y, r, gb, scalars, *, eps, res_quant=True,
                     out_dtype=jnp.float32):
    """jnp oracle / XLA backend for :func:`fused_add_ln`."""
    s = scalars[0]
    x = y.astype(jnp.float32) + r.astype(jnp.float32)
    q = _ln_ref_body(x, gb, s, eps=eps, res_quant=res_quant)
    return q.astype(jnp.int8), (s[6] * (q + s[7])).astype(out_dtype)


def fused_add_ln_payload_ref(y8, r8, gb, scalars, *, eps, res_quant=True):
    """jnp oracle / XLA backend for :func:`fused_add_ln_payload`."""
    s = scalars[0]
    x = (s[0] * (y8.astype(jnp.float32) + s[1])
         + s[2] * (r8.astype(jnp.float32) + s[3]))
    q = _ln_ref_body(x, gb, s, eps=eps, res_quant=res_quant)
    return q.astype(jnp.int8)


# ---------------------------------------------------------------------------
# Kernel 5: whole FFN block in ONE pass
#   inter matmul (+act) -> inter.out requant -> dense matmul -> fold-site
#   fake-quant -> +residual payload -> res-site fake-quant -> LayerNorm ->
#   ln-site payload
# ---------------------------------------------------------------------------


def _ffn_kernel(x_ref, wi_ref, vi_ref, si_ref, wd_ref, vd_ref, sd_ref,
                r_ref, gb_ref, ln_smem_ref, *rest, activation, eps,
                res_quant, w4i, w4d, norm, in_mode="i8", res_mode="i8",
                h_bits=8, y_bits=8, lnv=False, ln_out="emit", ln_bits=8,
                inter_mode="i8", inter_bits=8):
    """One (BM, K) payload tile through the whole FFN block.

    The (BM, N1) inter payload lives only in VMEM registers: profiling
    showed XLA spills the full (M, N1) int8 inter tensor to HBM
    (s8[16384,3072] with no S(1) layout — a ~100 MB/layer round-trip at
    B=128, S=128), which this fusion deletes. Stage 1 reproduces
    :func:`_mm_kernel` with ``out_mode='emit'`` op-for-op; stage 2 is
    :func:`_mm_norm_core` — so the fused output is bit-identical to the
    separate pair.

    Flex statics for the accuracy-preserving recipes (README.md:159-173):
    ``in_mode='f'`` — the FFN input ('x' site) arrives as a bf16/f32
    value edge (16-bit or PEG grids can't ride int8 payloads);
    ``res_mode='f'`` likewise for the residual; ``h_bits`` — the dense
    fold ('h') site's grid; ``lnv`` — res/ln site params come per-column
    from a (4, N2) vector ref (PEG) appended after ``ln_smem_ref``.
    """
    lnv_ref = rest[0] if lnv else None
    out_ref = rest[-1]
    y = _mm_body(x_ref[:], wi_ref, vi_ref, si_ref, w4=w4i, in_mode=in_mode)
    act = _ACTS[activation]
    if act is not None:
        y = act(y)
    if inter_mode == "i8":
        i8 = jnp.clip(jnp.round(y * (1.0 / vi_ref[3, :])) - vi_ref[4, :],
                      -128.0, 127.0).astype(jnp.int8)
    else:
        # 16-bit inter.out site ('L': 16): the inter->dense edge carries
        # fake-quantized f32 VALUES (value = s*clip(round(y/s), sh±half))
        half_i = float(2 ** (inter_bits - 1))
        i8 = (vi_ref[3, :] * jnp.clip(
            jnp.round(y * (1.0 / vi_ref[3, :])),
            vi_ref[4, :] - half_i, vi_ref[4, :] + half_i - 1.0)
        ).astype(jnp.float32)

    y2 = _mm_body(i8, wd_ref, vd_ref, sd_ref, w4=w4d, in_mode=inter_mode)
    lo_h, hi_h = _clip_bounds(h_bits)
    r2 = jnp.clip(jnp.round(y2 * (1.0 / vd_ref[3, :])) - vd_ref[4, :],
                  lo_h, hi_h)
    y2 = vd_ref[3, :] * (r2 + vd_ref[4, :])
    if res_mode == "i8":
        r_s, r_sh = ln_smem_ref[0, 2], ln_smem_ref[0, 3]
        y2 = y2 + r_s * (r_ref[:].astype(jnp.float32) + r_sh)
    else:  # value edge: the residual IS the float site value
        y2 = y2 + r_ref[:].astype(jnp.float32)
    q, s_l, sh_l = _ln_body(y2, gb_ref, _site_vals(ln_smem_ref, lnv_ref),
                            eps=eps, res_quant=res_quant, norm=norm,
                            res_bits=y_bits, ln_bits=ln_bits)
    if ln_out == "emit":
        out_ref[:] = q.astype(jnp.int8)
    else:  # float value edge of the ffn.ln ('z') site ('L': 16)
        out_ref[:] = (s_l * (q + sh_l)).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("activation", "eps", "res_quant", "block_m",
                     "interpret", "w4i", "w4d", "norm", "in_mode",
                     "res_mode", "h_bits", "y_bits", "ln_out", "ln_bits",
                     "inter_mode", "inter_bits"))
def int8_ffn_ln(x8: Array, wi: Array, vi: Array, si: Array, wd: Array,
                vd: Array, sd: Array, r8: Array, gb: Array,
                ln_scalars: Array, lnv: Optional[Array] = None, *,
                activation, eps: float,
                res_quant: bool = True, block_m: Optional[int] = None,
                interpret: bool = False, w4i: bool = False,
                w4d: bool = False, norm: str = "layernorm",
                in_mode: str = "i8", res_mode: str = "i8",
                h_bits: int = 8, y_bits: int = 8, ln_out: str = "emit",
                ln_bits: int = 8, inter_mode: str = "i8",
                inter_bits: int = 8) -> Array:
    """Fused FFN block: (payload inter matmul + act -> inter.out payload
    -> dense matmul -> fold-site fake-quant -> +residual payload ->
    res-site fake-quant -> LayerNorm -> ln-site payload) in one kernel.

    ``x8``: (M, K1) int8 payload (the attn_out ln site), or its bf16/f32
    value edge when ``in_mode='f'`` (16-bit / PEG 'x' site). ``wi``:
    (N1, K1) int8 (or packed int4) inter weight, ``vi``/``si`` its
    epilogue vectors/scalars as :func:`int8_matmul`. ``wd``: (N2, N1)
    dense weight, ``vd``/``sd`` its vectors/scalars (``sd`` = the
    inter.out site params). ``r8``: (M, N2) residual payload (or value
    edge when ``res_mode='f'``). ``gb``/``ln_scalars`` as
    :func:`int8_matmul_add_ln`; ``lnv``: optional (4, N2) per-column
    [res_s; res_sh; ln_s; ln_sh] for PEG sites. ``h_bits``/``y_bits``:
    grids of the dense fold / residual sites (mixed recipe). In the
    default all-int8 configuration, bit-identical to
    int8_matmul(out_mode='emit', activation) followed by
    :func:`int8_matmul_add_ln`.
    """
    m, k1 = x8.shape
    n1 = vi.shape[1]
    n2 = wd.shape[0]
    in_b = 1 if in_mode == "i8" else x8.dtype.itemsize
    res_b = 1 if res_mode == "i8" else r8.dtype.itemsize
    # row bytes: x tile + f32 inter accumulator + i8 inter + residual+out
    bm = _pick_block_m(m, k1 * in_b + 5 * n1 + (1 + res_b) * n2 + 64,
                       block_m)
    kernel = functools.partial(_ffn_kernel, activation=activation, eps=eps,
                               res_quant=res_quant, w4i=w4i, w4d=w4d,
                               norm=norm, in_mode=in_mode,
                               res_mode=res_mode, h_bits=h_bits,
                               y_bits=y_bits, lnv=lnv is not None,
                               ln_out=ln_out, ln_bits=ln_bits,
                               inter_mode=inter_mode,
                               inter_bits=inter_bits)
    full = lambda shape, space=None: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0, 0),
        memory_space=space or pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((bm, k1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        full(wi.shape), full((5, n1)), full((1, 2), pltpu.SMEM),
        full(wd.shape), full((5, n2)), full((1, 2), pltpu.SMEM),
        pl.BlockSpec((bm, n2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        full((2, n2)), full((1, 8), pltpu.SMEM),
    ]
    args = [x8, wi, vi, si, wd, vd, sd, r8, gb, ln_scalars]
    if lnv is not None:
        in_specs.append(full((4, n2)))
        args.append(lnv)
    return pl.pallas_call(
        kernel,
        grid=(m // bm,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, n2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (m, n2), jnp.int8 if ln_out == "emit" else jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n1 * (k1 + n2) + 20 * m * (n1 + n2),
            bytes_accessed=m * k1 * in_b + n1 * k1 + n2 * n1
            + (1 + res_b) * m * n2,
            transcendentals=m * n1 + m),
        compiler_params=None if interpret else _grid_params(),
        interpret=interpret,
    )(*args)


def int8_ffn_ln_ref(x8, wi, vi, si, wd, vd, sd, r8, gb, ln_scalars,
                    lnv=None, *, activation, eps, res_quant=True,
                    w4i=False, w4d=False, norm="layernorm", in_mode="i8",
                    res_mode="i8", h_bits=8, y_bits=8, ln_out="emit",
                    ln_bits=8, inter_mode="i8", inter_bits=8):
    """jnp oracle / XLA-composed backend for :func:`int8_ffn_ln`."""
    i8 = int8_matmul_ref(
        x8, wi, vi, si, activation=activation, w4=w4i, in_mode=in_mode,
        out_mode="emit" if inter_mode == "i8" else "fold",
        out_bits=inter_bits)
    y = int8_matmul_ref(i8, wd, vd, sd, activation=None, out_mode="fold",
                        w4=w4d, out_bits=h_bits, in_mode=inter_mode)
    s = ln_scalars[0]
    if res_mode == "i8":
        y = y + s[2] * (r8.astype(jnp.float32) + s[3])
    else:
        y = y + r8.astype(jnp.float32)
    sv = ((lnv[0:1, :], lnv[1:2, :], lnv[2:3, :], lnv[3:4, :])
          if lnv is not None else (s[4], s[5], s[6], s[7]))
    q = _ln_body_ref(y, gb, sv, eps=eps, res_quant=res_quant, norm=norm,
                     res_bits=y_bits, ln_bits=ln_bits)
    if ln_out == "emit":
        return q.astype(jnp.int8)
    ln_s = sv[2] if lnv is not None else s[6]
    ln_sh = sv[3] if lnv is not None else s[7]
    return (ln_s * (q + ln_sh)).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Kernel 6: whole attention block in ONE pass
#   fused q|k|v matmul -> per-column site requant -> attention phases ->
#   attn_out matmul -> fold-site fake-quant -> +layer-input residual ->
#   res-site fake-quant -> LayerNorm -> ln-site payload
# ---------------------------------------------------------------------------


def _attn_mega_kernel(x_ref, wq_ref, vq_ref, sq_ref, mask_ref, asm_ref,
                      wo_ref, vo_ref, so_ref, gb_ref, ln_smem_ref, *rest,
                      n_batch, n_heads, seq, head_dim,
                      skip_max, group, w4q, w4o, eps, res_quant, norm,
                      ln_out="emit", ln_bits=8, lnv=False, dots="i8",
                      sc_bits=8, p_bits=8, c_bits=8, in_mode="i8",
                      qkv_bits=8, g_bits=8, u_bits=8):
    """One (n_batch*seq, H) cell through the whole attention block.

    Stage 1 == :func:`_mm_kernel` (out_mode='emit') for the fused q|k|v
    matmul, kept in-register — profiling showed the (M, 3H) qkv payload
    spills to HBM between the separate kernels (~75 MB/layer round-trip
    at B=128, S=128). Stage 2 == :func:`_attn_row` per batch row.
    Stage 3 == :func:`_mm_norm_core` for attn_out + add + LN, with the
    layer-input payload (``x_ref`` itself) as the residual. Bit-identical
    to the separate three-kernel chain.

    Flex statics (mixed / PEG recipes): ``ln_out='f'`` emits the ln site
    ('x') as a fake-quantized float value edge (``ln_bits`` grid) instead
    of an int8 payload; ``lnv`` reads per-column res/ln params from a
    (4, H) vector ref appended after ``ln_smem_ref``.
    """
    lnv_ref = rest[0] if lnv else None
    out_ref = rest[-2]
    scores_scr = rest[-1]
    in_s, in_shift = sq_ref[0, 0], sq_ref[0, 1]
    x8 = x_ref[:]
    if in_mode == "i8":
        acc = _int_dot(x8, wq_ref, w4q)
        y = (in_s * vq_ref[0, :]) * (acc + in_shift * vq_ref[1, :])
    else:
        # float layer-input edge (16-bit 'z' site of the PREVIOUS layer,
        # quant_dict 'L': 16): values carry their own scale — no input
        # params fold into the matmul (builder passes identity sq)
        acc = _f_dot(x8, wq_ref, w4q)
        y = vq_ref[0, :] * acc
    y = y + vq_ref[2, :]
    if dots == "f32":
        # 16-bit q/k/v sites: emit fake-quantized f32 VALUES on the
        # qkv_bits grid (value = s * clip(round(y/s), sh-half, sh+half-1)
        # — same identity as the bf16 shifted-level emission, with the
        # scale multiplied back in since the attention runs value-space
        # f32 dots with identity site scalars)
        half = float(2 ** (qkv_bits - 1))
        qkv8 = (vq_ref[3, :] * jnp.clip(
            jnp.round(y * (1.0 / vq_ref[3, :])),
            vq_ref[4, :] - half, vq_ref[4, :] + half - 1.0)
        ).astype(jnp.float32)
    elif dots == "bf16":
        # emit the SHIFTED bf16 levels directly: the per-column requant
        # shift vq[4] on the q/k/v thirds IS the per-site scalar shift
        # sv[1]/sv[3]/sv[5] (both come from the same act sites), and
        # clip(round(x) - sh, -128, 127) + sh ==
        # clip(round(x), sh - 128, sh + 127) — so this skips the int8
        # payload round trip (subtract, cast, re-add) bit-exactly
        qkv8 = jnp.clip(jnp.round(y * (1.0 / vq_ref[3, :])),
                        vq_ref[4, :] - 128.0,
                        vq_ref[4, :] + 127.0).astype(jnp.bfloat16)
    else:
        qkv8 = jnp.clip(jnp.round(y * (1.0 / vq_ref[3, :])) - vq_ref[4, :],
                        -128.0, 127.0).astype(jnp.int8)

    sv = tuple(asm_ref[0, i] for i in range(12))
    base = pl.program_id(0) * n_batch
    h = n_heads * head_dim
    c8_rows = []
    for j in range(n_batch):
        rows = slice(j * seq, (j + 1) * seq)
        mask_j = mask_ref[pl.ds(base + j, 1), :]
        c8_rows.append(_attn_row(
            qkv8[rows, 0:h], qkv8[rows, h:2 * h], qkv8[rows, 2 * h:3 * h],
            mask_j, sv, scores_scr, n_heads=n_heads, seq=seq,
            head_dim=head_dim, skip_max=skip_max, group=group, dots=dots,
            sc_bits=sc_bits, p_bits=p_bits, c_bits=c_bits))
    c8 = jnp.concatenate(c8_rows, axis=0)

    if 1 <= c_bits <= 8:
        o_s, o_sh = so_ref[0, 0], so_ref[0, 1]
        acc2 = _int_dot(c8, wo_ref, w4o)
        y2 = (o_s * vo_ref[0, :]) * (acc2 + o_sh * vo_ref[1, :])
    else:
        # flex context edge: c8 carries float VALUES ('c': 'fp32' / 16)
        acc2 = _f_dot(c8, wo_ref, w4o)
        y2 = vo_ref[0, :] * acc2
    y2 = y2 + vo_ref[2, :]
    lo_g, hi_g = _clip_bounds(g_bits)
    r2 = jnp.clip(jnp.round(y2 * (1.0 / vo_ref[3, :])) - vo_ref[4, :],
                  lo_g, hi_g)
    y2 = vo_ref[3, :] * (r2 + vo_ref[4, :])
    if in_mode == "i8":
        r_s, r_sh = ln_smem_ref[0, 2], ln_smem_ref[0, 3]
        y2 = y2 + r_s * (x8.astype(jnp.float32) + r_sh)
    else:  # float layer-input edge: the residual IS the value
        y2 = y2 + x8.astype(jnp.float32)
    q, s_l, sh_l = _ln_body(y2, gb_ref, _site_vals(ln_smem_ref, lnv_ref),
                            eps=eps, res_quant=res_quant, norm=norm,
                            res_bits=u_bits, ln_bits=ln_bits)
    if ln_out == "emit":
        out_ref[:] = q.astype(jnp.int8)
    else:  # float value edge of the ln ('x') site
        out_ref[:] = (s_l * (q + sh_l)).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("n_heads", "seq", "eps", "res_quant", "batch_block",
                     "skip_max", "group", "interpret", "w4q", "w4o",
                     "norm", "ln_out", "ln_bits", "out_dtype", "dots",
                     "attn_bits", "in_mode", "qkv_mode", "qkv_bits",
                     "g_bits", "u_bits"))
def int8_attn_ln(x8: Array, wq: Array, vq: Array, sq: Array,
                 mask_bias: Array, attn_scal: Array, wo: Array, vo: Array,
                 so: Array, gb: Array, ln_scalars: Array,
                 lnv: Optional[Array] = None, *, n_heads: int,
                 seq: int, eps: float, res_quant: bool = True,
                 batch_block: Optional[int] = None, skip_max: bool = False,
                 group: Optional[int] = None, interpret: bool = False,
                 w4q: bool = False, w4o: bool = False,
                 norm: str = "layernorm", ln_out: str = "emit",
                 ln_bits: int = 8, out_dtype=jnp.bfloat16,
                 dots: str = "auto",
                 attn_bits: Tuple[int, int] = (8, 8),
                 in_mode: str = "i8", qkv_mode: str = "i8",
                 qkv_bits: int = 8, g_bits: int = 8,
                 u_bits: int = 8) -> Array:
    """Fused attention block: (payload q|k|v matmul -> site payloads ->
    attention -> attn_out matmul -> fold-site fake-quant -> +layer-input
    residual -> res-site fake-quant -> LayerNorm -> ln-site payload).

    ``x8``: (B*T, H) int8 payload of the layer-input ln site (also the
    residual). ``wq``/``vq``/``sq``: the fused q|k|v matmul plan as
    :func:`int8_matmul` ((3H, H) weight, (5, 3H) vecs). ``mask_bias``:
    (B, T) f32. ``attn_scal``: (1, 12) attention site params.
    ``wo``/``vo``/``so``: attn_out matmul plan ((H, H) weight; ``so`` =
    context-site scalars). ``gb``/``ln_scalars`` as
    :func:`int8_matmul_add_ln`; ``lnv``: optional (4, H) per-column
    res/ln params (PEG). ``ln_out='f'`` emits the ln ('x') site as a
    fake-quantized ``out_dtype`` value edge on a ``ln_bits`` grid. In the
    default all-int8 configuration, bit-identical to int8_matmul(emit) ->
    int8_attention -> int8_matmul_add_ln.
    """
    mt, hdim = x8.shape
    b = mt // seq
    d = hdim // n_heads
    n3 = vq.shape[1]
    if batch_block is None:
        bb = 1
        while b % (bb * 2) == 0 and (bb * 2) * seq <= 512:
            bb *= 2
    else:
        bb = batch_block
        while b % bb:
            bb = max(1, bb // 2)
    if qkv_mode == "f":
        # q/k/v sites left the payload protocol (16-bit / PEG): the
        # attention runs value-space f32 dots (identity site scalars)
        dots = "f32"
    else:
        dots = _resolve_dots(dots, seq, d)
    ab3 = _attn3(attn_bits)
    if group is None:
        if dots in ("bf16", "f32"):
            group = 1
        else:
            group = 1
            while d * group < 128 and n_heads % (group * 2) == 0:
                group *= 2
    kernel = functools.partial(
        _attn_mega_kernel, n_batch=bb, n_heads=n_heads, seq=seq,
        head_dim=d, skip_max=skip_max, group=group, w4q=w4q, w4o=w4o,
        eps=eps, res_quant=res_quant, norm=norm, ln_out=ln_out,
        ln_bits=ln_bits, lnv=lnv is not None, dots=dots,
        sc_bits=ab3[0], p_bits=ab3[1], c_bits=ab3[2], in_mode=in_mode,
        qkv_bits=qkv_bits, g_bits=g_bits, u_bits=u_bits)
    blk = lambda r, c: pl.BlockSpec(  # noqa: E731
        (r, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    smem = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0, 0), memory_space=pltpu.SMEM)
    in_specs = [
        blk(bb * seq, hdim),            # x8
        full(wq.shape), full((5, n3)), smem((1, 2)),
        full((b, seq)),                 # mask
        smem((1, 12)),                  # attention sites
        full(wo.shape), full((5, hdim)), smem((1, 2)),
        full((2, hdim)), smem((1, 8)),
    ]
    args = [x8, wq, vq, sq, mask_bias, attn_scal, wo, vo, so, gb,
            ln_scalars]
    if lnv is not None:
        in_specs.append(full((4, hdim)))
        args.append(lnv)
    out_t = jnp.int8 if ln_out == "emit" else out_dtype
    return pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=in_specs,
        out_specs=blk(bb * seq, hdim),
        out_shape=jax.ShapeDtypeStruct((mt, hdim), out_t),
        scratch_shapes=[pltpu.VMEM((n_heads * seq, seq), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * mt * hdim * (n3 + hdim)
            + 4 * b * n_heads * seq * seq * d + 30 * mt * hdim,
            bytes_accessed=2 * mt * hdim + n3 * hdim + hdim * hdim
            + b * seq * 4,
            transcendentals=b * n_heads * seq * seq + mt),
        compiler_params=None if interpret else _grid_params(),
        interpret=interpret,
    )(*args)


def _layer_kernel(x_ref, wq_ref, vq_ref, sq_ref, mask_ref, asm_ref,
                  wo_ref, vo_ref, so_ref, gb1_ref, ln1_ref,
                  wi_ref, vi_ref, si_ref, wd_ref, vd_ref, sd_ref,
                  gb2_ref, ln2_ref, out_ref, scores_scr, *,
                  n_batch, n_heads, seq, head_dim, skip_max, group,
                  w4q, w4o, w4i, w4d, eps, res1, res2, norm, activation,
                  dots, sc_bits=8, p_bits=8, c_bits=8):
    """One (n_batch*seq, H) cell through a WHOLE encoder layer.

    Stage A == :func:`_attn_mega_kernel` (all-int8 form) producing the
    attention block's ln payload in-register; stage B == :func:`_ffn_kernel`
    with BOTH its input and its residual being that payload (the engine
    loop always feeds the FFN block its own input as the residual). One
    launch per layer instead of two: each Mosaic launch costs ~75 us of
    sequencer gap at B=128/S=128 (profiler per-op sum 15.6 ms vs 17.4 ms
    wall over 24 launches), and the (M, H) inter-block payload round-trip
    through HBM disappears too. Bit-identical to int8_attn_ln ->
    int8_ffn_ln.
    """
    # ---- stage A: attention block ----
    x8 = x_ref[:]
    qkv8 = _mm_emit(x8, wq_ref, vq_ref, sq_ref, w4=w4q, dots=dots)
    sv = tuple(asm_ref[0, i] for i in range(12))
    base = pl.program_id(0) * n_batch
    h = n_heads * head_dim
    c8_rows = []
    for j in range(n_batch):
        rows = slice(j * seq, (j + 1) * seq)
        mask_j = mask_ref[pl.ds(base + j, 1), :]
        c8_rows.append(_attn_row(
            qkv8[rows, 0:h], qkv8[rows, h:2 * h], qkv8[rows, 2 * h:3 * h],
            mask_j, sv, scores_scr, n_heads=n_heads, seq=seq,
            head_dim=head_dim, skip_max=skip_max, group=group, dots=dots,
            sc_bits=sc_bits, p_bits=p_bits, c_bits=c_bits))
    c8 = jnp.concatenate(c8_rows, axis=0)
    hx8 = _mm_norm_val(c8, wo_ref, vo_ref, so_ref, x8, gb1_ref, ln1_ref,
                       eps=eps, res_quant=res1, w4=w4o, norm=norm,
                       in_mode="i8" if 1 <= c_bits <= 8 else "f")

    # ---- stage B: FFN block (input == residual == hx8) ----
    i8 = _mm_emit(hx8, wi_ref, vi_ref, si_ref, w4=w4i, dots="i8",
                  activation=activation)
    out_ref[:] = _mm_norm_val(i8, wd_ref, vd_ref, sd_ref, hx8, gb2_ref,
                              ln2_ref, eps=eps, res_quant=res2, w4=w4d,
                              norm=norm)


@functools.partial(
    jax.jit,
    static_argnames=("n_heads", "seq", "eps", "activation", "res1", "res2",
                     "batch_block", "skip_max", "group", "interpret",
                     "w4q", "w4o", "w4i", "w4d", "norm", "dots",
                     "attn_bits"))
def int8_layer_ln(x8: Array, wq: Array, vq: Array, sq: Array,
                  mask_bias: Array, attn_scal: Array, wo: Array, vo: Array,
                  so: Array, gb1: Array, ln1_scal: Array,
                  wi: Array, vi: Array, si: Array, wd: Array, vd: Array,
                  sd: Array, gb2: Array, ln2_scal: Array, *, n_heads: int,
                  seq: int, eps: float, activation: str,
                  res1: bool = True, res2: bool = True,
                  batch_block: Optional[int] = None, skip_max: bool = False,
                  group: Optional[int] = None, interpret: bool = False,
                  w4q: bool = False, w4o: bool = False, w4i: bool = False,
                  w4d: bool = False, norm: str = "layernorm",
                  dots: str = "auto",
                  attn_bits: Tuple[int, int] = (8, 8)) -> Array:
    """A WHOLE encoder layer in one kernel launch.

    Argument layout = :func:`int8_attn_ln`'s (through ``ln1_scal``)
    followed by :func:`int8_ffn_ln`'s matmul plans (``wi``..``ln2_scal``;
    no residual arg — the FFN block's residual is its own input). All-int8
    layers only (flex/PEG layers keep the two-kernel route). Bit-identical
    to int8_attn_ln -> int8_ffn_ln.
    """
    mt, hdim = x8.shape
    b = mt // seq
    d = hdim // n_heads
    n3 = vq.shape[1]
    n1 = vi.shape[1]
    if batch_block is None:
        bb = 1
        while b % (bb * 2) == 0 and (bb * 2) * seq <= 512:
            bb *= 2
    else:
        bb = batch_block
        while b % bb:
            bb = max(1, bb // 2)
    dots = _resolve_dots(dots, seq, d)
    if group is None:
        if dots == "bf16":
            group = 1
        else:
            group = 1
            while d * group < 128 and n_heads % (group * 2) == 0:
                group *= 2
    ab3 = _attn3(attn_bits)
    kernel = functools.partial(
        _layer_kernel, n_batch=bb, n_heads=n_heads, seq=seq, head_dim=d,
        skip_max=skip_max, group=group, w4q=w4q, w4o=w4o, w4i=w4i,
        w4d=w4d, eps=eps, res1=res1, res2=res2, norm=norm,
        activation=activation, dots=dots, sc_bits=ab3[0],
        p_bits=ab3[1], c_bits=ab3[2])
    blk = lambda r, c: pl.BlockSpec(  # noqa: E731
        (r, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    smem = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0, 0), memory_space=pltpu.SMEM)
    in_specs = [
        blk(bb * seq, hdim),                           # x8
        full(wq.shape), full((5, n3)), smem((1, 2)),   # qkv matmul
        full((b, seq)),                                # mask
        smem((1, 12)),                                 # attention sites
        full(wo.shape), full((5, hdim)), smem((1, 2)),  # attn_out matmul
        full((2, hdim)), smem((1, 8)),                 # ln1
        full(wi.shape), full((5, n1)), smem((1, 2)),   # inter matmul
        full(wd.shape), full((5, hdim)), smem((1, 2)),  # dense matmul
        full((2, hdim)), smem((1, 8)),                 # ln2
    ]
    args = [x8, wq, vq, sq, mask_bias, attn_scal, wo, vo, so, gb1,
            ln1_scal, wi, vi, si, wd, vd, sd, gb2, ln2_scal]
    return pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=in_specs,
        out_specs=blk(bb * seq, hdim),
        out_shape=jax.ShapeDtypeStruct((mt, hdim), jnp.int8),
        scratch_shapes=[pltpu.VMEM((n_heads * seq, seq), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * mt * hdim * (n3 + hdim) + 2 * mt * n1 * 2 * hdim
            + 4 * b * n_heads * seq * seq * d + 50 * mt * hdim,
            bytes_accessed=2 * mt * hdim + n3 * hdim + hdim * hdim
            + 2 * n1 * hdim + b * seq * 4,
            transcendentals=b * n_heads * seq * seq + mt * n1 + 2 * mt),
        compiler_params=None if interpret else _grid_params(),
        interpret=interpret,
    )(*args)


def int8_layer_ln_ref(x8, wq, vq, sq, mask_bias, attn_scal, wo, vo, so,
                      gb1, ln1_scal, wi, vi, si, wd, vd, sd, gb2,
                      ln2_scal, *, n_heads, seq, eps, activation,
                      res1=True, res2=True, skip_max=False, w4q=False,
                      w4o=False, w4i=False, w4d=False, norm="layernorm",
                      attn_bits=(8, 8)):
    """jnp oracle / XLA-composed backend for :func:`int8_layer_ln`."""
    hx8 = int8_attn_ln_ref(x8, wq, vq, sq, mask_bias, attn_scal, wo, vo,
                           so, gb1, ln1_scal, n_heads=n_heads, seq=seq,
                           eps=eps, res_quant=res1, skip_max=skip_max,
                           w4q=w4q, w4o=w4o, norm=norm,
                           attn_bits=attn_bits)
    return int8_ffn_ln_ref(hx8, wi, vi, si, wd, vd, sd, hx8, gb2,
                           ln2_scal, activation=activation, eps=eps,
                           res_quant=res2, w4i=w4i, w4d=w4d, norm=norm)


def int8_attn_ln_ref(x8, wq, vq, sq, mask_bias, attn_scal, wo, vo, so,
                     gb, ln_scalars, lnv=None, *, n_heads, seq, eps,
                     res_quant=True, skip_max=False, w4q=False, w4o=False,
                     norm="layernorm", ln_out="emit", ln_bits=8,
                     out_dtype=jnp.bfloat16, attn_bits=(8, 8),
                     in_mode="i8", qkv_mode="i8", qkv_bits=8, g_bits=8,
                     u_bits=8):
    """jnp oracle / XLA-composed backend for :func:`int8_attn_ln`."""
    if qkv_mode == "i8":
        qkv8 = int8_matmul_ref(x8, wq, vq, sq, activation=None,
                               out_mode="emit", w4=w4q, in_mode=in_mode)
        c8 = int8_attention_ref(qkv8, mask_bias, attn_scal,
                                n_heads=n_heads, seq=seq,
                                skip_max=skip_max, attn_bits=attn_bits)
    else:
        # 16-bit q/k/v: fake-quantized f32 values, value-space attention
        qkvf = int8_matmul_ref(x8, wq, vq, sq, activation=None,
                               out_mode="fold", w4=w4q, in_mode=in_mode,
                               out_bits=qkv_bits, out_dtype=jnp.float32)
        c8 = int8_attention_ref(qkvf, mask_bias, attn_scal,
                                n_heads=n_heads, seq=seq,
                                skip_max=skip_max, attn_bits=attn_bits,
                                dots="f32")
    c_bits = _attn3(attn_bits)[2]
    y = int8_matmul_ref(c8, wo, vo, so, activation=None, out_mode="fold",
                        w4=w4o, out_bits=g_bits,
                        in_mode="i8" if 1 <= c_bits <= 8 else "f")
    s = ln_scalars[0]
    if in_mode == "i8":
        y = y + s[2] * (x8.astype(jnp.float32) + s[3])
    else:  # float layer-input edge: the residual IS the value
        y = y + x8.astype(jnp.float32)
    sv = ((lnv[0:1, :], lnv[1:2, :], lnv[2:3, :], lnv[3:4, :])
          if lnv is not None else (s[4], s[5], s[6], s[7]))
    q = _ln_body_ref(y, gb, sv, eps=eps, res_quant=res_quant, norm=norm,
                     res_bits=u_bits, ln_bits=ln_bits)
    if ln_out == "emit":
        return q.astype(jnp.int8)
    ln_s = sv[2] if lnv is not None else s[6]
    ln_sh = sv[3] if lnv is not None else s[7]
    return (ln_s * (q + ln_sh)).astype(out_dtype)


# ---------------------------------------------------------------------------
# Kernel 8: whole MobileBERT inverted-bottleneck layer in ONE pass
# ---------------------------------------------------------------------------


def _mb_layer_kernel(x_ref, mask_ref, asm_ref, *refs, n_batch, n_heads,
                     seq, head_dim, hidden, attn_case, activation, res,
                     w4, skip_max, group, dots, n_ffn, sc_bits=8,
                     p_bits=8, c_bits=8):
    """One (n_batch*seq, H) cell through a WHOLE MobileBERT layer.

    MobileBERT's per-layer op chain is ~10 separate kernels (bottleneck
    in, optional shared-kq bottleneck, fused q|k matmul, v matmul,
    attention, attn_out+NoNorm, 3 stacked FFNs, output FFN,
    bottleneck-out+NoNorm); each hop round-trips an (M, 128/512) payload
    through HBM. At the family's small shapes those hops cost as much as
    the matmuls — this kernel keeps every intermediate in VMEM
    registers. Bit-identical to the separate chain (same
    _mm_emit/_mm_norm_val/_attn_row bodies, same order).

    ``refs`` = flat (w, vecs, scal) triples per matmul and (gb, scal)
    pairs per NoNorm, in plan order (see int8_mb_layer_ln), then
    out_ref, scores scratch. ``res`` = (res_ao, res_ffn tuple, res_out,
    res_obn); ``w4`` = per-matmul flags in plan order.
    """
    out_ref = refs[-2]
    scores_scr = refs[-1]
    it = iter(refs[:-2])
    mm3 = lambda: (next(it), next(it), next(it))  # noqa: E731
    nrm2 = lambda: (next(it), next(it))  # noqa: E731
    w4s = list(w4)
    w4n = lambda: w4s.pop(0)  # noqa: E731
    res_ao, res_ffn, res_out, res_obn = res

    def mm_norm(x8, r8, res_q, in_mode="i8"):
        w_r, v_r, s_r = mm3()
        gb_r, ln_r = nrm2()
        return _mm_norm_val(x8, w_r, v_r, s_r, r8, gb_r, ln_r, eps=0.0,
                            res_quant=res_q, w4=w4n(), norm="nonorm",
                            in_mode=in_mode)

    h8 = x_ref[:]
    # bottleneck in (no residual)
    li8 = mm_norm(h8, None, False)
    if attn_case == "bottleneck":
        qk_in, v_in = li8, li8
    elif attn_case == "shared_kq":
        sh8 = mm_norm(h8, None, False)
        qk_in, v_in = sh8, h8
    else:
        qk_in, v_in = h8, h8

    wqk, vqk, sqk = mm3()
    wv, vv, sv_ = mm3()
    qk8 = _mm_emit(qk_in, wqk, vqk, sqk, w4=w4n(), dots=dots)
    v8 = _mm_emit(v_in, wv, vv, sv_, w4=w4n(), dots=dots)

    sv = tuple(asm_ref[0, i] for i in range(12))
    base = pl.program_id(0) * n_batch
    c8_rows = []
    for j in range(n_batch):
        rows = slice(j * seq, (j + 1) * seq)
        mask_j = mask_ref[pl.ds(base + j, 1), :]
        c8_rows.append(_attn_row(
            qk8[rows, 0:hidden], qk8[rows, hidden:2 * hidden],
            v8[rows, :], mask_j, sv, scores_scr, n_heads=n_heads,
            seq=seq, head_dim=head_dim, skip_max=skip_max, group=group,
            dots=dots, sc_bits=sc_bits, p_bits=p_bits, c_bits=c_bits))
    c8 = jnp.concatenate(c8_rows, axis=0)

    x8 = mm_norm(c8, li8, res_ao,            # attn_out + NoNorm
                 in_mode="i8" if 1 <= c_bits <= 8 else "f")
    for j in range(n_ffn):                   # stacked FFNs
        wi_r, vi_r, si_r = mm3()
        i8 = _mm_emit(x8, wi_r, vi_r, si_r, w4=w4n(), dots="i8",
                      activation=activation)
        x8 = mm_norm(i8, x8, res_ffn[j])
    wi_r, vi_r, si_r = mm3()                 # output FFN inter
    i8 = _mm_emit(x8, wi_r, vi_r, si_r, w4=w4n(), dots="i8",
                  activation=activation)
    y8 = mm_norm(i8, x8, res_out)            # out.dense + NoNorm
    out_ref[:] = mm_norm(y8, h8, res_obn)    # bottleneck out + NoNorm


@functools.partial(
    jax.jit,
    static_argnames=("n_heads", "seq", "hidden", "attn_case", "activation",
                     "res", "w4", "skip_max", "batch_block", "group",
                     "interpret", "n_ffn", "dots", "attn_bits"))
def int8_mb_layer_ln(h8: Array, mask_bias: Array, attn_scal: Array,
                     flat: Tuple[Array, ...], *, n_heads: int, seq: int,
                     hidden: int, attn_case: str, activation: str,
                     res: Tuple, w4: Tuple, n_ffn: int,
                     skip_max: bool = False,
                     batch_block: Optional[int] = None,
                     group: Optional[int] = None,
                     interpret: bool = False,
                     dots: str = "auto",
                     attn_bits: Tuple[int, int] = (8, 8)) -> Array:
    """A WHOLE MobileBERT layer in one kernel launch.

    ``h8``: (B*T, H) int8 payload of the layer input. ``flat``: the
    layer plan flattened in order — (w, vecs, scal) per matmul
    [bn_in, (bn_attn if shared_kq), qk, v, attn_out, (inter, dense) per
    stacked FFN, inter, out, out_bn] with each residual-feeding matmul
    immediately followed by its NoNorm's (gb, scal). See
    :func:`mb_layer_flat` for the canonical flattening.
    """
    mt, hdim = h8.shape
    b = mt // seq
    d = hidden // n_heads
    if batch_block is None:
        bb = 1
        while b % (bb * 2) == 0 and (bb * 2) * seq <= 512:
            bb *= 2
    else:
        bb = batch_block
        while b % bb:
            bb = max(1, bb // 2)
    dots = _resolve_dots(dots, seq, d)
    ab3 = _attn3(attn_bits)
    if group is None:
        if dots == "bf16":
            group = 1
        else:
            group = 1
            while d * group < 128 and n_heads % (group * 2) == 0:
                group *= 2
    kernel = functools.partial(
        _mb_layer_kernel, n_batch=bb, n_heads=n_heads, seq=seq,
        head_dim=d, hidden=hidden, attn_case=attn_case,
        activation=activation, res=res, w4=w4, skip_max=skip_max,
        group=group, dots=dots, n_ffn=n_ffn, sc_bits=ab3[0],
        p_bits=ab3[1], c_bits=ab3[2])
    blk = lambda r, c: pl.BlockSpec(  # noqa: E731
        (r, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    smem = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0, 0), memory_space=pltpu.SMEM)
    in_specs = [blk(bb * seq, hdim), full((b, seq)), smem((1, 12))]
    for a in flat:
        if a.ndim == 2 and a.shape[0] == 1:    # (1, k) scalars -> SMEM
            in_specs.append(smem(a.shape))
        else:
            in_specs.append(full(a.shape))
    flops = 0
    for a in flat:
        if a.ndim == 2 and a.shape[0] not in (1, 2, 5):
            flops += 2 * mt * a.shape[0] * a.shape[1]
    return pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=in_specs,
        out_specs=blk(bb * seq, hdim),
        out_shape=jax.ShapeDtypeStruct((mt, hdim), jnp.int8),
        scratch_shapes=[pltpu.VMEM((n_heads * seq, seq), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops + 4 * b * n_heads * seq * seq * d
            + 40 * mt * hdim,
            bytes_accessed=2 * mt * hdim + b * seq * 4
            + sum(a.size for a in flat),
            transcendentals=b * n_heads * seq * seq + 6 * mt),
        compiler_params=None if interpret else _grid_params(),
        interpret=interpret,
    )(h8, mask_bias, attn_scal, *flat)


def mb_layer_flat(lp: dict, attn_case: str) -> Tuple[Array, ...]:
    """Flatten one MobileBERT layer plan (as built by
    build_mobilebert_engine) into the canonical ref order of
    :func:`_mb_layer_kernel`."""
    mm = lambda p: (p["w"], p["vecs"], p["scal"])  # noqa: E731
    nrm = lambda p: (p["gb"], p["scal"])  # noqa: E731
    out = [*mm(lp["bn_in"]), *nrm(lp["bn_in_norm"])]
    if attn_case == "shared_kq":
        out += [*mm(lp["bn_attn"]), *nrm(lp["bn_attn_norm"])]
    out += [*mm(lp["qk"]), *mm(lp["v"])]
    out += [*mm(lp["attn_out"]), *nrm(lp["attn_out_norm"])]
    for f in lp["ffns"]:
        out += [*mm(f["inter"]), *mm(f["dense"]), *nrm(f["norm"])]
    out += [*mm(lp["inter"]), *mm(lp["out"]), *nrm(lp["out_norm"])]
    out += [*mm(lp["out_bn"]), *nrm(lp["out_bn_norm"])]
    return tuple(out)
