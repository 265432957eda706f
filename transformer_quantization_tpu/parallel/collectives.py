"""Quantized collectives for tensor-parallel activation movement.

The reference has no distributed communication at all (SURVEY.md §2.6);
this module implements the TPU-native option the survey calls out
(§5 'Distributed communication backend' row, cf. EQuARX): compressing
activation collectives to int8 so TP's all-gathers ride ICI at 1/4 the
bytes of f32 (1/2 of bf16). Each shard quantizes with its own local
absmax scale; scales travel alongside the payload, so accuracy degrades
gracefully (per-shard, per-row granularity) instead of clipping.

Usable inside ``shard_map``-ped compute; plain helpers otherwise.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _row_absmax_scale(x: Array, eps: float = 1e-8) -> Array:
    """Per-row (last-dim-reduced) symmetric int8 scale."""
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    return jnp.maximum(absmax, eps) / 127.0


def quantize_shard(x: Array) -> Tuple[Array, Array]:
    """Symmetric per-row int8 quantization of one local shard."""
    scale = _row_absmax_scale(x.astype(jnp.float32))
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                 -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def dequantize_shard(q: Array, scale: Array, dtype=jnp.float32) -> Array:
    return (q.astype(jnp.float32) * scale).astype(dtype)


def all_gather_int8(x: Array, axis_name: str, *, axis: int = -1,
                    tiled: bool = True) -> Array:
    """All-gather with int8 on-the-wire compression.

    Equivalent to ``jax.lax.all_gather(x, axis_name, tiled=True)`` along
    ``axis`` but moves 1/4 (f32) or 1/2 (bf16) of the bytes over ICI.
    Quantization error is bounded by per-row absmax/127 per shard.
    """
    q, scale = quantize_shard(x)
    qg = jax.lax.all_gather(q, axis_name)       # (n, *local_shape)
    sg = jax.lax.all_gather(scale, axis_name)
    full = dequantize_shard(qg, sg)             # dequant per shard
    if not tiled:
        return full.astype(x.dtype)
    ax = axis if axis >= 0 else x.ndim + axis
    full = jnp.moveaxis(full, 0, ax)            # (..., n, local, ...)
    shape = list(x.shape)
    shape[ax] = shape[ax] * full.shape[ax]
    return full.reshape(shape).astype(x.dtype)


def psum_scatter_int8(x: Array, axis_name: str, *,
                      scatter_dimension: int = 0) -> Array:
    """Reduce-scatter with int8 wire format.

    Sums are performed in f32 after dequantization (int8 partials would
    overflow); the compression applies to the permuted payloads. This is
    the conservative formulation: one quantize per hop.
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    q, s = quantize_shard(x)
    qg = jax.lax.all_gather(q, axis_name)           # (n, ...) int8
    sg = jax.lax.all_gather(s, axis_name)
    total = jnp.sum(dequantize_shard(qg, sg), axis=0)  # f32 reduction
    chunk = total.shape[scatter_dimension] // n
    mine = jax.lax.dynamic_slice_in_dim(total, idx * chunk, chunk,
                                        axis=scatter_dimension)
    return mine.astype(x.dtype)


def tp_row_parallel_matmul_int8_gather(x_sharded: Array, w_shard: Array,
                                       axis_name: str,
                                       bias: Optional[Array] = None) -> Array:
    """Row-parallel linear closing with an int8-compressed psum.

    ``x_sharded`` (..., K/tp) x ``w_shard`` (N, K/tp): each device computes
    its partial product, quantizes it to int8, and the partials are summed
    via all-gather + local reduction in f32.
    """
    partial = jnp.einsum("...i,oi->...o", x_sharded, w_shard)
    q, s = quantize_shard(partial)
    qg = jax.lax.all_gather(q, axis_name)
    sg = jax.lax.all_gather(s, axis_name)
    y = jnp.sum(dequantize_shard(qg, sg), axis=0).astype(partial.dtype)
    if bias is not None:
        y = y + bias
    return y
