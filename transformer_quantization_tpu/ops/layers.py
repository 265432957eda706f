"""Quantized layer primitives.

Functional analogues of the reference's hijacked op library
(reference: quantization/autoquant_utils.py:16-95 — ``QuantLinear``,
``QuantLayerNorm``, ``QuantEmbedding``; quantization/hijacker.py:66-116 —
the weight-quant → op → fused-activation → act-quant pipeline).

Each primitive takes a :class:`~.quant.manager.QuantCtx` and a site name;
the weight quantizer lives at ``<name>.w`` and the output activation
quantizer at ``<name>.out``. Biases are never quantized, matching the
reference (hijacker.py:75-86 quantizes only ``weight``).

For AdaRound, primitives support I/O capture: when ``name`` is in
``ctx.capture_sites`` the (input, pre-act-quant output) pair is recorded —
the functional replacement for the reference's forward hooks
(quantization/adaround/utils.py:175-233).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

Array = jax.Array

# Fusable activation functions (reference: hijacker.py:15 activations_list)
ACTIVATIONS = {
    None: None,
    "relu": jax.nn.relu,
    "relu6": lambda x: jnp.clip(x, 0.0, 6.0),
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
}


def _resolve_act(activation) -> Optional[Callable]:
    if activation is None or callable(activation):
        return activation
    return ACTIVATIONS[activation]


def _maybe_capture(ctx, name: str, x: Array, y: Array) -> None:
    sites = getattr(ctx, "capture_sites", None)
    if sites and name in sites:
        ctx.captures = getattr(ctx, "captures", {})
        ctx.captures[name] = (x, y)


def quant_linear(ctx, name: str, x: Array, w: Array, b: Optional[Array],
                 activation=None) -> Array:
    """Quantized affine layer with optional fused activation.

    Pipeline (hijacker.py:66-116): quantize weight -> x @ W^T + b ->
    activation fn -> quantize output activations. ``w`` is stored
    ``(out, in)`` (the torch convention) so per-channel weight quantization
    reduces over dim 0 exactly like the reference.
    """
    act = _resolve_act(activation)
    w_q = ctx.weight(f"{name}.w", w)
    y = jnp.einsum("...i,oi->...o", x, w_q)
    if b is not None:
        y = y + b
    if act is not None:
        y = act(y)
    _maybe_capture(ctx, name, x, y)
    return ctx.act(f"{name}.out", y)


def quant_layernorm(ctx, name: str, x: Array, scale: Array, bias: Array,
                    eps: float = 1e-12) -> Array:
    """LayerNorm with quantized gamma and quantized output
    (autoquant_utils.py:55-66)."""
    scale_q = ctx.weight(f"{name}.w", scale)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale_q + bias
    _maybe_capture(ctx, name, x, y)
    return ctx.act(f"{name}.out", y)


def quant_embedding(ctx, name: str, ids: Array, table: Array) -> Array:
    """Embedding lookup from a quantized table.

    The output is *not* activation-quantized — the table itself is already
    quantized, so lookups are grid points (autoquant_utils.py:69-85).
    """
    table_q = ctx.weight(f"{name}.w", table)
    return jnp.take(table_q, ids, axis=0)


def dropout(x: Array, rate: float, rng: Optional[jax.Array],
            deterministic: bool) -> Array:
    """Inverted dropout; identity in eval mode."""
    if deterministic or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
