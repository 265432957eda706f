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
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
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


def _int8_fast_path(ctx, name: str, input_site: Optional[str]):
    """Packed int8 weights + quantized input -> MXU int path.

    The input site may be per-tensor or per-axis (e.g. per-token, axis=1):
    axis scales are constant along the contraction dim, so they fold into
    the epilogue like the per-tensor scalar does. Per-channel / grouped
    input scales vary along the contracted features and cannot fold.
    """
    int_params = getattr(ctx, "int_params", None)
    if not int_params or name not in int_params:
        return None
    if input_site is None or input_site not in ctx.cfg:
        return None
    in_cfg = ctx.cfg[input_site]
    if not (in_cfg.enabled and ctx.mode.act_quant and ctx.mode.weight_quant):
        return None
    if in_cfg.per_channel or in_cfg.n_groups:
        return None  # scales vary along the contracted features
    if in_cfg.spec.n_bits > 8:
        # >8-bit grids don't fit the int8 payload (re-quantizing would
        # WRAP the levels); the float path serves these edges exactly
        # (round-5 real-TPU flex check caught this on {'c': 16})
        return None
    wname = f"{name}.w"
    if wname in ctx.cfg and not ctx.cfg[wname].enabled:
        return None
    st = ctx.qstate.get(input_site)
    if st is None:
        return None
    return in_cfg, st["qp"], int_params[name]


def _weight_from_int_or_fake(ctx, name: str, w: Array) -> Array:
    """Quantized weight for the float matmul path: dequantize the packed
    int payload when one is available (weight-only real-int execution —
    int8/int4 HBM reads instead of f32; bit-identical values), else the
    fake-quant chain. Packed payloads bake FIXED ranges (+ AdaRound), so
    estimate/learn weight phases fall back to the live fake-quant."""
    from transformer_quantization_tpu.ops import int_linear as IL
    from transformer_quantization_tpu.quant.qconfig import Phase

    int_params = getattr(ctx, "int_params", None)
    wname = f"{name}.w"
    if (int_params and name in int_params and ctx.mode.weight_quant
            and ctx.mode.weight_phase == Phase.fix
            and not (wname in ctx.cfg and not ctx.cfg[wname].enabled)
            and not getattr(ctx, "capture_sites", None)):
        return IL.dequantize_packed_weight(int_params[name])
    return ctx.weight(wname, w)


def _int8_qat_matmul(ctx, name, x, w, b, input_site):
    """int8-MXU QAT matmul when every condition holds, else None.

    Conditions (all static at trace time): the layer is in the eagerly
    pre-screened ``int8_qat_sites`` set; the input site is an enabled
    per-tensor asymmetric 8-bit linear-domain act site with stored params
    (so ``x`` arrives as its exact fake-quantized value and the levels
    reconstruct exactly); no capture, no amp (bf16 x would round
    off-grid, breaking exact level recovery).

    Phases: acts may be fix, learn, or ESTIMATE — in estimate mode the
    producing site updated ``ctx.qstate[input_site]`` earlier in this
    same traced forward (dict threading is trace-ordered), so the params
    read here are the ones ``x`` was just quantized with. Weights may be
    fix, learn, or estimate (range re-derived from the current weight
    each step, mirroring QuantCtx.weight's estimate branch — min-max
    methods only, like that branch).
    """
    from transformer_quantization_tpu.quant import quantizers as Q
    from transformer_quantization_tpu.quant import ranges as R
    from transformer_quantization_tpu.quant.qconfig import Phase
    from transformer_quantization_tpu.training.int8_qat import (
        int8_qat_linear,
    )

    if (name not in ctx.int8_qat_sites or input_site is None
            or getattr(ctx, "capture_sites", None)
            or getattr(ctx, "compute_dtype", None) is not None):
        return None
    m = ctx.mode
    if not (m.weight_quant and m.act_quant):
        return None
    if m.act_phase == Phase.record_ranges:
        return None
    wname = f"{name}.w"
    if wname not in ctx.cfg or input_site not in ctx.cfg:
        return None
    ic = ctx.cfg[input_site]
    if not (ic.kind == "act" and ic.enabled and ic.axis is None
            and not ic.n_groups and ic.spec.n_bits == 8
            and not ic.spec.symmetric and ic.spec.scale_domain == "linear"):
        return None
    wc = ctx.cfg[wname]
    ist = ctx.qstate.get(input_site)
    if ist is None:
        return None
    qp_x = ist["qp"]
    if qp_x.delta.ndim != 0:
        return None
    if m.weight_phase == Phase.estimate:
        # estimate_ranges_train for weights: range re-derived from the
        # live weight via the SAME helper QuantCtx.weight uses (the two
        # forwards must never diverge in estimate mode).
        from transformer_quantization_tpu.quant.manager import (
            estimate_weight_qp,
        )

        rc = wc.range_cfg
        if rc.method in (R.RangeMethod.MSE, R.RangeMethod.cross_entropy):
            return None  # the helper raises for these; float path handles
        if ctx.qstate.get(wname, {}).get("alpha") is not None:
            return None
        qp_w = estimate_weight_qp(wc, w)
        # int8_qat_linear always uses the signed grid, but set_quant_range
        # infers signedness from the live data — force the signed grid by
        # rescaling delta (absmax/(2^b-1) -> absmax/(2^(b-1)-1)). For any
        # weight with a negative entry (every real layer) this is a
        # bit-exact no-op; an all-positive tensor gets a self-consistent
        # signed grid where the float path would flip to unsigned.
        b_ = wc.spec.n_bits
        factor = (2.0 ** b_ - 1.0) / (2.0 ** (b_ - 1) - 1.0)
        qp_w = Q.QuantParams(
            delta=jnp.where(qp_w.signed > 0, qp_w.delta,
                            qp_w.delta * factor),
            zero_float=qp_w.zero_float,
            signed=jnp.ones_like(qp_w.signed))
        ctx.qstate[wname] = dict(ctx.qstate.get(wname, {"alpha": None}),
                                 qp=qp_w)
        if wc.per_channel:
            qp_w = Q.QuantParams(delta=qp_w.delta.reshape(-1),
                                 zero_float=qp_w.zero_float.reshape(-1),
                                 signed=qp_w.signed)
    else:
        wst = ctx.qstate.get(wname)
        if wst is None or wst.get("alpha") is not None:
            return None
        qp_w = wst["qp"]
    return int8_qat_linear(x, w, b, qp_x.delta, qp_x.zero_float,
                           qp_w.delta, wc.spec.n_bits, wc.per_channel,
                           False)


def quant_linear(ctx, name: str, x: Array, w: Array, b: Optional[Array],
                 activation=None, input_site: Optional[str] = None) -> Array:
    """Quantized affine layer with optional fused activation.

    Pipeline (hijacker.py:66-116): quantize weight -> x @ W^T + b ->
    activation fn -> quantize output activations. ``w`` is stored
    ``(out, in)`` (the torch convention) so per-channel weight quantization
    reduces over dim 0 exactly like the reference.

    ``input_site`` names the activation site that produced ``x``; when the
    ctx carries packed int weights (real-int execution) and the input site
    is per-tensor, the matmul runs as int8 x int8 -> int32 on the MXU with
    dequantization folded into the epilogue (ops/int_linear.py).
    """
    from transformer_quantization_tpu.ops import int_linear as IL

    act = _resolve_act(activation)
    fast = _int8_fast_path(ctx, name, input_site)
    if fast is not None and fast[0].axis == x.ndim - 1:
        fast = None  # per-embd (axis=last): scales vary along contraction
    if fast is not None:
        in_cfg, in_qp, packed = fast
        if in_cfg.axis is not None:
            from transformer_quantization_tpu.quant import quantizers as Q

            # per-token (axis=1 on (B,T,d)) ranges: broadcast the reduced
            # (T,) params to (1,T,1) — dynamic per-token quantization then
            # executes on the real int8 path with per-row epilogue scales
            in_qp = Q.expand_qparams(in_qp, x.ndim, in_cfg.axis)
        out_site = f"{name}.out"
        capturing = bool(getattr(ctx, "capture_sites", None))
        if (getattr(ctx, "use_pallas", False) and not capturing
                and in_cfg.axis is None):
            from transformer_quantization_tpu.ops.pallas import (
                fused_int8_linear,
            )
            from transformer_quantization_tpu.quant.qconfig import Phase

            # int8 hand-off: the producer already emitted this site's
            # quantized payload — feed it straight to the MXU
            handoffs = getattr(ctx, "int8_handoffs", None)
            x_in = x
            if handoffs and input_site in handoffs:
                x_in = handoffs[input_site]

            # fold the output act site into the kernel epilogue when it is
            # an enabled, fixed, per-tensor site
            out_spec = out_qp = None
            fold_out = False
            if (out_site in ctx.cfg and ctx.cfg[out_site].enabled
                    and ctx.mode.act_quant
                    and ctx.mode.act_phase == Phase.fix
                    and out_site in ctx.qstate
                    and ctx.cfg[out_site].axis is None):
                oq = ctx.qstate[out_site]["qp"]
                if oq.delta.ndim == 0:
                    out_spec = ctx.cfg[out_site].spec
                    out_qp = oq
                    fold_out = True
            emit = (fold_out and out_spec.n_bits == 8 and out_site in
                    getattr(ctx, "int8_only_sites", ()))
            y = fused_int8_linear(
                x_in, packed, in_cfg.spec, in_qp, bias=b,
                activation=activation if isinstance(activation, str)
                else None, out_spec=out_spec, out_qp=out_qp,
                emit_int8=emit)
            if y is not None:
                if emit:
                    # stash the payload; the (sole) consumer picks it up
                    ctx.int8_handoffs = getattr(ctx, "int8_handoffs", {})
                    ctx.int8_handoffs[out_site] = y
                    return y
                if fold_out:
                    return y  # output site already applied in-kernel
                if act is not None and not isinstance(activation, str):
                    y = act(y)
                return ctx.act(out_site, y)
            if x_in is not x:
                # kernel rejected but x was a payload: materialize floats
                x = IL.dequantize_activation_int8(in_cfg.spec, in_qp, x_in)
        x_int8, s_x, shift = IL.quantize_activation_int8(in_cfg.spec, in_qp, x)
        y = IL.int8_linear(x_int8, s_x, shift, packed, b, act,
                           matmul=getattr(ctx, "int_matmul", None))
        y = y.astype(x.dtype)  # bf16 engine: epilogue math f32, storage bf16
        _maybe_capture(ctx, name, x, y)
        return ctx.act(f"{name}.out", y)

    if getattr(ctx, "int8_qat_sites", None):
        # QAT on the int8 MXU (training/int8_qat.py): the fake-quant
        # matmul runs int8 x int8 -> int32 with values exactly the float
        # composition's and a custom VJP carrying the same STE/LSQ
        # gradients. Eligibility was pre-screened eagerly
        # (qat.int8_forward_sites — weight signedness is data-inferred);
        # the remaining static-config conditions gate here at trace time.
        y = _int8_qat_matmul(ctx, name, x, w, b, input_site)
        if y is not None:
            y = y.astype(x.dtype)
            if act is not None:
                y = act(y)
            # no capture call: the gate forces the float path whenever
            # ctx.capture_sites is set (AdaRound/telemetry never see this
            # branch)
            return ctx.act(f"{name}.out", y)

    w_q = _weight_from_int_or_fake(ctx, name, w)
    if getattr(ctx, "compute_dtype", None) is not None:
        w_q = w_q.astype(ctx.compute_dtype)
        x = x.astype(ctx.compute_dtype)
    y = jnp.einsum("...i,oi->...o", x, w_q,
                   precision=wide_matmul_precision(ctx, input_site,
                                                   f"{name}.w"))
    if b is not None:
        y = (y + b).astype(y.dtype)
    if act is not None and getattr(ctx, "capture_pre_act", False):
        # AdaRound include_act_func=False: target the pre-activation output
        # (adaround/adaround.py:47-49 temporarily strips the act fn)
        _maybe_capture(ctx, name, x, y)
        y = act(y)
    else:
        if act is not None:
            y = act(y)
        _maybe_capture(ctx, name, x, y)
    return ctx.act(f"{name}.out", y)


def wide_matmul_precision(ctx, *sites):
    """``lax.Precision.HIGHEST`` when any named act/weight site puts
    >8-bit-grid VALUES into a float matmul, else None (backend default).

    On TPU the default f32 matmul rounds operands toward bf16 precision
    (~8 mantissa bits) — invisible under 8-bit quantization grids (the
    256 levels are bf16-exact), but it silently destroys the low bits of
    16-bit sites, defeating the mixed W8A{8,16} recipes' accuracy on the
    generic path (found by the round-5 real-TPU flex spot check: the
    engine computes these edges in exact f32 and diverged from the
    generic path by ~30% of logit scale at {'c': 16}; the reference's
    torch matmuls are full f32). CPU/GPU backends ignore HIGHEST.
    """
    cfg = getattr(ctx, "cfg", None)
    if cfg is None:
        return None
    for name in sites:
        if name is None or name not in cfg:
            continue
        c = cfg[name]
        if c.enabled and c.spec.n_bits > 8:
            return jax.lax.Precision.HIGHEST
    return None


def quant_layernorm(ctx, name: str, x: Array, scale: Array, bias: Array,
                    eps: float = 1e-12) -> Array:
    """LayerNorm with quantized gamma and quantized output
    (autoquant_utils.py:55-66)."""
    scale_q = ctx.weight(f"{name}.w", scale)
    x32 = x.astype(jnp.float32)  # stats in f32 even on the bf16 engine
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = (y * scale_q + bias).astype(x.dtype)
    _maybe_capture(ctx, name, x, y)
    return ctx.act(f"{name}.out", y)


def quant_grouped_linear(ctx, name: str, x: Array, w: Array,
                         b: Optional[Array], groups: int,
                         activation=None,
                         input_site: Optional[str] = None) -> Array:
    """Block-diagonal (grouped) affine layer — SqueezeBERT's kernel-size-1
    grouped Conv1d in (B, T, C) layout.

    ``w`` is stored ``(out, in/groups)`` (the conv weight squeezed); output
    group j contracts input group j only. ``groups=1`` degenerates to
    :func:`quant_linear` semantics (and routes there to keep the int8/
    Pallas fast paths).
    """
    if groups == 1:
        return quant_linear(ctx, name, x, w, b, activation=activation,
                            input_site=input_site)
    from transformer_quantization_tpu.ops import int_linear as IL

    act = _resolve_act(activation)
    fast = _int8_fast_path(ctx, name, input_site)
    if fast is not None and fast[0].axis == x.ndim - 1:
        fast = None  # per-embd (axis=last): scales vary along contraction
    if fast is not None:
        in_cfg, in_qp, packed = fast
        if in_cfg.axis is not None:
            from transformer_quantization_tpu.quant import quantizers as Q

            in_qp = Q.expand_qparams(in_qp, x.ndim, in_cfg.axis)
        x_int8, s_x, shift = IL.quantize_activation_int8(in_cfg.spec,
                                                         in_qp, x)
        y = IL.int8_grouped_linear(x_int8, s_x, shift, packed, b, groups,
                                   act)
        y = y.astype(x.dtype)
        _maybe_capture(ctx, name, x, y)
        return ctx.act(f"{name}.out", y)
    w_q = _weight_from_int_or_fake(ctx, name, w)
    if getattr(ctx, "compute_dtype", None) is not None:
        w_q = w_q.astype(ctx.compute_dtype)
        x = x.astype(ctx.compute_dtype)
    out_f, in_g = w_q.shape
    lead = x.shape[:-1]
    xg = x.reshape(*lead, groups, in_g)
    wg = w_q.reshape(groups, out_f // groups, in_g)
    y = jnp.einsum("...gi,goi->...go", xg, wg,
                   precision=wide_matmul_precision(ctx, input_site,
                                                   f"{name}.w")
                   ).reshape(*lead, out_f)
    if b is not None:
        y = (y + b).astype(y.dtype)
    if act is not None:
        y = act(y)
    _maybe_capture(ctx, name, x, y)
    return ctx.act(f"{name}.out", y)


def quant_nonorm(ctx, name: str, x: Array, weight: Array,
                 bias: Array) -> Array:
    """MobileBERT NoNorm replacement: ``x * w + b`` with w AND b pushed
    through the same weight-quantizer site, then output act quant
    (quantized_mobilebert.py:58-72 QuantNoNorm).

    The reference runs weight and bias through one shared quantizer
    instance; here the stacked ``concat(w, b)`` quantizes through the one
    site — same grid for both tensors, one range (initialized from the
    concat), and AdaRound alphas that cover both, exactly like the shared
    AdaRound quantizer instance does in the reference.
    """
    wb_q = ctx.weight(f"{name}.w", jnp.concatenate([weight, bias]))
    w_q, b_q = jnp.split(wb_q, 2)
    y = x * w_q + b_q
    _maybe_capture(ctx, name, x, y)
    return ctx.act(f"{name}.out", y)


def quant_embedding(ctx, name: str, ids: Array, table: Array) -> Array:
    """Embedding lookup from a quantized table.

    The output is *not* activation-quantized — the table itself is already
    quantized, so lookups are grid points (autoquant_utils.py:69-85).
    With packed int params, the table is stored int8 and rows dequantize
    after the gather (4x less HBM traffic on the gather).
    """
    from transformer_quantization_tpu.ops import int_linear as IL

    int_params = getattr(ctx, "int_params", None)
    cdt = getattr(ctx, "compute_dtype", None)
    if int_params and name in int_params and ctx.mode.weight_quant:
        rows = IL.int8_embedding_lookup(ids, int_params[name])
        return rows.astype(cdt) if cdt is not None else rows
    table_q = ctx.weight(f"{name}.w", table)
    rows = jnp.take(table_q, ids, axis=0)
    _maybe_capture(ctx, name, ids, rows)
    return rows.astype(cdt) if cdt is not None else rows


def quant_activation_wrapper(ctx, name: str, fn: Callable, x: Array,
                             tie_input: bool = True) -> Array:
    """Param-free op (pooling, reshape-reduce, ...) with input/output
    quantizers *tied* to one site — the reference's
    ``QuantizedActivationWrapper`` with ``tie_activation_quantizers=True``
    (autoquant_utils.py:24-52): the same quantizer instance handles the
    op's input and output, so in the estimate phase its range estimator
    sees both tensors, and in the fix phase both sit on one shared grid
    (sound for monotone, range-preserving ops like avg/max pooling).

    ``tie_input=False`` reproduces the untied wrapper: only the output is
    quantized (a plain ``QuantizedActivation`` around ``fn``).
    """
    if tie_input:
        x = ctx.act(name, x)
    y = fn(x)
    _maybe_capture(ctx, name, x, y)
    return ctx.act(name, y)


def dropout(x: Array, rate: float, rng: Optional[jax.Array],
            deterministic: bool) -> Array:
    """Inverted dropout; identity in eval mode."""
    if deterministic or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
