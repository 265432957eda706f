"""Uniform quantizer math as pure JAX functions.

Capability parity with the reference's quantizer classes
(reference: quantization/quantizers.py:36-372 — ``AsymmetricUniformQuantizer``,
``SymmetricUniformQuantizer``, STE round/floor at :12-33), re-designed
functionally: quantizer *configuration* lives in a hashable
:class:`QuantizerSpec` (static under jit), quantizer *state* (scale /
zero-point / signedness) lives in a :class:`QuantParams` pytree.

Semantics intentionally reproduced from the reference:

- STE: ``round``/``floor`` forward, identity gradient
  (quantizers.py:12-33).
- asymmetric grid ``[0, 2^b - 1]``; ``scale = clamp(delta, eps)`` in the
  linear domain or ``exp(delta)`` in the log domain (quantizers.py:143-147);
  zero-point = STE-rounded ``zero_float`` clamped to the grid
  (quantizers.py:149-153).
- ``set_quant_range`` clamps ``x_min <= 0`` and ``x_max >= eps``
  (quantizers.py:257-259), then ``delta=(x_max-x_min)/int_max`` and
  ``zero_float=-x_min/delta`` (quantizers.py:263-282).
- symmetric grid: signedness inferred from the data as ``min(x_min) < 0``
  (quantizers.py:334-339); int grid ``[-2^(b-1), 2^(b-1)-1]`` if signed else
  ``[0, 2^b - 1]`` (quantizers.py:321-328); zero-point fixed at 0.
"""

from __future__ import annotations

import dataclasses
import enum
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


class QMethod(enum.Enum):
    """Quantization method registry (reference: quantizers.py:355-365)."""

    symmetric_uniform = "symmetric_uniform"
    asymmetric_uniform = "asymmetric_uniform"

    @classmethod
    def list(cls):
        return [m.name for m in cls]


@dataclasses.dataclass(frozen=True)
class QuantizerSpec:
    """Static (hashable) quantizer configuration.

    Mirrors the constructor surface of the reference quantizers
    (quantizers.py:96-107): ``n_bits``, ``scale_domain`` in
    {'linear','log'}, and the method choice (sym/asym).
    """

    n_bits: int = 8
    method: QMethod = QMethod.asymmetric_uniform
    scale_domain: str = "linear"
    eps: float = 1e-8

    def __post_init__(self):
        assert self.scale_domain in ("linear", "log")

    @property
    def symmetric(self) -> bool:
        return self.method == QMethod.symmetric_uniform


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantParams:
    """Dynamic quantizer state (a pytree).

    ``delta`` is stored in the configured scale domain (log-domain deltas are
    stored as ``log(scale)`` exactly as the reference stores ``_delta``;
    quantizers.py:279-282). ``zero_float`` is the un-rounded zero point.
    ``signed`` is a scalar 0/1 flag used only by symmetric quantizers
    (quantizers.py:310-315). Shapes are *reduced*: scalar for per-tensor,
    ``(C,)`` for per-channel / per-axis / per-group quantization; use
    :func:`expand_qparams` to broadcast against a data tensor.
    """

    delta: Array
    zero_float: Array
    signed: Array  # scalar {0., 1.}

    @property
    def n_channels(self) -> int:
        return 1 if self.delta.ndim == 0 else self.delta.shape[0]


# ---------------------------------------------------------------------------
# Straight-through estimators (reference: quantizers.py:12-33)
# ---------------------------------------------------------------------------


def round_ste(x: Array) -> Array:
    """Round with identity gradient (RoundStraightThrough)."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def floor_ste(x: Array) -> Array:
    """Floor with identity gradient (FloorStraightThrough)."""
    return x + jax.lax.stop_gradient(jnp.floor(x) - x)


def clamp(x: Array, lo, hi) -> Array:
    """Clip with torch-style gradient semantics.

    ``torch.clamp`` passes the gradient on the CLOSED interval [lo, hi] and
    zeroes it outside; ``jnp.clip`` (min/max composition) splits the
    gradient 50/50 at exact ties. Ties are the common case here — the
    rounded integer grid lands exactly on ``int_min``/``int_max`` for every
    saturated-boundary element — so using jnp.clip halves the learn-ranges
    (LSQ) gradient at the grid edge relative to the reference
    (quantizers.py:184-186). Values are identical; only gradients differ.
    """
    clipped = jnp.clip(x, lo, hi)
    keep = (x >= lo) & (x <= hi)
    return jnp.where(keep, x, jax.lax.stop_gradient(clipped))


# ---------------------------------------------------------------------------
# Integer grid
# ---------------------------------------------------------------------------


def int_min_max(spec: QuantizerSpec, signed: Array | float = 1.0) -> Tuple[Array, Array]:
    """Integer grid limits.

    Asymmetric: ``[0, 2^b - 1]`` (quantizers.py:133-140).
    Symmetric: ``[-2^(b-1), 2^(b-1)-1]`` if signed else ``[0, 2^b - 1]``
    (quantizers.py:321-328). ``signed`` may be a traced scalar.
    """
    b = spec.n_bits
    if not spec.symmetric:
        return jnp.asarray(0.0), jnp.asarray(2.0 ** b - 1)
    signed = jnp.asarray(signed, jnp.float32)
    int_min = jnp.where(signed > 0, -(2.0 ** (b - 1)), 0.0)
    int_max = jnp.where(signed > 0, 2.0 ** (b - 1) - 1, 2.0 ** b - 1)
    return int_min, int_max


def scale_of(spec: QuantizerSpec, qp: QuantParams) -> Array:
    """Effective positive scale (quantizers.py:143-147)."""
    if spec.scale_domain == "linear":
        return jnp.maximum(qp.delta, spec.eps)
    return jnp.exp(qp.delta)


def zero_point_of(spec: QuantizerSpec, qp: QuantParams) -> Array:
    """STE-rounded, grid-clamped zero point (quantizers.py:149-153).

    Symmetric quantizers have a fixed zero point of 0 (quantizers.py:331-332);
    we keep ``zero_float == 0`` for them so one code path suffices while
    matching the reference exactly.
    """
    if spec.symmetric:
        return jnp.zeros_like(qp.delta)
    int_min, int_max = int_min_max(spec)
    return clamp(round_ste(qp.zero_float), int_min, int_max)


# ---------------------------------------------------------------------------
# Range -> params (reference set_quant_range)
# ---------------------------------------------------------------------------


def set_quant_range(spec: QuantizerSpec, x_min, x_max) -> QuantParams:
    """Instantiate quantization parameters from a (min, max) range.

    Asymmetric: quantizers.py:234-282 (including the ``x_min <= 0`` /
    ``x_max >= eps`` clamps). Symmetric: quantizers.py:334-344 (signedness
    from data, ``delta = absmax / int_max``). Resulting params carry no
    gradient to the range inputs (the reference ``.detach()``es).
    """
    # float64 under --double (jax_enable_x64 + f64 inputs), else float32
    dt = (jnp.float64 if jnp.result_type(x_min, x_max) == jnp.float64
          else jnp.float32)
    x_min = jnp.asarray(x_min, dt)
    x_max = jnp.asarray(x_max, dt)
    # _tensorize_min_max clamps (quantizers.py:257-259)
    x_min = jnp.minimum(x_min, 0.0)
    x_max = jnp.maximum(x_max, spec.eps)

    if spec.symmetric:
        signed = (jnp.min(x_min) < 0).astype(jnp.float32)
        _, int_max = int_min_max(spec, signed)
        x_absmax = jnp.maximum(jnp.abs(x_min), x_max)
        delta = x_absmax / int_max
        zero_float = jnp.zeros_like(delta)
    else:
        signed = jnp.asarray(0.0)
        _, int_max = int_min_max(spec)
        delta = (x_max - x_min) / int_max
        zero_float = -x_min / delta

    if spec.scale_domain == "log":
        delta = jnp.log(delta)

    return QuantParams(
        delta=jax.lax.stop_gradient(delta),
        zero_float=jax.lax.stop_gradient(zero_float),
        signed=jax.lax.stop_gradient(signed),
    )


def x_min_max_of(spec: QuantizerSpec, qp: QuantParams) -> Tuple[Array, Array]:
    """Representable range (quantizers.py:155-161)."""
    scale = scale_of(spec, qp)
    zp = zero_point_of(spec, qp)
    int_min, int_max = int_min_max(spec, qp.signed)
    return scale * (int_min - zp), scale * (int_max - zp)


# ---------------------------------------------------------------------------
# Broadcast helpers for per-channel / per-axis quantization
# ---------------------------------------------------------------------------


def broadcast_shape(rank: int, axis: int) -> Tuple[int, ...]:
    """Shape placing the channel dim at ``axis`` of a rank-``rank`` tensor.

    Mirrors ``_adjust_params_per_axis`` (quantizers.py:213-217) /
    ``_adjust_params_per_channel`` (quantizers.py:219-232).
    """
    return tuple(-1 if d == axis else 1 for d in range(rank))


def expand_qparams(qp: QuantParams, rank: int, axis: Optional[int]) -> QuantParams:
    """Reshape reduced (C,) params for broadcasting against a rank-N tensor.

    ``axis=None`` with 1-D params corresponds to the reference's
    ``per_channel`` mode (channel dim 0); an explicit ``axis`` corresponds to
    its ``axis`` mode.
    """
    if qp.delta.ndim == 0:
        return qp
    ax = 0 if axis is None else axis
    shape = broadcast_shape(rank, ax)
    return QuantParams(
        delta=qp.delta.reshape(shape),
        zero_float=qp.zero_float.reshape(shape),
        signed=qp.signed,
    )


# ---------------------------------------------------------------------------
# Fake quantization forward (reference: quantizers.py:172-211)
# ---------------------------------------------------------------------------


def to_int(spec: QuantizerSpec, qp: QuantParams, x: Array) -> Array:
    """Float tensor -> (float-typed) integer representation with STE.

    ``x_int = clamp(round_ste(x / scale) + zp, int_min, int_max)``
    (quantizers.py:172-187). ``qp`` must already be broadcastable to ``x``.
    """
    scale = scale_of(spec, qp)
    zp = zero_point_of(spec, qp)
    int_min, int_max = int_min_max(spec, qp.signed)
    x_int = round_ste(x / scale) + zp
    return clamp(x_int, int_min, int_max)


def from_int(spec: QuantizerSpec, qp: QuantParams, x_int: Array) -> Array:
    """Integer representation -> dequantized float (quantizers.py:208-210)."""
    scale = scale_of(spec, qp)
    zp = zero_point_of(spec, qp)
    return scale * (x_int - zp)


def fake_quant(spec: QuantizerSpec, qp: QuantParams, x: Array,
               axis: Optional[int] = None) -> Array:
    """Quantize-dequantize with straight-through gradients.

    Equivalent to ``AsymmetricUniformQuantizer.forward`` /
    ``SymmetricUniformQuantizer.forward`` (quantizers.py:189-211). If ``qp``
    holds per-channel params in reduced ``(C,)`` shape, ``axis`` selects the
    channel dimension of ``x`` (default 0, matching per-channel weights).

    Low-precision float inputs (bf16/f16 — the TPU inference engine keeps
    activations bf16 between ops) upcast to f32 for the grid arithmetic
    (8-bit grids need more mantissa than bf16 carries) and return in the
    input dtype; XLA fuses the casts into the surrounding elementwise chain
    so HBM traffic stays at the narrow width.

    Implemented with a custom VJP: under learn-ranges QAT, autodiff of
    the op chain emitted one separate full-tensor reduce fusion PER
    GRADIENT TERM per site (TPU profile: 337 multiply_reduce fusions =
    17 ms of the 63 ms step at B=32). The hand-written backward derives
    g_x, g_delta, g_zero_float from shared subexpressions so XLA fuses
    the reads; the gradient VALUES are the same STE/LSQ gradients
    (oracle-tested vs torch autograd in tests/test_reference_parity.py
    test_ste_gradient_parity).
    """
    return _fake_quant_vjp(spec, axis, qp, x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fake_quant_vjp(spec: QuantizerSpec, axis: Optional[int],
                    qp: QuantParams, x: Array) -> Array:
    qpe = expand_qparams(qp, x.ndim, axis)
    orig_dtype = x.dtype
    if orig_dtype in (jnp.bfloat16, jnp.float16):
        x = x.astype(jnp.float32)
    y = from_int(spec, qpe, to_int(spec, qpe, x))
    return y.astype(orig_dtype) if y.dtype != orig_dtype else y


def _fq_fwd(spec, axis, qp, x):
    return _fake_quant_vjp(spec, axis, qp, x), (qp, x)


def _fq_bwd(spec, axis, res, g):
    qp, x = res
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    qpe = expand_qparams(qp, x.ndim, axis)
    s = scale_of(spec, qpe)
    zp = zero_point_of(spec, qpe)  # symmetric: zeros
    int_min, int_max = int_min_max(spec, qpe.signed)
    u = jnp.round(x32 / s) + zp
    keep = ((u >= int_min) & (u <= int_max)).astype(jnp.float32)
    r = jnp.clip(u, int_min, int_max)

    # d y / d x: STE through round, torch-clamp keep semantics
    g_x = (g32 * keep).astype(orig_dtype)

    # d y / d scale = (r - zp) - keep * x / s  (y = s*(r - zp), r carries
    # the -x/s^2 STE term inside the kept region)
    g_s = g32 * ((r - zp) - keep * (x32 / s))

    if spec.symmetric:
        g_z_full = None
    else:
        # zero_point enters +zp (inside the clamp; its own STE/clamp
        # keep) and -zp in the dequant: d y / d zero_float =
        # s * zkeep * (keep - 1)
        zr = jnp.round(qpe.zero_float)
        lo_z, hi_z = int_min_max(spec)
        zkeep = ((zr >= lo_z) & (zr <= hi_z)).astype(jnp.float32)
        g_z_full = g32 * s * zkeep * (keep - 1.0)

    # reduce expanded grads to the stored qp shapes
    if qp.delta.ndim == 0:
        red = jnp.sum
    else:
        ax = 0 if axis is None else axis
        axes = tuple(d for d in range(x.ndim) if d != ax)
        red = lambda t: jnp.sum(t, axis=axes)  # noqa: E731
    g_d = red(g_s)
    # through the scale domain: linear s = max(delta, eps) (gradient 1 on
    # delta >= eps, matching torch.clamp(min=eps)); log s = exp(delta)
    dr = jnp.reshape(qp.delta, qp.delta.shape)
    if spec.scale_domain == "linear":
        g_d = g_d * (dr >= spec.eps).astype(jnp.float32)
    else:
        g_d = g_d * jnp.exp(dr)
    g_z = (jnp.zeros_like(qp.zero_float) if g_z_full is None
           else jnp.reshape(red(g_z_full), qp.zero_float.shape))
    g_qp = QuantParams(delta=jnp.reshape(g_d, qp.delta.shape),
                       zero_float=g_z,
                       signed=jnp.zeros_like(qp.signed))
    return g_qp, g_x


_fake_quant_vjp.defvjp(_fq_fwd, _fq_bwd)


def clamped_fraction(spec: QuantizerSpec, qp: QuantParams, x: Array,
                     axis: Optional[int] = None) -> Array:
    """Fraction of elements clipped by the grid — the ``_clamped`` telemetry
    stat of the reference (quantizers.py:163-170)."""
    qp = expand_qparams(qp, x.ndim, axis)
    scale = scale_of(spec, qp)
    zp = zero_point_of(spec, qp)
    int_min, int_max = int_min_max(spec, qp.signed)
    x_int = jnp.round(x / scale) + zp
    clamped = (x_int > int_max) | (x_int < int_min)
    return jnp.mean(clamped.astype(jnp.float32))


# ---------------------------------------------------------------------------
# AdaRound relaxation (reference: quantization/adaround/quantizer.py)
# ---------------------------------------------------------------------------

ZETA = 1.1
GAMMA = -0.1


def logit(p: Array, eps: float = 1e-16) -> Array:
    """Inverse sigmoid (adaround/quantizer.py:22-24)."""
    p = jnp.clip(p, eps, 1 - eps)
    return -jnp.log(1.0 / p - 1.0)


def hard_sigmoid(x: Array, zeta: float = ZETA, gamma: float = GAMMA) -> Array:
    """Rectified sigmoid h(alpha) (adaround/quantizer.py:27-29)."""
    p = jax.nn.sigmoid(x)
    return jnp.clip(p * (zeta - gamma) + gamma, 0.0, 1.0)


def hard_logit(p: Array, zeta: float = ZETA, gamma: float = GAMMA) -> Array:
    """Inverse of :func:`hard_sigmoid` (adaround/quantizer.py:32-34)."""
    return -jnp.log((zeta - p) / (p - gamma))


class AdaRoundMode(enum.Enum):
    """Rounding relaxations (adaround/utils.py:60-75)."""

    nearest = "nearest"
    learned_sigmoid = "learned_sigmoid"
    learned_hard_sigmoid = "learned_hard_sigmoid"
    sigmoid_temp_decay = "sigmoid_temp_decay"

    @classmethod
    def list(cls):
        return [m.name for m in cls if m is not cls.nearest]


def adaround_rest(mode: AdaRoundMode, alpha: Array, temperature=None) -> Array:
    """h(alpha): the continuous rounding offset (adaround/quantizer.py:84-91)."""
    if mode == AdaRoundMode.learned_sigmoid:
        return jax.nn.sigmoid(alpha)
    if mode == AdaRoundMode.learned_hard_sigmoid:
        return hard_sigmoid(alpha)
    if mode == AdaRoundMode.sigmoid_temp_decay:
        return jax.nn.sigmoid(alpha / temperature)
    raise ValueError(f"Unknown rounding mode: {mode}")


def adaround_init_alpha(mode: AdaRoundMode, spec: QuantizerSpec, qp: QuantParams,
                        w: Array, axis: Optional[int] = None,
                        temperature=None) -> Array:
    """Initialize alpha so that h(alpha) equals the FP32 rounding rest
    (adaround/quantizer.py:56-71)."""
    qpe = expand_qparams(qp, w.ndim, axis)
    scale = scale_of(spec, qpe)
    x = w / scale
    rest = x - jnp.floor(x)
    if mode == AdaRoundMode.learned_sigmoid:
        return logit(rest)
    if mode == AdaRoundMode.learned_hard_sigmoid:
        return hard_logit(rest)
    if mode == AdaRoundMode.sigmoid_temp_decay:
        return temperature * logit(rest)
    raise ValueError(f"Unknown rounding mode: {mode}")


def adaround_fake_quant(mode: AdaRoundMode, spec: QuantizerSpec, qp: QuantParams,
                        w: Array, alpha: Array, soft: bool,
                        axis: Optional[int] = None, temperature=None) -> Array:
    """AdaRound forward: floor + learned rounding offset
    (adaround/quantizer.py:47-82).

    ``soft=True`` uses the continuous h(alpha); ``soft=False`` uses the hard
    up/down decision ``alpha >= 0``.
    """
    if mode == AdaRoundMode.nearest:
        return fake_quant(spec, qp, w, axis=axis)
    qpe = expand_qparams(qp, w.ndim, axis)
    scale = scale_of(spec, qpe)
    zp = zero_point_of(spec, qpe)
    int_min, int_max = int_min_max(spec, qpe.signed)
    x_floor = jnp.floor(w / scale)
    if soft:
        offset = adaround_rest(mode, alpha, temperature)
    else:
        offset = (alpha >= 0).astype(w.dtype)
    x_int = x_floor + offset
    if not spec.symmetric:
        x_int = x_int + zp
    x_int = clamp(x_int, int_min, int_max)
    return scale * (x_int - zp)
