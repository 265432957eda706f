"""Quantization range estimation.

Capability parity with the reference's estimator zoo
(reference: quantization/range_estimators.py):

- :data:`RangeMethod.current_minmax` — per-batch min/max, optional percentile
  clipping, per-axis and per-embedding-group (PEG) modes with optional
  range-based channel permutation (range_estimators.py:62-145).
- :data:`RangeMethod.allminmax` — monotone min/max envelope over all batches
  (range_estimators.py:148-169).
- :data:`RangeMethod.running_minmax` — EMA of per-batch min/max
  (range_estimators.py:172-216).
- :data:`RangeMethod.MSE` — min ||x - Q(x)||^2 over clipping thresholds via
  exhaustive grid search or golden-section search
  (range_estimators.py:228-490).
- :data:`RangeMethod.cross_entropy` — softmax cross-entropy objective for
  logits layers (range_estimators.py:493-502).

Design: the min-max family is implemented as *pure*
``update(state, x) -> state`` functions with fixed-shape state so whole
calibration steps can be jitted (and used inside QAT's
``estimate_ranges_train`` phase). The MSE family is host-orchestrated — its
search-space shape depends on a data-dependent one-sidedness decision made on
the first batch (range_estimators.py:472-481) — but every loss evaluation is
a jitted, candidate-vmapped TPU kernel, replacing the reference's Python/scipy
loops.
"""

from __future__ import annotations

import dataclasses
import enum
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from transformer_quantization_tpu.quant import quantizers as Q

Array = jax.Array


class RangeMethod(enum.Enum):
    """Estimator registry (range_estimators.py:515-528)."""

    current_minmax = "current_minmax"
    allminmax = "allminmax"
    running_minmax = "running_minmax"
    MSE = "MSE"
    cross_entropy = "cross_entropy"

    @classmethod
    def list(cls):
        return [m.name for m in cls]


class OptMethod(enum.Enum):
    """MSE optimization method (range_estimators.py:219-225)."""

    grid = "grid"
    golden_section = "golden_section"

    @classmethod
    def list(cls):
        return [m.name for m in cls]


@dataclasses.dataclass(frozen=True)
class ReduceSpec:
    """How a data tensor is reduced to a range.

    - default: per-tensor scalar range.
    - ``per_channel``: ranges along dim 0 (weights; range_estimators.py:118-130).
    - ``axis``: ranges along ``axis`` after transposing it to the front
      (activations, e.g. per-embedding axis=2; range_estimators.py:82-116).
    - ``n_groups``: PEG — channels split into equal groups sharing a range
      (range_estimators.py:87-112).
    - ``permute``: sort channels by dynamic range before grouping
      (range_estimators.py:92-109); needs recorded per-channel ``ranges``.
    """

    per_channel: bool = False
    axis: Optional[int] = None
    n_groups: Optional[int] = None
    permute: bool = False


@dataclasses.dataclass(frozen=True)
class RangeEstimatorConfig:
    method: RangeMethod = RangeMethod.current_minmax
    percentile: Optional[float] = None
    momentum: float = 0.9  # running_minmax EMA (range_estimators.py:172-175)
    num_candidates: int = 100
    opt_method: OptMethod = OptMethod.grid
    range_margin: float = 0.5


# ---------------------------------------------------------------------------
# Reduction to (xmin, xmax) — shared by the min-max family
# ---------------------------------------------------------------------------


def _axis_view(x: Array, axis: int) -> Array:
    """Transpose ``axis`` to the front and flatten the rest
    (range_estimators.py:82-85)."""
    if axis != 0:
        x = jnp.moveaxis(x, axis, 0)
    return x.reshape(x.shape[0], -1)


def _group_min_max(x2d: Array, n_groups: int,
                   perm: Optional[Array]) -> Tuple[Array, Array]:
    """Per-group min/max broadcast back to channels
    (range_estimators.py:87-112).

    ``perm`` is the channel permutation (argsort of recorded per-channel
    ranges); results are scattered back through its inverse, mirroring the
    reference's ``P.T.mv``.
    """
    c = x2d.shape[0]
    assert n_groups > 0 and c % n_groups == 0, (c, n_groups)
    if perm is not None:
        x2d = x2d[perm]
    g = x2d.reshape(n_groups, -1)
    m = jnp.repeat(jnp.min(g, axis=-1), c // n_groups)
    M = jnp.repeat(jnp.max(g, axis=-1), c // n_groups)
    if perm is not None:
        inv = jnp.argsort(perm)
        m, M = m[inv], M[inv]
    return m, M


def reduce_min_max(x: Array, rs: ReduceSpec, percentile: Optional[float] = None,
                   perm: Optional[Array] = None) -> Tuple[Array, Array]:
    """Reduce a tensor to its (min, max) range under ``rs``.

    Reproduces ``CurrentMinMaxEstimator.forward`` branch-for-branch,
    including the asymmetric per-tensor percentile quirk — per-tensor uses
    percentiles ``(p, 100)`` while per-channel uses ``(p, 100-p)``
    (range_estimators.py:121-127 vs :133-140).
    """
    if rs.axis is not None:
        x2d = _axis_view(x, rs.axis)
        if rs.n_groups is not None:
            return _group_min_max(x2d, rs.n_groups, perm)
        return jnp.min(x2d, axis=-1), jnp.max(x2d, axis=-1)
    if rs.per_channel:
        x2d = x.reshape(x.shape[0], -1)
        if percentile:
            lo = jnp.percentile(x2d, percentile, axis=-1)
            hi = jnp.percentile(x2d, 100.0 - percentile, axis=-1)
            return lo, hi
        return jnp.min(x2d, axis=-1), jnp.max(x2d, axis=-1)
    if percentile:
        lo = jnp.percentile(x, percentile)
        hi = jnp.percentile(x, 100.0)
        return jnp.atleast_1d(lo), jnp.atleast_1d(hi)
    return jnp.min(x), jnp.max(x)


def channel_dynamic_ranges(x: Array, axis: int) -> Array:
    """Per-channel ``max - min`` used by the PEG permutation pre-pass
    (range_estimators.py:68-80). The reference's momentum update degenerates
    to 'last batch wins' (its EMA combines the new ranges with themselves,
    range_estimators.py:78-79); we reproduce that effective behavior by
    simply returning the current batch's ranges."""
    x2d = _axis_view(x, axis)
    return jnp.max(x2d, axis=-1) - jnp.min(x2d, axis=-1)


# ---------------------------------------------------------------------------
# Min-max family: pure state updates
# ---------------------------------------------------------------------------


def init_range_state(shape: Tuple[int, ...]) -> dict:
    """Fixed-shape estimator state: range + initialized flag."""
    return {
        "xmin": jnp.zeros(shape, jnp.float32),
        "xmax": jnp.zeros(shape, jnp.float32),
        "initialized": jnp.zeros((), jnp.bool_),
    }


def update_range_state(state: dict, x: Array, cfg: RangeEstimatorConfig,
                       rs: ReduceSpec, perm: Optional[Array] = None) -> dict:
    """One estimator step of the min-max family (jit-friendly).

    - current_minmax: replace (range_estimators.py:62-145)
    - allminmax: envelope (range_estimators.py:148-169; per-tensor /
      per-channel only, as in the reference)
    - running_minmax: EMA with momentum (range_estimators.py:209-214)
    """
    if cfg.method == RangeMethod.current_minmax:
        m, M = reduce_min_max(x, rs, cfg.percentile, perm)
        return {"xmin": jnp.broadcast_to(m, state["xmin"].shape).astype(jnp.float32),
                "xmax": jnp.broadcast_to(M, state["xmax"].shape).astype(jnp.float32),
                "initialized": jnp.ones((), jnp.bool_)}

    if cfg.method == RangeMethod.allminmax:
        rs_all = ReduceSpec(per_channel=rs.per_channel)  # no axis/group support
        m, M = reduce_min_max(x, rs_all)
        m = jnp.broadcast_to(m, state["xmin"].shape).astype(jnp.float32)
        M = jnp.broadcast_to(M, state["xmax"].shape).astype(jnp.float32)
        init = state["initialized"]
        return {"xmin": jnp.where(init, jnp.minimum(state["xmin"], m), m),
                "xmax": jnp.where(init, jnp.maximum(state["xmax"], M), M),
                "initialized": jnp.ones((), jnp.bool_)}

    if cfg.method == RangeMethod.running_minmax:
        rs_run = dataclasses.replace(rs, permute=False)
        m, M = reduce_min_max(x, rs_run)  # no permutation in running mode
        m = jnp.broadcast_to(m, state["xmin"].shape).astype(jnp.float32)
        M = jnp.broadcast_to(M, state["xmax"].shape).astype(jnp.float32)
        init = state["initialized"]
        mom = cfg.momentum
        return {"xmin": jnp.where(init, (1 - mom) * m + mom * state["xmin"], m),
                "xmax": jnp.where(init, (1 - mom) * M + mom * state["xmax"], M),
                "initialized": jnp.ones((), jnp.bool_)}

    raise ValueError(f"update_range_state does not handle {cfg.method}; "
                     f"use MSERangeEstimator for MSE/cross-entropy")


def finalize_ranges(state: dict) -> Tuple[Array, Array]:
    return state["xmin"], state["xmax"]


# ---------------------------------------------------------------------------
# Golden-section bounded scalar minimization (JAX-native, vmappable)
# ---------------------------------------------------------------------------

_INVPHI = (np.sqrt(5.0) - 1.0) / 2.0  # 0.618...
_INVPHI2 = (3.0 - np.sqrt(5.0)) / 2.0  # 0.382...


def golden_section_minimize(fn, lo, hi, num_iters: int = 64):
    """Minimize ``fn`` on [lo, hi] by golden-section search.

    JAX-native replacement for the reference's
    ``scipy.optimize.minimize_scalar(..., method='Bounded')`` calls
    (range_estimators.py:321-326, :429-434, :449-463). Runs as a
    ``lax.fori_loop`` so it jits and vmaps (e.g. over channels). 64 iterations
    shrink the bracket by ~1e-13, far below scipy's 1e-5 default tolerance.
    """
    lo = jnp.asarray(lo, jnp.float32)
    hi = jnp.asarray(hi, jnp.float32)
    c = hi - _INVPHI * (hi - lo)
    d = lo + _INVPHI * (hi - lo)
    # keep the loop carry dtype-stable (fn may compute in f64 under
    # --double / jax_enable_x64)
    cdt = jnp.result_type(fn(c), jnp.float32)
    lo, hi, c, d = (v.astype(cdt) for v in (lo, hi, c, d))

    def body(_, carry):
        lo, hi, c, d, fc, fd = carry
        shrink_right = fc < fd  # keep [lo, d]
        new_lo = jnp.where(shrink_right, lo, c)
        new_hi = jnp.where(shrink_right, d, hi)
        new_c = (new_hi - _INVPHI * (new_hi - new_lo)).astype(cdt)
        new_d = (new_lo + _INVPHI * (new_hi - new_lo)).astype(cdt)
        new_fc = jnp.where(shrink_right, fn(new_c).astype(cdt), fd)
        new_fd = jnp.where(shrink_right, fc, fn(new_d).astype(cdt))
        # NOTE: the reuse above is the classic golden-section trick — one new
        # evaluation per iteration; when shrinking right, old c becomes new d.
        return new_lo, new_hi, new_c, new_d, new_fc, new_fd

    init = (lo, hi, c, d, fn(c).astype(cdt), fn(d).astype(cdt))
    lo, hi, c, d, fc, fd = jax.lax.fori_loop(0, num_iters, body, init)
    x = jnp.where(fc < fd, c, d)
    return x


# ---------------------------------------------------------------------------
# MSE / cross-entropy estimators (host-orchestrated, TPU-vectorized)
# ---------------------------------------------------------------------------


def _fq_with_range(spec: Q.QuantizerSpec, x: Array, neg_thr, pos_thr) -> Array:
    """Quantize ``x`` per-tensor with a candidate clipping range — the
    reference's temp-quantizer trick (range_estimators.py:287-294, which
    forces ``per_channel=False`` on the copy)."""
    qp = Q.set_quant_range(spec, neg_thr, pos_thr)
    return Q.fake_quant(spec, qp, x)


def _mse_loss(spec, x, neg_thr, pos_thr, per_channel: bool):
    """sum_i ||x_i - Q(x_i)||^2, optionally per leading channel
    (range_estimators.py:248-256)."""
    y = _fq_with_range(spec, x, neg_thr, pos_thr)
    d2 = jnp.atleast_1d((x - y) ** 2)  # 0-d when vmapping 1-D weights'
    sq = d2.reshape(d2.shape[0], -1).sum(axis=1)  # per-channel scalars
    return sq if per_channel else sq.sum()


def _ce_loss(spec, x, neg_thr, pos_thr, per_channel: bool):
    """H(softmax(x), log_softmax(Q(x))) along dim 1
    (range_estimators.py:498-502)."""
    y = _fq_with_range(spec, x, neg_thr, pos_thr)
    logq = jax.nn.log_softmax(y, axis=1)
    p = jax.nn.softmax(x, axis=1)
    loss = jnp.sum(-p * logq)
    if per_channel:
        # kept for API uniformity; the reference's CE loss is always global
        return jnp.broadcast_to(loss, (x.shape[0],))
    return loss


class MSERangeEstimator:
    """MSE / cross-entropy range search (range_estimators.py:228-502).

    Host-orchestrated: the one-sidedness decision and the search-space
    allocation happen on the first batch (range_estimators.py:472-481);
    loss evaluation over the candidate grid is a single vmapped TPU kernel,
    and golden-section searches run as jitted ``fori_loop``s.

    Grid losses accumulate across batches without momentum
    (range_estimators.py:356-420). Golden-section re-optimizes on each batch
    (last call wins), as in the reference.
    """

    def __init__(self, spec: Q.QuantizerSpec, cfg: RangeEstimatorConfig,
                 per_channel: bool = False, cross_entropy: bool = False):
        self.spec = spec
        self.cfg = cfg
        self.per_channel = per_channel
        self.loss_fn = _ce_loss if cross_entropy else _mse_loss
        self.max_int_skew = (2 ** spec.n_bits) // 4  # range_estimators.py:246
        self.one_sided: Optional[bool] = None
        self.loss_array: Optional[np.ndarray] = None
        self.max_pos_thr = self.max_neg_thr = self.max_search_range = None
        self.xmin = self.xmax = None

    # -- search-range definition (range_estimators.py:329-354) -------------
    def _define_search_range(self, x: np.ndarray):
        n_ch = x.shape[0] if self.per_channel else 1
        self.channel_groups = n_ch
        m = self.cfg.range_margin
        if self.one_sided or self.spec.symmetric:
            self.loss_array = np.zeros((n_ch, self.cfg.num_candidates + 1))
            self.loss_array[:, 0] = np.inf
            self.max_pos_thr = max(abs(float(x.min())), float(x.max())) + m
            self.max_neg_thr = -self.max_pos_thr
            self.max_search_range = self.max_pos_thr
        else:
            self.loss_array = np.zeros(
                (n_ch, self.cfg.num_candidates + 1, self.max_int_skew, 2))
            self.loss_array[:, 0, :, :] = np.inf
            self.max_pos_thr = float(x.max()) + m
            self.max_neg_thr = float(x.min()) - m
            self.max_search_range = max(abs(self.max_pos_thr),
                                        abs(self.max_neg_thr))

    @property
    def step_size(self):
        return self.max_search_range / self.cfg.num_candidates

    def update(self, x) -> None:
        x = jnp.asarray(x, jnp.float32)
        if self.one_sided is None:
            self.one_sided = bool(jnp.min(x) >= 0)
            self._define_search_range(np.asarray(x))
        if self.cfg.opt_method == OptMethod.grid:
            if self.one_sided or self.spec.symmetric:
                self._grid_1d(x)
            else:
                self._grid_2d(x)
        else:
            if self.one_sided or self.spec.symmetric:
                self._golden_symmetric(x)
            else:
                self._golden_asymmetric(x)

    def finalize(self) -> Tuple[Array, Array]:
        if self.xmin is None:
            raise RuntimeError("no data passed through the MSE range estimator")
        if self.per_channel:
            return jnp.asarray(self.xmin), jnp.asarray(self.xmax)
        return (jnp.asarray(self.xmin).reshape(()),
                jnp.asarray(self.xmax).reshape(()))

    # -- 1-D grid (range_estimators.py:356-376) -----------------------------
    def _grid_1d(self, x: Array):
        # Candidate thresholds are computed in float64 and only then rounded
        # to f32 — exactly what the reference does (Python-float threshold
        # arithmetic at range_estimators.py:362-364, cast to f32 inside
        # ``set_quant_range``). Building the grid in f32 shifts borderline
        # elements' rounding and flips argmin on near-tied candidates.
        step = self.step_size
        cand = np.arange(1, self.cfg.num_candidates + 1, dtype=np.float64)
        pos64 = step * cand
        neg64 = np.zeros_like(pos64) if self.one_sided else -pos64
        pos = jnp.asarray(pos64, jnp.float32)
        neg = jnp.asarray(neg64, jnp.float32)

        @jax.jit
        def all_losses(x):
            return jax.vmap(lambda n, p: self.loss_fn(
                self.spec, x, n, p, self.per_channel))(neg, pos)

        losses = np.asarray(all_losses(x))  # (num_cand,) or (num_cand, C)
        if self.per_channel:
            self.loss_array[:, 1:] += losses.T
        else:
            self.loss_array[0, 1:] += losses
        best = self.loss_array.argmin(axis=1)
        self.xmax = (step * best).astype(np.float32)
        self.xmin = (np.zeros(self.channel_groups) if self.one_sided
                     else -step * best).astype(np.float32)

    # -- 2-D grid (range_estimators.py:378-420) -----------------------------
    def _grid_2d(self, x: Array):
        # Threshold grid in float64 -> f32, matching the reference's
        # Python-float arithmetic (range_estimators.py:389-399); see _grid_1d.
        step = self.step_size
        n_bits = self.spec.n_bits
        cand = np.arange(1, self.cfg.num_candidates + 1, dtype=np.float64)
        shift = np.arange(self.max_int_skew, dtype=np.float64)
        sign = np.asarray([1.0, -1.0])

        finish = step * cand  # (N,)
        start = -finish
        delta = (finish - start) / (2.0 ** n_bits - 1)  # (N,)
        skew = (sign[None, None, :] * shift[None, :, None]
                * delta[:, None, None])  # (N, S, 2)
        neg = np.maximum(start[:, None, None] + skew, self.max_neg_thr)
        pos = np.minimum(finish[:, None, None] + skew, self.max_pos_thr)

        flat_neg = jnp.asarray(neg.reshape(-1), jnp.float32)
        flat_pos = jnp.asarray(pos.reshape(-1), jnp.float32)

        @jax.jit
        def all_losses(x):
            return jax.vmap(lambda n, p: self.loss_fn(
                self.spec, x, n, p, self.per_channel))(flat_neg, flat_pos)

        losses = np.asarray(all_losses(x))
        shape = (self.cfg.num_candidates, self.max_int_skew, 2)
        if self.per_channel:
            self.loss_array[:, 1:] += np.moveaxis(
                losses.reshape(shape + (-1,)), -1, 0)
        else:
            self.loss_array[0, 1:] += losses.reshape(shape)

        for ch in range(self.channel_groups):
            c, s, r = np.unravel_index(np.argmin(self.loss_array[ch]),
                                       self.loss_array[ch].shape)
            st, fi = -self.step_size * c, self.step_size * c
            d = float(fi - st) / (2.0 ** n_bits - 1)
            sk = ((-1.0) ** r) * s * d
            xmin = max(st + sk, self.max_neg_thr)
            xmax = min(fi + sk, self.max_pos_thr)
            if self.xmin is None or np.ndim(self.xmin) == 0 \
                    or len(np.atleast_1d(self.xmin)) != self.channel_groups:
                self.xmin = np.zeros(self.channel_groups, np.float32)
                self.xmax = np.zeros(self.channel_groups, np.float32)
            self.xmin[ch], self.xmax[ch] = xmin, xmax

    # -- golden section, symmetric (range_estimators.py:422-440) ------------
    def _golden_symmetric(self, x: Array):
        one_sided = self.one_sided
        lo = 0.01 * self.max_search_range
        hi = self.max_search_range

        @functools.partial(jax.jit, static_argnames=())
        def solve(data):
            def loss(r):
                neg = jnp.where(one_sided, 0.0, -r)
                return self.loss_fn(self.spec, data, neg, r, False)
            best = golden_section_minimize(loss, lo, hi)
            return best

        if self.per_channel:
            xs = jax.vmap(solve)(x)
            self.xmax = np.asarray(xs, np.float32)
            self.xmin = (np.zeros_like(self.xmax) if one_sided
                         else -self.xmax)
        else:
            r = float(solve(x))
            self.xmax = np.float32(r)
            self.xmin = np.float32(0.0 if one_sided else -r)

    # -- golden section, asymmetric nested search ---------------------------
    # (range_estimators.py:305-327, :442-470): outer search over the range,
    # inner search over the shift, both golden-section.
    def _golden_asymmetric(self, x: Array):
        lo = 0.01 * self.max_search_range
        hi = self.max_search_range
        n_bits = self.spec.n_bits
        max_int_skew = self.max_int_skew

        def shift_loss(shift, rng, data):
            return self.loss_fn(self.spec, data, -rng + shift, rng + shift,
                                False)

        def inner_best_shift(rng, data):
            temp_delta = 2 * rng / (2.0 ** n_bits - 1)
            max_shift = temp_delta * max_int_skew
            return golden_section_minimize(
                lambda s: shift_loss(s, rng, data), -max_shift, max_shift,
                num_iters=48)

        @jax.jit
        def solve(data):
            def range_loss(rng):
                s = inner_best_shift(rng, data)
                return shift_loss(s, rng, data)
            best_rng = golden_section_minimize(range_loss, lo, hi,
                                               num_iters=48)
            best_shift = inner_best_shift(best_rng, data)
            return best_rng, best_shift

        if self.per_channel:
            rngs, shifts = jax.vmap(solve)(x)
            self.xmax = np.asarray(rngs + shifts, np.float32)
            self.xmin = np.asarray(-rngs + shifts, np.float32)
        else:
            rng, shift = solve(x)
            self.xmax = np.float32(float(rng) + float(shift))
            self.xmin = np.float32(-float(rng) + float(shift))


def make_estimator(spec: Q.QuantizerSpec, cfg: RangeEstimatorConfig,
                   per_channel: bool = False):
    """Estimator factory for the host-orchestrated calibration path."""
    if cfg.method in (RangeMethod.MSE, RangeMethod.cross_entropy):
        return MSERangeEstimator(
            spec, cfg, per_channel=per_channel,
            cross_entropy=cfg.method == RangeMethod.cross_entropy)
    raise ValueError(
        f"{cfg.method} is a pure-update estimator; use update_range_state")
