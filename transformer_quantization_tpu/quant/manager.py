"""Functional quantization state threading.

The reference pairs every quantizer with a range estimator inside a stateful
``QuantizationManager`` whose behavior is switched by a runtime ``Qstates``
machine (reference: quantization/quantization_manager.py:19-112). In JAX,
mutation is replaced by *state threading*: a :class:`QuantCtx` is created per
forward pass, models call ``ctx.act(name, x)`` / ``ctx.weight(name, w)`` at
every quantization site, and the updated per-site state is returned alongside
the model outputs. Phase switching (estimate/fix/learn/record) is static jit
specialization via :class:`~.qconfig.QuantMode`.

Per-site state layout (a pytree):

- activation sites: ``{"qp": QuantParams, "range_state": {xmin, xmax,
  initialized}, "perm": int32[C] | None, "ranges": float32[C] | None}``
  (``perm``/``ranges`` only for PEG permutation sites,
  range_estimators.py:68-80, :92-109)
- weight sites: ``{"qp": QuantParams, "alpha": Array | None}`` (``alpha`` =
  AdaRound rounding logits, quantization/adaround/quantizer.py:56-71)
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional

import jax
import jax.numpy as jnp

from transformer_quantization_tpu.quant import quantizers as Q
from transformer_quantization_tpu.quant import ranges as R
from transformer_quantization_tpu.quant.qconfig import (
    Phase,
    QuantMode,
    QuantModelConfig,
    QuantSiteConfig,
)

Array = jax.Array
SiteState = Dict[str, object]

_MSE_METHODS = (R.RangeMethod.MSE, R.RangeMethod.cross_entropy)


def _reduced_qp(cfg: QuantSiteConfig, xmin: Array, xmax: Array) -> Q.QuantParams:
    return Q.set_quant_range(cfg.spec, xmin, xmax)


def init_act_site_state(cfg: QuantSiteConfig, x_shape) -> SiteState:
    shape = cfg.ranges_shape(x_shape)
    qp = Q.QuantParams(delta=jnp.ones(shape, jnp.float32),
                       zero_float=jnp.zeros(shape, jnp.float32),
                       signed=jnp.zeros((), jnp.float32))
    state: SiteState = {"qp": qp, "range_state": R.init_range_state(shape)}
    if cfg.permute:
        c = shape[0]
        state["perm"] = jnp.arange(c, dtype=jnp.int32)
        state["ranges"] = jnp.zeros((c,), jnp.float32)
    return state


def estimate_weight_qp(cfg: QuantSiteConfig, w: Array) -> Q.QuantParams:
    """estimate_ranges_train for a weight: re-derive the range from the
    current (training-updated) weight each step. Min-max only —
    jit-compatible (quantization_manager.py:94-106). Shared by
    QuantCtx.weight and the int8-QAT matmul path (ops/layers.py) so the
    two forwards can never diverge in estimate mode."""
    rc = cfg.range_cfg
    if rc.method in _MSE_METHODS:
        raise NotImplementedError(
            "MSE weight range estimation inside a jitted step; "
            "initialize weight ranges up front instead")
    rs = R.ReduceSpec(per_channel=cfg.per_channel)
    xmin, xmax = R.reduce_min_max(
        w, rs, rc.percentile
        if rc.method == R.RangeMethod.current_minmax else None)
    return _reduced_qp(cfg, xmin, xmax)


def init_weight_site_state(cfg: QuantSiteConfig, w: Array,
                           mse_estimator=None) -> SiteState:
    """Estimate a weight site's range directly from its (static) weight.

    The reference re-estimates weight ranges on every calibration forward
    from the same unchanging tensor (hijacker.py:72-86 →
    quantization_manager.py:94-106); doing it once up front is equivalent
    and is how the functional design initializes weight quantizers.
    """
    rs = R.ReduceSpec(per_channel=cfg.per_channel)
    rc = cfg.range_cfg
    if rc.method in _MSE_METHODS:
        est = mse_estimator or R.make_estimator(cfg.spec, rc, cfg.per_channel)
        est.update(w)
        xmin, xmax = est.finalize()
    elif rc.method == R.RangeMethod.current_minmax:
        xmin, xmax = R.reduce_min_max(w, rs, rc.percentile)
    else:  # all/running minmax on a single static tensor == current minmax
        xmin, xmax = R.reduce_min_max(w, rs)
    if cfg.per_channel:
        xmin = jnp.reshape(xmin, (-1,))
        xmax = jnp.reshape(xmax, (-1,))
    else:
        xmin = jnp.reshape(xmin, ())
        xmax = jnp.reshape(xmax, ())
    return {"qp": _reduced_qp(cfg, xmin, xmax), "alpha": None}


def init_weight_qstate(cfg: QuantModelConfig,
                       weights: Mapping[str, Array]) -> Dict[str, SiteState]:
    """Initialize all weight sites from a {site_name: weight} mapping."""
    out = {}
    for name, site_cfg in cfg.items():
        if site_cfg.kind == "weight" and name in weights:
            out[name] = init_weight_site_state(site_cfg, weights[name])
    return out


class QuantCtx:
    """Per-forward quantization context.

    Create one per ``apply`` call; models invoke :meth:`weight` and
    :meth:`act` at each site; collect the updated state with
    :meth:`export`. Under ``jit`` the dict mutation happens at trace time
    and compiles to pure dataflow.
    """

    def __init__(self, cfg: QuantModelConfig, qstate: Mapping[str, SiteState],
                 mode: QuantMode, mse_session: Optional[Dict] = None):
        self.cfg = cfg
        self.mode = mode
        self.qstate: Dict[str, SiteState] = dict(qstate)
        # Host-side MSE/cross-entropy estimators, persisted across calibration
        # batches by a CalibrationSession (eager-only).
        self.mse_session = mse_session

    # -- weights ------------------------------------------------------------

    def weight(self, name: str, w: Array) -> Array:
        if name not in self.cfg:
            return w
        cfg = self.cfg[name]
        assert cfg.kind == "weight", name
        if not (self.mode.weight_quant and cfg.enabled):
            return w
        phase = self.mode.weight_phase
        if phase == Phase.estimate:
            qp = estimate_weight_qp(cfg, w)
            self.qstate[name] = dict(self.qstate.get(name, {"alpha": None}),
                                     qp=qp)
        else:
            qp = self.qstate[name]["qp"]
        alpha = self.qstate.get(name, {}).get("alpha", None)
        axis = 0 if cfg.per_channel else None
        if alpha is not None:
            return Q.adaround_fake_quant(
                Q.AdaRoundMode.learned_hard_sigmoid, cfg.spec, qp, w, alpha,
                soft=False, axis=axis)
        return Q.fake_quant(cfg.spec, qp, w, axis=axis)

    # -- activations ----------------------------------------------------------

    def act(self, name: str, x: Array) -> Array:
        if name not in self.cfg:
            return x
        cfg = self.cfg[name]
        assert cfg.kind == "act", name
        cap = getattr(self, "capture_sites", None)
        if cap and name in cap:
            # standalone act sites (residual sums, attn scores, ...) are
            # capturable like layers — feeds the in-forward histogram
            # telemetry (reference: utils/tb_utils.py:26-52 hooks)
            self.captures = getattr(self, "captures", {})
            self.captures[name] = (x, x)
        if not (self.mode.act_quant and cfg.enabled):
            return x
        phase = self.mode.act_phase

        if (phase == Phase.fix and cfg.axis is None
                and name in getattr(self, "requant_only_sites", ())):
            # int-engine shortcut: every consumer of this site re-quantizes
            # with the site's own params, and round(fq(x)/s) == round(x/s)
            # at fixed per-tensor ranges — so the producer-side fake-quant
            # pass is a no-op numerically and is skipped for bandwidth
            return x

        if phase == Phase.record_ranges:
            # PEG permutation pre-pass: record per-channel dynamic ranges,
            # pass through unquantized (quantization_manager.py:95-97).
            if cfg.permute:
                st = self.qstate.get(name) or init_act_site_state(cfg, x.shape)
                st = dict(st,
                          ranges=R.channel_dynamic_ranges(x, cfg.axis or 2))
                self.qstate[name] = st
            return x

        if name not in self.qstate:
            # Lazily created on the first (eager) calibration batch; shapes
            # come from the data.
            self.qstate[name] = init_act_site_state(cfg, x.shape)
        st = dict(self.qstate[name])

        if phase == Phase.estimate:
            rc = cfg.range_cfg
            if rc.method in _MSE_METHODS:
                if self.mse_session is None:
                    raise RuntimeError(
                        f"site {name!r} uses {rc.method} act ranges; run "
                        "calibration through a CalibrationSession")
                est = self.mse_session.setdefault(
                    name, R.make_estimator(cfg.spec, rc))
                est.update(jax.lax.stop_gradient(x))
                xmin, xmax = est.finalize()
            else:
                st["range_state"] = R.update_range_state(
                    st["range_state"], jax.lax.stop_gradient(x), rc,
                    cfg.reduce_spec, perm=st.get("perm"))
                xmin, xmax = R.finalize_ranges(st["range_state"])
            st["qp"] = _reduced_qp(cfg, xmin, xmax)
            self.qstate[name] = st

        qp = st["qp"]
        return Q.fake_quant(cfg.spec, qp, x, axis=cfg.axis)

    # -- export --------------------------------------------------------------

    def export(self) -> Dict[str, SiteState]:
        return self.qstate


def reset_act_ranges(cfg: QuantModelConfig,
                     qstate: Mapping[str, SiteState]) -> Dict[str, SiteState]:
    """Zero out activation range state so it can be re-estimated —
    ``QuantizedModel.reset_act_ranges`` (base_quantized_model.py:96-102).
    Permutation state (perm/ranges) is preserved."""
    out = dict(qstate)
    for name, site_cfg in cfg.items():
        if site_cfg.kind != "act" or name not in out:
            continue
        st = dict(out[name])
        rs = st["range_state"]
        st["range_state"] = {
            "xmin": jnp.zeros_like(rs["xmin"]),
            "xmax": jnp.zeros_like(rs["xmax"]),
            "initialized": jnp.zeros((), jnp.bool_),
        }
        st["qp"] = QuantParamsReset(st["qp"])
        out[name] = st
    return out


def QuantParamsReset(qp: Q.QuantParams) -> Q.QuantParams:
    return Q.QuantParams(delta=jnp.ones_like(qp.delta),
                         zero_float=jnp.zeros_like(qp.zero_float),
                         signed=jnp.zeros_like(qp.signed))


def finalize_permutations(cfg: QuantModelConfig,
                          qstate: Mapping[str, SiteState]) -> Dict[str, SiteState]:
    """Convert recorded per-channel ranges into sort permutations.

    The reference sorts channels by dynamic range inside the estimator on
    every call (range_estimators.py:92-109); we precompute ``argsort`` once
    after the recording pre-pass — a static gather thereafter.
    """
    out = dict(qstate)
    for name, site_cfg in cfg.items():
        if site_cfg.kind == "act" and site_cfg.permute and name in out:
            st = dict(out[name])
            if st.get("ranges") is not None:
                st["perm"] = jnp.argsort(st["ranges"]).astype(jnp.int32)
            out[name] = st
    return out


def share_ranges(qstate: Mapping[str, SiteState], source: str,
                 targets) -> Dict[str, SiteState]:
    """Copy recorded permutation ranges from one site to others —
    the ``--per-groups-permute-shared-h`` option (main.py:539-557)."""
    out = dict(qstate)
    src = out[source]["ranges"]
    assert src is not None, f"source site {source} has no recorded ranges"
    for t in targets:
        if t in out and "ranges" in out[t]:
            out[t] = dict(out[t], ranges=src)
    return out
