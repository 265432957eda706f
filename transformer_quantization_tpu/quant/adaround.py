"""AdaRound: learned per-weight rounding (PTQ).

Capability parity with the reference's AdaRound stack
(reference: quantization/adaround/{quantizer,utils,adaround,config}.py),
re-architected for TPU:

- layer I/O capture: the reference uses forward hooks + a StopForward
  exception (adaround/utils.py:175-233); here the model's functional
  forward records (input, output) at named sites (ops/layers.py capture),
  with the asymmetric mode's "quantized prefix" realized by running the
  capture pass with weights quantized (adaround/utils.py:220-227).
- the per-layer optimization loop — Adam on the rounding logits ``alpha``
  over cached (inp, out) batches (adaround/adaround.py:204-260) — runs as a
  single jitted ``lax.fori_loop``: one device program per layer shape
  instead of ``iters`` Python-side dispatches.
- ``CombinedLoss`` = reconstruction MSE (summed over dim 1, meaned over the
  rest — adaround/utils.py:147-151) + annealed rounding regularizer
  ``weight * sum(1 - |2h-1|^b)`` with warmup (adaround/utils.py:152-171).
- ``TempDecay`` b-annealing schedules: linear/cosine/sigmoid/power/exp/log
  (adaround/utils.py:93-128).
- grid init modes: range_estimator (keep), mse (80-step absmax shrink on
  weight MSE), mse_out / mse_out_asym (layer-output MSE)
  (adaround/adaround.py:160-201).
"""

from __future__ import annotations

import dataclasses
import enum
import logging
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from transformer_quantization_tpu.quant import quantizers as Q

logger = logging.getLogger("AdaRound")

Array = jax.Array


class AdaRoundInitMode(enum.Enum):
    range_estimator = "range_estimator"
    mse = "mse"
    mse_out = "mse_out"
    mse_out_asym = "mse_out_asym"


class AdaRoundTempDecayType(enum.Enum):
    linear = "linear"
    cosine = "cosine"
    sigmoid = "sigmoid"
    power = "power"
    exp = "exp"
    log = "log"


class AdaRoundActQuantMode(enum.Enum):
    no_act_quant = "no_act_quant"
    post_adaround = "post_adaround"


@dataclasses.dataclass(frozen=True)
class AdaRoundConfig:
    """Defaults = DEFAULT_ADAROUND_CONFIG (adaround/config.py:17-38)."""

    layers: Tuple[str, ...] = ("all",)
    num_samples: int = 1024
    init: AdaRoundInitMode = AdaRoundInitMode.range_estimator
    round_mode: Q.AdaRoundMode = Q.AdaRoundMode.learned_hard_sigmoid
    asym: bool = True
    include_act_func: bool = True
    lr: float = 1e-3
    iters: int = 1000
    weight: float = 0.01
    annealing: Tuple[float, float] = (20.0, 2.0)
    decay_type: AdaRoundTempDecayType = AdaRoundTempDecayType.cosine
    decay_shape: float = 1.0
    decay_start: float = 0.0
    warmup: float = 0.2
    act_quant_mode: AdaRoundActQuantMode = AdaRoundActQuantMode.post_adaround
    batch_size: int = 32


def temp_decay(t, cfg: AdaRoundConfig):
    """b(t) annealing (adaround/utils.py:93-128), traceable in jit."""
    t_max = cfg.iters
    start_b, end_b = cfg.annealing
    decay_start = (cfg.warmup + (1.0 - cfg.warmup) * cfg.decay_start) * t_max
    rel_t = (t - decay_start) / (t_max - decay_start)
    rel_t = jnp.clip(rel_t, 0.0, 1.0)
    d = cfg.decay_shape
    kind = cfg.decay_type
    if kind == AdaRoundTempDecayType.linear:
        b = end_b + (start_b - end_b) * jnp.maximum(0.0, 1 - rel_t)
    elif kind == AdaRoundTempDecayType.cosine:
        b = end_b + 0.5 * (start_b - end_b) * (1 + jnp.cos(rel_t * jnp.pi))
    elif kind == AdaRoundTempDecayType.sigmoid:
        offset = jax.nn.sigmoid(-d / 2)
        rel_p = (jax.nn.sigmoid(d * (rel_t - 0.5)) - offset) / (1 - 2 * offset)
        b = start_b + (end_b - start_b) * rel_p
    elif kind == AdaRoundTempDecayType.power:
        b = end_b + (start_b - end_b) * (1 - rel_t ** d)
    elif kind == AdaRoundTempDecayType.exp:
        rel_p = (1.0 - jnp.exp(-d * rel_t)) / (1.0 - np.exp(-d))
        b = start_b + (end_b - start_b) * rel_p
    elif kind == AdaRoundTempDecayType.log:
        C = np.exp(end_b / d)
        c = np.exp(start_b / d)
        # (C-c)*rel_t + c rewritten as a convex blend — the raw form
        # catastrophically cancels in float32 when start_b is large
        b = d * jnp.log(c * (1.0 - rel_t) + C * rel_t)
    else:
        raise ValueError(kind)
    return jnp.where(t < decay_start, start_b, b)


def combined_loss(pred, tgt, alpha, t, cfg: AdaRoundConfig,
                  temperature=None):
    """Reconstruction + rounding regularizer (adaround/utils.py:131-172)."""
    # reference: mse(pred, tgt, reduction='none').sum(1).mean() — sum over
    # dim 1, mean over the remaining dims (adaround/utils.py:151)
    rec = jnp.mean(jnp.sum((pred - tgt) ** 2, axis=1))
    loss_start = cfg.iters * cfg.warmup
    b = temp_decay(t, cfg)
    if cfg.round_mode == Q.AdaRoundMode.sigmoid_temp_decay:
        round_loss = 0.0
    else:
        h = Q.adaround_rest(cfg.round_mode, alpha, temperature)
        reg = jnp.sum(1 - jnp.abs((h.reshape(-1) - 0.5) * 2) ** b)
        round_loss = jnp.where(t < loss_start, 0.0, cfg.weight * reg)
    return rec + round_loss, rec, round_loss


# ---------------------------------------------------------------------------
# Grid initialization (adaround/adaround.py:160-201)
# ---------------------------------------------------------------------------


def mse_grid_init(spec: Q.QuantizerSpec, w: Array,
                  loss_fn: Optional[Callable] = None) -> Q.QuantParams:
    """80-step absmax shrink search: s_i = absmax * (1 - 0.01 i); pick the
    s minimizing MSE(w, Q(w)) (or a layer-output loss)."""
    absmax = jnp.maximum(jnp.max(w), jnp.abs(jnp.min(w)))

    def score(i):
        s = absmax * (1.0 - 0.01 * i)
        qp = Q.set_quant_range(spec, -s, s)
        if loss_fn is None:
            return jnp.mean((w - Q.fake_quant(spec, qp, w)) ** 2)
        return loss_fn(qp)

    idxs = jnp.arange(80, dtype=jnp.float32)
    if loss_fn is None:
        scores = jax.vmap(score)(idxs)
    else:
        scores = jnp.stack([score(i) for i in np.arange(80.0)])
    best = absmax * (1.0 - 0.01 * idxs[jnp.argmin(scores)])
    return Q.set_quant_range(spec, -best, best)


# ---------------------------------------------------------------------------
# Per-layer optimization
# ---------------------------------------------------------------------------


def optimize_layer_rounding(layer_apply: Callable, spec: Q.QuantizerSpec,
                            qp: Q.QuantParams, w: Array,
                            cached_inp: Array, cached_out: Array,
                            cfg: AdaRoundConfig, per_channel_axis=0,
                            seed: int = 0) -> Tuple[Array, Dict]:
    """Optimize rounding logits alpha for one layer (jitted end-to-end).

    ``layer_apply(w_q, inp) -> out`` is the layer's real op with the
    quantized weight substituted (functional replacement for calling the
    hijacked module, adaround/adaround.py:235-260).
    """
    mode = cfg.round_mode
    temperature = cfg.annealing[0]
    axis = per_channel_axis if qp.delta.ndim else None
    alpha0 = Q.adaround_init_alpha(mode, spec, qp, w, axis=axis,
                                   temperature=temperature)

    def soft_weight(alpha, t):
        temp = (temp_decay(t, cfg)
                if mode == Q.AdaRoundMode.sigmoid_temp_decay else temperature)
        return Q.adaround_fake_quant(mode, spec, qp, w, alpha, soft=True,
                                     axis=axis, temperature=temp)

    n = cached_inp.shape[0]
    bs = min(cfg.batch_size, n)

    def loss_at(alpha, idx, t):
        inp = jnp.take(cached_inp, idx, axis=0)
        tgt = jnp.take(cached_out, idx, axis=0)
        pred = layer_apply(soft_weight(alpha, t), inp)
        total, rec, rnd = combined_loss(pred, tgt, alpha, t, cfg,
                                        temperature=temperature)
        return total

    import optax

    tx = optax.adam(cfg.lr)

    @jax.jit
    def run(alpha0, key):
        opt0 = tx.init(alpha0)

        def body(t, carry):
            alpha, opt_state, key = carry
            key, sub = jax.random.split(key)
            idx = jax.random.permutation(sub, n)[:bs]
            g = jax.grad(loss_at)(alpha, idx, t.astype(jnp.float32))
            updates, opt_state = tx.update(g, opt_state, alpha)
            alpha = optax.apply_updates(alpha, updates)
            return alpha, opt_state, key

        alpha, _, _ = jax.lax.fori_loop(0, cfg.iters, body,
                                        (alpha0, opt0, key))
        return alpha

    alpha = run(alpha0, jax.random.PRNGKey(seed))

    # before/after local losses (adaround/adaround.py:137-161)
    @jax.jit
    def local_losses(alpha):
        def mse(soft):
            w_q = Q.adaround_fake_quant(mode, spec, qp, w, alpha, soft=soft,
                                        axis=axis, temperature=temperature)
            pred = layer_apply(w_q, cached_inp[:bs])
            return jnp.mean((pred - cached_out[:bs]) ** 2)
        return mse(True), mse(False)

    s0, h0 = local_losses(alpha0)
    s1, h1 = local_losses(alpha)
    stats = {"loss_soft_before": float(s0), "loss_hard_before": float(h0),
             "loss_soft_after": float(s1), "loss_hard_after": float(h1)}
    logger.info("AdaRound local loss before (hard): %.7f -> after (hard): %.7f",
                stats["loss_hard_before"], stats["loss_hard_after"])
    return alpha, stats
