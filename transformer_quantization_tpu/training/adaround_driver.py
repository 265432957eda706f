"""Model-level AdaRound application.

Functional re-design of the reference's driver
(reference: utils/adaround_utils.py:35-139 + quantization/adaround/
adaround.py:27-135): sequentially per weighted layer — grid init, capture
layer (input, FP-output) over the calibration samples, optimize rounding
logits, store them — then re-estimate and fix activation ranges
(post_adaround mode).

Sequential fidelity: each layer's *input* is captured with all weights
quantized (asym mode), so earlier layers' already-learned roundings shape
later layers' optimization targets, exactly like the reference's
GetLayerInpOut quantized-prefix pass (adaround/utils.py:220-227).
"""

from __future__ import annotations

import logging
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from transformer_quantization_tpu.ops.layers import ACTIVATIONS
from transformer_quantization_tpu.quant import adaround as AR
from transformer_quantization_tpu.quant import quantizers as Q
from transformer_quantization_tpu.quant.qconfig import (
    Phase,
    QuantModelConfig,
    QuantMode,
)
from transformer_quantization_tpu.quant.manager import reset_act_ranges
from transformer_quantization_tpu.training.calibration import calibrate_model

logger = logging.getLogger("AdaRound")


def make_layer_apply(spec: Dict) -> Callable:
    """layer_apply(w_q, inp) -> out for one weighted layer kind."""
    kind = spec["kind"]
    if kind == "linear":
        b = spec.get("b")
        act = ACTIVATIONS[spec.get("act")]

        def apply(w_q, x, with_act=True):
            y = jnp.einsum("...i,oi->...o", x, w_q)
            if b is not None:
                y = y + b
            if act is not None and with_act:
                y = act(y)
            return y
        return apply
    if kind == "layernorm":
        b, eps = spec["b"], spec["eps"]

        def apply(scale_q, x, with_act=True):
            mean = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
            return (x - mean) * jax.lax.rsqrt(var + eps) * scale_q + b
        return apply
    if kind == "embedding":
        def apply(t_q, ids, with_act=True):
            return jnp.take(t_q, ids, axis=0)
        return apply
    if kind == "grouped_linear":
        g = spec["groups"]
        b = spec.get("b")
        act = ACTIVATIONS[spec.get("act")]

        def apply(w_q, x, with_act=True):
            out_f, in_g = w_q.shape
            lead = x.shape[:-1]
            xg = x.reshape(*lead, g, in_g)
            wg = w_q.reshape(g, out_f // g, in_g)
            y = jnp.einsum("...gi,goi->...go", xg, wg).reshape(*lead, out_f)
            if b is not None:
                y = y + b
            if act is not None and with_act:
                y = act(y)
            return y
        return apply
    if kind == "nonorm":
        # MobileBERT QuantNoNorm: the optimized "weight" is the stacked
        # [w; b] so one alpha covers both, like the reference's shared
        # AdaRound quantizer instance (quantized_mobilebert.py:58-72)
        def apply(wb_q, x, with_act=True):
            w_q, b_q = jnp.split(wb_q, 2)
            return x * w_q + b_q
        return apply
    raise ValueError(kind)


def get_train_samples(batches, num_samples: int) -> Dict[str, np.ndarray]:
    """Stack calibration rows (main.py:286-313 adaround_get_samples_fn)."""
    acc: Dict[str, List] = {}
    n = 0
    for b in batches:
        for k, v in b.items():
            acc.setdefault(k, []).append(np.asarray(v))
        n += len(np.asarray(b["input_ids"]))
        if n >= num_samples:
            break
    return {k: np.concatenate(v)[:num_samples] for k, v in acc.items()}


def _capture_layer_io(apply_fn, params, qcfg, qstate, samples, site,
                      batch_size, asym, act_quant, include_act_func):
    """Capture (inp, out): out under full precision, inp under quantized
    weights when asym (adaround/utils.py:198-233)."""
    fp_mode = QuantMode(weight_quant=False, act_quant=False)
    q_mode = QuantMode(weight_quant=True, act_quant=act_quant,
                       act_phase=Phase.fix)

    def run(mode, want):
        outs = []
        n = len(samples["input_ids"])

        @jax.jit
        def cap(params, qstate, batch):
            out, _ = apply_fn(params, batch, qcfg=qcfg, qstate=qstate,
                              mode=mode, capture_sites=(site,),
                              capture_pre_act=not include_act_func)
            x, y = out["captures"][site]
            return x if want == "inp" else y

        for s in range(0, n, batch_size):
            batch = {k: jnp.asarray(v[s:s + batch_size])
                     for k, v in samples.items()}
            outs.append(cap(params, qstate, batch))
        return jnp.concatenate(outs, axis=0)

    out = run(fp_mode, "out")
    inp = run(q_mode if asym else fp_mode, "inp")
    return inp, out


def apply_adaround_to_model(apply_fn, params, qcfg: QuantModelConfig,
                            qstate: Dict, layer_specs: List[Tuple[str, Dict]],
                            batches, cfg: AR.AdaRoundConfig, *,
                            batch_size: int = 32,
                            act_quant: bool = False,
                            range_est_batches=None,
                            num_est_batches: int = 1,
                            cross_entropy_layer: Optional[str] = None,
                            seed: int = 0,
                            stats_out: Optional[List] = None) -> Dict:
    """Apply AdaRound layer-by-layer; returns qstate with alphas stored.

    ``layer_specs`` comes from the model family (e.g.
    models/bert.py:bert_adaround_specs); ``cfg.layers`` filters it — 'all'
    or explicit site names (utils/adaround_utils.py:58-76).
    """
    samples = get_train_samples(batches, cfg.num_samples)
    samples.pop("labels", None)
    samples.pop("example_mask", None)

    if "all" not in cfg.layers:
        known = {name for name, _ in layer_specs}
        for name in cfg.layers:
            if name not in known:
                logger.warning("skipping unknown layer %s", name)
        layer_specs = [(n, s) for n, s in layer_specs if n in cfg.layers]
    if not layer_specs:
        logger.warning("No layers to apply AdaRound for, exiting...")
        return qstate

    # act quant disabled during optimization for both supported modes
    # (utils/adaround_utils.py:77-86)
    effective_act_quant = False

    qstate = dict(qstate)
    for name, spec in layer_specs:
        wsite = f"{name}.w"
        if wsite not in qcfg or not qcfg[wsite].enabled:
            continue
        site_cfg = qcfg[wsite]
        w = spec["w"]
        layer_apply = make_layer_apply(spec)
        st = dict(qstate[wsite])

        # grid init (adaround/adaround.py:34-44)
        if cfg.init == AR.AdaRoundInitMode.range_estimator:
            pass
        elif cfg.init == AR.AdaRoundInitMode.mse:
            st["qp"] = AR.mse_grid_init(site_cfg.spec, w)
            qstate[wsite] = st
        elif cfg.init in (AR.AdaRoundInitMode.mse_out,
                          AR.AdaRoundInitMode.mse_out_asym):
            inp0, out0 = _capture_layer_io(
                apply_fn, params, qcfg, qstate, samples, name, batch_size,
                asym=cfg.init == AR.AdaRoundInitMode.mse_out_asym,
                act_quant=effective_act_quant,
                include_act_func=cfg.include_act_func)

            def out_loss(qp, _inp=inp0[:batch_size], _out=out0[:batch_size],
                         _spec=site_cfg.spec, _w=w, _ap=layer_apply):
                axis = 0 if _spec and qp.delta.ndim else None
                w_q = Q.fake_quant(_spec, qp, _w, axis=axis)
                return jnp.mean((_ap(w_q, _inp) - _out) ** 2)

            st["qp"] = AR.mse_grid_init(site_cfg.spec, w, loss_fn=out_loss)
            qstate[wsite] = st
        else:
            raise ValueError(f"Unknown initialization for AdaRound: {cfg.init}")

        inp, out = _capture_layer_io(
            apply_fn, params, qcfg, qstate, samples, name, batch_size,
            asym=cfg.asym, act_quant=effective_act_quant,
            include_act_func=cfg.include_act_func)

        logger.info("Started AdaRound for layer %s", name)
        alpha, stats = AR.optimize_layer_rounding(
            layer_apply, site_cfg.spec, st["qp"], w, inp, out, cfg,
            seed=seed + hash(name) % 10000)
        st["alpha"] = alpha
        qstate[wsite] = st
        logger.info("Done AdaRound for layer %s: %s", name, stats)
        if stats_out is not None:
            stats_out.append((name, stats))

    # post_adaround: re-enable act quant and (re-)estimate ranges
    # (utils/adaround_utils.py:116-137)
    if cfg.act_quant_mode == AR.AdaRoundActQuantMode.post_adaround and act_quant:
        qstate = reset_act_ranges(qcfg, qstate)
        qstate = calibrate_model(
            apply_fn, params, qcfg,
            range_est_batches if range_est_batches is not None else batches,
            max_num_batches=num_est_batches, act_quant=True, weight_quant=True,
            cross_entropy_layer=cross_entropy_layer, qstate=qstate)
    return qstate


def adaround_multi_eval(apply_fn, params, qcfg: QuantModelConfig,
                        qstate: Dict, *, eval_fn: Callable,
                        est_arrays: Dict[str, np.ndarray],
                        act_quant_mode: "AR.AdaRoundActQuantMode",
                        weight_quant: bool = True, act_quant: bool = True,
                        num_est_batches: int = 1, est_pad: bool = True,
                        cross_entropy_layer: Optional[str] = None,
                        batch_sizes: Tuple[int, ...] = (1, 4, 16),
                        log_fn: Callable = logger.info):
    """AdaRound evaluation protocol (reference main.py:666-730).

    I.  Score once with FP32 activations (quantized weights only).
    II. Unless ``no_act_quant``: for each calibration batch size in
        ``batch_sizes``, reset the activation ranges, re-estimate them on
        up to ``num_est_batches`` train batches of that size, fix, and
        evaluate; the reported score is the MAX over batch sizes (the
        paper's W4 evaluation methodology).

    ``eval_fn(qstate, mode) -> (score, payload)`` evaluates the model;
    ``payload`` (e.g. per-split metric dicts) of the winning setting is
    returned. Returns ``(final_score, details)`` with details carrying
    ``fp_acts_score``, per-batch-size ``scores``, ``best_batch_size``,
    ``best_qstate``, and the winning ``payload``.
    """
    from transformer_quantization_tpu.utils.data import (
        batch_iterator,
        trim_to_real_length,
    )

    fp_mode = QuantMode(weight_quant=weight_quant, act_quant=False)
    fp_score, fp_payload = eval_fn(qstate, fp_mode)
    log_fn(f"Score (FP32 acts) -> {100.0 * fp_score:.2f}")
    if act_quant_mode == AR.AdaRoundActQuantMode.no_act_quant or not act_quant:
        return fp_score, {"fp_acts_score": fp_score, "scores": {},
                          "best_batch_size": None, "best_qstate": qstate,
                          "payload": fp_payload}

    q_mode = QuantMode(weight_quant=weight_quant, act_quant=True)
    scores: Dict[int, float] = {}
    best = None
    for bs in batch_sizes:
        qs = reset_act_ranges(qcfg, qstate)
        est_batches = []
        for b in batch_iterator(est_arrays, bs, drop_last=True):
            b.pop("labels", None)
            b.pop("example_mask", None)
            if not est_pad:
                b = trim_to_real_length(b)
            est_batches.append(b)
            if len(est_batches) >= num_est_batches:
                break
        qs = calibrate_model(apply_fn, params, qcfg, est_batches,
                             max_num_batches=num_est_batches,
                             act_quant=True, weight_quant=weight_quant,
                             cross_entropy_layer=cross_entropy_layer,
                             qstate=qs)
        sc, payload = eval_fn(qs, q_mode)
        scores[bs] = sc
        log_fn(f"Score (bs={bs}) -> {100.0 * sc:.2f}")
        if best is None or sc > scores[best[0]]:
            best = (bs, qs, payload)
    log_fn(f"Score (FP32 acts) -> {100.0 * fp_score:.2f}")
    for k, v in scores.items():
        log_fn(f"Score (bs={k}) -> {100.0 * v:.2f}")
    return scores[best[0]], {"fp_acts_score": fp_score, "scores": scores,
                             "best_batch_size": best[0],
                             "best_qstate": best[1], "payload": best[2]}
