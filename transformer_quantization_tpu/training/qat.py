"""Quantization-aware training.

Functional re-design of the reference's QAT preparation and training loop
(reference: utils/qat_utils.py:14-45, main.py:650-663):

- ``learn_ranges`` (LSQ-style): scale / zero-point become trainable leaves.
  The reference converts ``_delta``/``_zero_float`` to ``nn.Parameter``
  (quantizers.py:284-288, 346-349); here the per-site ``QuantParams`` are
  split out of the quant state into a trainable pytree differentiated
  alongside the model weights. Symmetric quantizers expose no gradient path
  to ``zero_float`` (their zero point is identically 0), reproducing the
  reference's delta-only training without masking.
- ``estimate_ranges_train``: ranges re-estimated from data during training
  and frozen for eval (quantization_manager.py:12-16) — expressed as
  ``act_phase=estimate`` inside the jitted train step (min-max estimators
  are pure jit-friendly updates), with per-kind freezing via
  ``fix_weight_ranges`` / ``fix_act_ranges`` flags (qat_utils.py:30-41).

Gradients flow to FP32 master weights through the STE and to ranges through
the scale/zero-point arithmetic, exactly as in the reference (SURVEY.md §3.2).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import optax
from jax.flatten_util import ravel_pytree

from transformer_quantization_tpu.quant.qconfig import (
    Phase,
    QuantModelConfig,
    QuantMode,
)
from transformer_quantization_tpu.quant.quantizers import QuantParams


def split_learnable_ranges(qcfg: QuantModelConfig, qstate: Dict
                           ) -> Tuple[Dict, Dict]:
    """Split the trainable range parameters out of the quant state.

    Returns ``(learnable, rest)`` where ``learnable[site] = {'delta':…,
    'zero_float':…}``. Only initialized, enabled sites participate (the
    reference only converts initialized quantizers,
    base_quantized_classes.py:11-16), and only ``delta``/``zero_float``
    become trainable — exactly the two buffers the reference flips to
    ``nn.Parameter`` (quantizers.py:284-288). The ``signed`` flag stays a
    buffer in ``rest`` (as ``qp_signed``) so optimizer transforms such as
    weight decay can never corrupt it.
    """
    learnable, rest = {}, {}
    for name, st in qstate.items():
        if name in qcfg and qcfg[name].enabled and "qp" in st:
            qp = st["qp"]
            learnable[name] = {"delta": qp.delta, "zero_float": qp.zero_float}
            rest[name] = dict({k: v for k, v in st.items() if k != "qp"},
                              qp_signed=qp.signed)
        else:
            rest[name] = st
    return learnable, rest


def merge_learnable_ranges(learnable: Dict, rest: Dict) -> Dict:
    out = {}
    for name, st in rest.items():
        if name in learnable:
            st = {k: v for k, v in st.items() if k != "qp_signed"}
            out[name] = dict(st, qp=QuantParams(
                delta=learnable[name]["delta"],
                zero_float=learnable[name]["zero_float"],
                signed=rest[name]["qp_signed"]))
        else:
            out[name] = st
    return out


@dataclasses.dataclass(frozen=True)
class QATConfig:
    """QAT options (reference: utils/quant_click_options.py:199-226)."""

    learn_ranges: bool = False
    fix_weight_ranges: bool = False
    fix_act_ranges: bool = False
    learning_rate: float = 5e-5
    range_learning_rate: Optional[float] = None  # None -> same as lr
    weight_decay: float = 0.0
    # TPU-native mixed-precision training (the reference's --amp /
    # HF TrainingArguments fp16, transformer_click_options.py training
    # group): matmuls and activation storage ride this dtype inside the
    # train step while master weights, quantizer range math, LayerNorm/
    # softmax statistics, the loss, and the optimizer all stay float32.
    # bf16 has fp32's exponent range, so no loss scaling is needed.
    compute_dtype: Optional[str] = None  # e.g. "bfloat16"
    # rematerialize encoder layers in the backward pass (jax.checkpoint):
    # ~1/3 extra forward FLOPs for O(layers) less live activation memory —
    # lets QAT batch sizes grow past HBM limits (no reference counterpart;
    # torch.utils.checkpoint is the rough analogue)
    remat: bool = False
    # run the encoder stack as ONE lax.scan iteration when layers are
    # interchangeable: trace+compile cost becomes depth-independent
    # (models/bert.py can_scan_encoder); numerics identical to the loop
    scan_layers: bool = False
    # GPipe pipeline parallelism over the mesh's 'pp' axis
    # (parallel/pipeline.py): layer stacks shard over stages, activations
    # hop via ppermute, dp/tp/sp stay GSPMD-automatic inside each stage.
    # Requires fix/learn range phases (pipeline state is read-only).
    pp_mesh: object = None
    pp_microbatches: int = 1
    # run eligible fake-quant matmuls on the int8 MXU during QAT
    # (training/int8_qat.py): forward values are exactly the fake-quant
    # composition's, STE/LSQ gradients unchanged. Set to
    # ``int8_forward_sites(qcfg, qstate)`` (eligibility needs concrete
    # weight signedness, so it is computed eagerly from the calibrated
    # state); None/empty = float fake-quant matmuls (reference behavior).
    int8_sites: Optional[frozenset] = None


def int8_forward_sites(qcfg: QuantModelConfig, qstate: Dict) -> frozenset:
    """Layers whose QAT fake-quant matmul can run on the int8 MXU
    (training/int8_qat.py): symmetric linear-domain <=8-bit weights with
    SIGNED grids (the signedness flag is data-inferred, so eligibility is
    decided eagerly here, from the calibrated qstate, and passed into the
    jitted step as a static set) and no AdaRound alpha. The per-layer
    input-site conditions (per-tensor asymmetric 8-bit) are static config
    and re-checked inside ops/layers.quant_linear at trace time."""
    import numpy as np

    out = set()
    for name, c in qcfg.items():
        if c.kind != "weight" or not name.endswith(".w") or not c.enabled:
            continue
        if (not c.spec.symmetric or c.spec.scale_domain != "linear"
                or c.spec.n_bits > 8):
            continue
        st = qstate.get(name)
        if st is None or st.get("alpha") is not None:
            continue
        qp = st["qp"]
        try:
            signed = float(np.asarray(qp.signed))
        except Exception:  # traced values: cannot decide eagerly
            return frozenset()
        if signed != 1.0:
            continue
        if c.per_channel != (qp.delta.ndim == 1):
            continue
        out.add(name[:-len(".w")])
    # scan compatibility: --scan-layers runs layers under the generic
    # "L." site prefix; include it per suffix when EVERY layer's
    # instance is eligible (scan requires interchangeable layers anyway).
    # Inside the scan body q/k/v still run float: their input site
    # differs per iteration (emb.ln.out at layer 0, ffn.ln.out after),
    # so no static site name exists — attn_out/inter/dense + the head
    # take the int8 path.
    import re

    layer_ids = {int(m.group(1)) for n, _ in qcfg.items()
                 if (m := re.match(r"^L(\d+)\.", n))}
    suffixes = {n[n.index(".") + 1:] for n in out if re.match(r"^L\d+\.", n)}
    for suf in suffixes:
        if all(f"L{i}.{suf}" in out for i in layer_ids):
            out.add(f"L.{suf}")
    return frozenset(out)


def qat_mode(qat: QATConfig, weight_quant: bool = True,
             act_quant: bool = True) -> QuantMode:
    """Translate QAT options into the train-step QuantMode
    (qat_utils.py:27-41)."""
    if qat.learn_ranges:
        return QuantMode(weight_quant=weight_quant, act_quant=act_quant,
                         weight_phase=Phase.learn, act_phase=Phase.learn)
    return QuantMode(
        weight_quant=weight_quant, act_quant=act_quant,
        weight_phase=Phase.fix if qat.fix_weight_ranges else Phase.estimate,
        act_phase=Phase.fix if qat.fix_act_ranges else Phase.estimate)


def make_optimizer(qat: QATConfig) -> optax.GradientTransformation:
    """AdamW on weights; optionally a separate (usually much smaller)
    learning rate for the range parameters.

    The reference trains ``_delta``/``_zero_float`` with the same
    optimizer and lr as the weights (quantizers.py:284-288 just flips
    them to nn.Parameters) — that is the ``range_learning_rate=None``
    default. But scale parameters are ~1e-3-sized while Adam steps are
    ~lr-sized, so at aggressive weight lrs the ranges can collapse to
    eps in a step or two and freeze training; a separate range lr is
    the practical fix (LSQ-style lr scaling).
    """
    base = optax.adamw(qat.learning_rate, weight_decay=qat.weight_decay)
    if qat.range_learning_rate is None:
        return base
    range_tx = optax.adam(qat.range_learning_rate)

    def labels(tree):
        return {
            "params": jax.tree.map(lambda _: "params", tree["params"]),
            "ranges": jax.tree.map(lambda _: "ranges", tree["ranges"]),
        }

    return optax.multi_transform({"params": base, "ranges": range_tx},
                                 labels)


def make_qat_train_step(apply_fn: Callable, qcfg: QuantModelConfig,
                        qat: QATConfig, tx: optax.GradientTransformation,
                        donate: bool = True):
    """Build a jitted QAT train step.

    ``apply_fn(params, batch, qcfg=..., qstate=..., mode=..., train=...,
    dropout_rng=...) -> (outputs with 'loss', new_qstate)``.

    State layout: ``(params, learnable, rest_qstate, opt_state, rng)``;
    ``learnable`` is empty unless ``learn_ranges``.
    """
    mode = qat_mode(qat)
    extra = {}
    if qat.compute_dtype is not None:
        import jax.numpy as jnp
        extra["compute_dtype"] = jnp.dtype(qat.compute_dtype)
    if qat.remat:
        extra["remat"] = True
    if qat.scan_layers:
        extra["scan_layers"] = True
    if qat.pp_mesh is not None:
        extra["pp_mesh"] = qat.pp_mesh
        extra["pp_microbatches"] = qat.pp_microbatches
    if qat.int8_sites:
        extra["int8_qat_sites"] = qat.int8_sites

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3) if donate else ())
    def step(params, learnable, rest_qstate, opt_state, batch, rng):
        rng, dropout_rng = jax.random.split(rng)
        # Pack the hundreds of small per-site range leaves into ONE flat
        # vector before the optimizer sees them: Adam over ~800 scalar
        # leaves emits ~10 tiny unfusable ops per leaf, which dominated
        # both compile time and step time (see scripts/qat_bench.py);
        # over one packed vector it is a handful of fused ops.
        flat_ranges, unravel = ravel_pytree(learnable)
        trainable = {"params": params, "ranges": flat_ranges}

        def loss_fn(trainable, rest_qstate, batch, rng):
            qstate = merge_learnable_ranges(unravel(trainable["ranges"]),
                                            rest_qstate)
            out, new_qstate = apply_fn(trainable["params"], batch, qcfg=qcfg,
                                       qstate=qstate, mode=mode, train=True,
                                       dropout_rng=rng, **extra)
            return out["loss"], new_qstate

        (loss, new_qstate), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(trainable, rest_qstate, batch, dropout_rng)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        new_learnable, new_rest = {}, new_qstate
        if learnable:
            # learnable ranges advance via the optimizer; keep them out of
            # the threaded state so they aren't double-tracked
            new_learnable = unravel(trainable["ranges"])
            new_rest = {}
            for k, v in new_qstate.items():
                if k in learnable:
                    v = {kk: vv for kk, vv in v.items() if kk != "qp"}
                    v["qp_signed"] = new_qstate[k]["qp"].signed
                new_rest[k] = v
        return (trainable["params"], new_learnable, new_rest, opt_state, rng,
                loss)

    return step


def init_qat_state(qcfg: QuantModelConfig, qat: QATConfig, params, qstate,
                   tx: optax.GradientTransformation):
    """Prepare (params, learnable, rest, opt_state) after calibration."""
    if qat.learn_ranges:
        learnable, rest = split_learnable_ranges(qcfg, qstate)
    else:
        learnable, rest = {}, dict(qstate)
    # optimizer state lives on the packed range vector (see the packing
    # note in make_qat_train_step)
    flat_ranges, _ = ravel_pytree(learnable)
    opt_state = tx.init({"params": params, "ranges": flat_ranges})
    return params, learnable, rest, opt_state
