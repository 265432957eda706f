"""Calibration: range estimation over data.

Functional equivalent of the reference's calibration machinery:

- ``pass_data_for_range_estimation`` (reference: utils/utils.py:47-79):
  stream up to N batches through the model with activation quantizers in
  the estimate phase, then fix ranges.
- the ``cross_entropy_layer`` option (utils/utils.py:53-64): switch one
  named site's estimator to the cross-entropy objective before streaming.
- the PEG permutation pre-pass (main.py:513-558): a full-precision pass
  recording per-channel dynamic ranges, optional shared-ranges-per-layer,
  then permutation finalization.
- ``_prepare_quantized_model`` (main.py:243-266): estimate + fix for PTQ
  validation, or dynamic mode (no fixing; ranges re-estimated at eval).

Calibration runs the model *eagerly* (a handful of batches; reference
default is a single batch, utils/quant_click_options.py:188-195) so that
host-orchestrated MSE estimators can participate; the resulting qstate then
feeds fully jitted eval/train steps.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Iterable, Mapping, Optional

from transformer_quantization_tpu.quant.manager import (
    finalize_permutations,
    init_weight_qstate,
    share_ranges,
)
from transformer_quantization_tpu.quant.qconfig import (
    Phase,
    QuantModelConfig,
    QuantMode,
)
from transformer_quantization_tpu.quant.ranges import OptMethod, RangeMethod

ApplyFn = Callable  # (params, batch, qcfg=..., qstate=..., mode=...) -> (out, qstate)


def install_cross_entropy_estimator(qcfg: QuantModelConfig,
                                    site: str) -> QuantModelConfig:
    """Switch one act site to cross-entropy range estimation
    (utils/utils.py:53-64; golden-section, matching RangeEstimators.cross_entropy
    usage for logits)."""
    site_cfg = qcfg[site]
    new_rc = dataclasses.replace(site_cfg.range_cfg,
                                 method=RangeMethod.cross_entropy,
                                 opt_method=OptMethod.golden_section)
    return qcfg.replace_site(site, range_cfg=new_rc)


def record_permutation_ranges(apply_fn: ApplyFn, params, qcfg: QuantModelConfig,
                              qstate: Dict, batches: Iterable,
                              max_num_batches: int = 10,
                              shared_groups=None) -> Dict:
    """PEG permutation pre-pass (main.py:513-558).

    Runs the *full-precision* model, recording per-channel dynamic ranges at
    permuted sites; optionally shares each layer's ranges from a source site
    (``--per-groups-permute-shared-h``); returns qstate with finalized sort
    permutations.
    """
    mode = QuantMode(weight_quant=False, act_quant=True,
                     act_phase=Phase.record_ranges)
    for i, batch in enumerate(batches):
        if i >= max_num_batches:
            break
        _, qstate = apply_fn(params, batch, qcfg=qcfg, qstate=qstate,
                             mode=mode)
    if shared_groups:
        for source, targets in shared_groups:
            qstate = share_ranges(qstate, source, targets)
    return finalize_permutations(qcfg, qstate)


def calibrate_model(apply_fn: ApplyFn, params, qcfg: QuantModelConfig,
                    batches: Iterable, *,
                    weight_tensors: Optional[Mapping] = None,
                    max_num_batches: int = 1,
                    act_quant: bool = True, weight_quant: bool = True,
                    cross_entropy_layer: Optional[str] = None,
                    qstate: Optional[Dict] = None) -> Dict:
    """Estimate quantization ranges (utils/utils.py:47-79).

    Weight sites are initialized directly from their tensors (equivalent to
    the reference's repeated re-estimation from the unchanged weights);
    activation sites estimate from streamed batches.
    """
    if cross_entropy_layer is not None:
        qcfg = install_cross_entropy_estimator(qcfg, cross_entropy_layer)
    qstate = dict(qstate or {})
    if weight_quant and weight_tensors:
        qstate.update(init_weight_qstate(qcfg, weight_tensors))
    if act_quant:
        mode = QuantMode(weight_quant=weight_quant, act_quant=True,
                         act_phase=Phase.estimate, weight_phase=Phase.fix)
        mse_session: Dict = {}
        n = 0
        for batch in batches:
            if n >= max_num_batches:
                break
            _, qstate = apply_fn(params, batch, qcfg=qcfg, qstate=qstate,
                                 mode=mode, mse_session=mse_session)
            n += 1
        if n == 0:
            raise ValueError("no calibration batches provided")
    return qstate


def prepare_quantized_model(apply_fn: ApplyFn, params, qcfg: QuantModelConfig,
                            batches, *, weight_tensors=None, num_batches=1,
                            act_quant=True, weight_quant=True, dynamic=False,
                            cross_entropy_layer=None,
                            permute_batches=None, shared_groups=None):
    """PTQ preparation (main.py:243-266 + the PEG pre-pass).

    Returns ``(qstate, eval_mode)``: qstate with estimated+fixed ranges, and
    the QuantMode to evaluate under. ``dynamic=True`` skips fixing — eval
    re-estimates act ranges per batch (the ``--dynamic`` flag,
    transformer_click_options.py:441-443).
    """
    qstate: Dict = {}
    needs_perm = any(c.permute for _, c in qcfg.items() if c.kind == "act")
    if needs_perm:
        qstate = record_permutation_ranges(
            apply_fn, params, qcfg, qstate,
            permute_batches if permute_batches is not None else batches,
            shared_groups=shared_groups)
    if dynamic:
        if weight_tensors and weight_quant:
            qstate.update(init_weight_qstate(qcfg, weight_tensors))
        eval_mode = QuantMode(weight_quant=weight_quant, act_quant=act_quant,
                              act_phase=Phase.estimate)
        return qstate, eval_mode
    qstate = calibrate_model(apply_fn, params, qcfg, batches,
                             weight_tensors=weight_tensors,
                             max_num_batches=num_batches,
                             act_quant=act_quant, weight_quant=weight_quant,
                             cross_entropy_layer=cross_entropy_layer,
                             qstate=qstate)
    eval_mode = QuantMode(weight_quant=weight_quant, act_quant=act_quant,
                          act_phase=Phase.fix)
    return qstate, eval_mode
