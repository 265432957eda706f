"""Quantized RoBERTa for sequence classification, TPU-native.

Functional re-design of the reference's
``QuantizedRobertaForSequenceClassification``
(reference: models/quantized_roberta.py). RoBERTa reuses the full BERT
encoder quant-site inventory; the deltas are:

- position ids are derived from the padding mask: non-pad tokens get
  ``cumsum(mask) + padding_idx``, pad tokens stay at ``padding_idx``
  (quantized_roberta.py:26-41, fairseq ``make_positions`` semantics)
- the embedding forward keeps BERT's two-stage sum quantization
  (quantized_roberta.py:92-103)
- there is no pooler; the classification head is HF's
  ``RobertaClassificationHead``: take <s> (first token) -> dropout ->
  dense -> tanh -> dropout -> out_proj (quantized_roberta.py:161-199).
  The tanh is a bare tensor op in the HF head's forward, so the
  reference's converter cannot fuse it into the dense QuantLinear — the
  dense *output quantizer applies before the tanh*, and the tanh output
  is NOT re-quantized. Reproduced here exactly.
- no [0, 5] logits clamp for regression (quantized_roberta.py:169-209
  overrides the BERT forward without it)

``quant_setup`` note: the reference builds the quant_setup-specialized
classifier in the Bert base __init__ and then *overwrites* it with a
plain conversion (quantized_roberta.py:167), so MSE_logits/FP_logits are
silently inert for RoBERTa. We implement the documented semantics on the
``clf.out_proj.out`` logits site instead of reproducing that bug.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp

from transformer_quantization_tpu.models import bert as B
from transformer_quantization_tpu.ops.layers import dropout, quant_linear
from transformer_quantization_tpu.quant.qconfig import (
    QuantConfigBuilder,
    QuantDefaults,
    QuantModelConfig,
    QuantMode,
)

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class RobertaConfig(B.BertConfig):
    """HF ``RobertaConfig`` subset (roberta-base defaults)."""

    vocab_size: int = 50265
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1


def create_position_ids_from_input_ids(input_ids: Array,
                                       padding_idx: int) -> Array:
    """Non-pad tokens numbered from padding_idx+1; pads stay at padding_idx
    (quantized_roberta.py:26-41)."""
    mask = (input_ids != padding_idx).astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + padding_idx


def init_roberta_params(rng: jax.Array, cfg: RobertaConfig) -> Dict:
    """Random init; same tree as BERT but the head replaces the pooler."""
    kb, kh1, kh2 = jax.random.split(rng, 3)
    params = B.init_bert_params(kb, cfg)
    del params["pooler"]
    std = cfg.initializer_range
    params["classifier"] = {
        "dense": B._linear_init(kh1, cfg.hidden_size, cfg.hidden_size, std),
        "out_proj": B._linear_init(kh2, cfg.num_labels, cfg.hidden_size, std),
    }
    return params


def declare_roberta_sites(defaults: QuantDefaults, cfg: RobertaConfig,
                          quant_setup: str = "all",
                          quant_dict: Optional[Mapping] = None
                          ) -> QuantModelConfig:
    """Site inventory: BERT embeddings + encoder, RoBERTa head."""
    quant_dict = quant_dict or {}
    b = QuantConfigBuilder(defaults)
    B.declare_embedding_sites(b, quant_dict)
    B.declare_encoder_sites(b, cfg.num_hidden_layers)
    b.weight("clf.dense.w")
    b.act("clf.dense.out")
    B.declare_classifier_site(b, "clf.out_proj", quant_setup)
    return b.build()


def apply_roberta_quant_dict(qcfg: QuantModelConfig, quant_dict: Mapping,
                             n_layers: int) -> QuantModelConfig:
    """quant_dict key language for RoBERTa.

    The reference wires quant_dict only for bert_base/bert_large
    (main.py:446); this extends the same language to RoBERTa with the
    head keys mapped onto the classification head: ``P`` -> the dense
    (+tanh) activation, ``C`` -> the logits, ``wP``/``wC`` -> their
    weights.
    """
    ordered = B.encoder_quant_dict_entries(n_layers)
    ordered += [
        ("P", ("clf.dense.out",)),
        ("C", ("clf.out_proj.out",)),
        ("wP", ("clf.dense.w",)),
        ("wC", ("clf.out_proj.w",)),
    ]
    return B._apply_ordered_quant_dict(qcfg, quant_dict, ordered)


def apply_peg_wiring(qcfg: QuantModelConfig, n_layers: int,
                     per_token: bool = False, per_embd: bool = False,
                     per_groups: Optional[int] = None,
                     permute: bool = False) -> QuantModelConfig:
    """PEG wiring with the head dense site taking the (B, d) role."""
    return B.apply_peg_wiring(qcfg, n_layers, per_token=per_token,
                              per_embd=per_embd, per_groups=per_groups,
                              permute=permute, pooler_site="clf.dense.out")


def roberta_weight_site_tensors(params: Dict) -> Dict[str, Array]:
    out = B.encoder_weight_site_tensors(params)
    out["clf.dense.w"] = params["classifier"]["dense"]["kernel"]
    out["clf.out_proj.w"] = params["classifier"]["out_proj"]["kernel"]
    return out


def roberta_adaround_specs(params: Dict, cfg: RobertaConfig
                           ) -> List[Tuple[str, Dict]]:
    specs = B.encoder_adaround_specs(params, cfg)
    c = params["classifier"]
    specs += [
        ("clf.dense", {"kind": "linear", "w": c["dense"]["kernel"],
                       "b": c["dense"]["bias"], "act": None}),
        ("clf.out_proj", {"kind": "linear", "w": c["out_proj"]["kernel"],
                          "b": c["out_proj"]["bias"], "act": None}),
    ]
    return specs


def build_roberta_int_params(params: Dict, qcfg: QuantModelConfig,
                             qstate: Mapping, use_int4: bool = False) -> Dict:
    return B.pack_int_params(roberta_weight_site_tensors(params), qcfg,
                             qstate, use_int4=use_int4)


def roberta_apply(params: Dict, batch: Mapping[str, Array],
                  cfg: RobertaConfig,
                  qcfg: Optional[QuantModelConfig] = None,
                  qstate: Optional[Dict] = None,
                  mode: Optional[QuantMode] = None,
                  *, train: bool = False,
                  dropout_rng: Optional[jax.Array] = None,
                  mse_session: Optional[Dict] = None,
                  int_params: Optional[Dict] = None,
                  use_pallas: bool = False,
                  capture_sites=None,
                  capture_pre_act: bool = False,
                  compute_dtype=None,
                  int8_qat_sites=None,
                  remat: bool = False,
                  scan_layers: bool = False,
                  pp_mesh=None,
                  pp_microbatches: int = 1) -> Tuple[Dict, Dict]:
    """Forward pass. Returns ``(outputs, new_qstate)``."""
    ctx = B.make_ctx(qcfg, qstate, mode, mse_session=mse_session,
                     int_params=int_params, use_pallas=use_pallas,
                     capture_sites=capture_sites,
                     capture_pre_act=capture_pre_act,
                     compute_dtype=compute_dtype,
                     int8_qat_sites=B.int8_sites_for_mode(
                         int8_qat_sites, train, cfg))
    pos_ids = batch.get("position_ids")
    if pos_ids is None:
        pos_ids = create_position_ids_from_input_ids(batch["input_ids"],
                                                     cfg.pad_token_id)
    input_ids, token_type_ids, position_ids, mask_bias = B.prepare_inputs(
        batch, position_ids=pos_ids)
    if compute_dtype is not None and mask_bias is not None:
        mask_bias = mask_bias.astype(compute_dtype)
    rngs = B.make_dropout_rngs(cfg, train, dropout_rng)

    h = B._embeddings(ctx, params, cfg, input_ids, token_type_ids,
                      position_ids, train, rngs[0] if rngs else None)
    h, h_site = B.run_encoder(ctx, params, cfg, h, mask_bias, train, rngs,
                              first_site="emb.ln.out", remat=remat,
                              scan=scan_layers,
                              pipeline=((pp_mesh, pp_microbatches)
                                        if pp_mesh is not None else None))

    outputs = _roberta_head(ctx, params, cfg, h, h_site, batch, train, rngs)
    if capture_sites:
        outputs["captures"] = getattr(ctx, "captures", {})
    return outputs, ctx.export()


def _roberta_head(ctx, params, cfg: RobertaConfig, h, h_site, batch, train,
                  rngs):
    """RobertaClassificationHead: <s> token -> dropout -> dense -> tanh ->
    dropout -> out_proj. The dense output quantizer fires BEFORE the
    tanh (the HF head calls torch.tanh inline so the reference's
    converter can't fuse it; hijacker quantizes the dense output only)."""
    c = params["classifier"]
    x = h[:, 0]
    x = dropout(x, cfg.hidden_dropout_prob, rngs[-1] if rngs else None,
                not train)
    x = quant_linear(ctx, "clf.dense", x, c["dense"]["kernel"],
                     c["dense"]["bias"], input_site=h_site)
    x = jnp.tanh(x)
    x = dropout(x, cfg.hidden_dropout_prob, rngs[-1] if rngs else None,
                not train)
    logits = quant_linear(ctx, "clf.out_proj", x, c["out_proj"]["kernel"],
                          c["out_proj"]["bias"])
    # no [0, 5] clamp: the RoBERTa forward override omits it
    # (quantized_roberta.py:199-209)

    outputs = {"logits": logits, "sequence_output": h}
    labels = batch.get("labels")
    if labels is not None:
        outputs["loss"] = B.classification_loss(logits, labels,
                                                cfg.num_labels)
    return outputs


def build_roberta_engine(params: Dict, cfg: RobertaConfig,
                         qcfg: QuantModelConfig, qstate: Mapping,
                         int_params: Optional[Dict] = None,
                         use_int4: bool = False):
    """Full-handoff int8 engine plan for RoBERTa (shared encoder sites)."""
    from transformer_quantization_tpu.ops import engine as ENG

    if int_params is None:
        int_params = build_roberta_int_params(params, qcfg, qstate,
                                              use_int4=use_int4)
    static, plan = ENG.build_encoder_plan(
        qcfg, qstate, int_params, params["layers"],
        n_heads=cfg.num_attention_heads, ln_eps=cfg.layer_norm_eps,
        hidden_act=cfg.hidden_act, entry_site="emb.ln.out")
    return static, plan, int_params


def roberta_engine_apply(params: Dict, batch: Mapping[str, Array],
                         cfg: RobertaConfig, qcfg: QuantModelConfig,
                         qstate: Mapping, static, plan, int_params: Dict, *,
                         backend: str = "pallas",
                         engine_dtype=jnp.float32,
                         interpret: bool = False,
                         gelu_impl: str = "tanh") -> Dict:
    """Inference forward through the full-handoff int8 engine
    (models/bert.py:bert_engine_apply for the shape of this)."""
    from transformer_quantization_tpu.ops import engine as ENG

    ctx = B.make_ctx(qcfg, qstate, QuantMode(), int_params=int_params)
    pos_ids = batch.get("position_ids")
    if pos_ids is None:
        pos_ids = create_position_ids_from_input_ids(batch["input_ids"],
                                                     cfg.pad_token_id)
    input_ids, token_type_ids, position_ids, _ = B.prepare_inputs(
        batch, position_ids=pos_ids)
    h = B._embeddings(ctx, params, cfg, input_ids, token_type_ids,
                      position_ids, False, None)
    attention_mask = batch.get("attention_mask")
    if attention_mask is None:
        bias_vec = jnp.zeros(input_ids.shape, jnp.float32)
    else:
        bias_vec = (1.0 - attention_mask.astype(jnp.float32)) * -10000.0
    h = ENG.encoder_engine(h, bias_vec, static, plan, backend=backend,
                           out_dtype=engine_dtype, interpret=interpret,
                           gelu_impl=gelu_impl)
    h = h.astype(jnp.float32)
    h_site = f"L{cfg.num_hidden_layers - 1}.ffn.ln.out"
    return _roberta_head(ctx, params, cfg, h, h_site, batch, False, None)
