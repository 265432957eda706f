"""Quantized DistilBERT for sequence classification, TPU-native.

The reference lists ``distilbert_base_uncased`` in its model zoo but can
only run it as an FP32 *baseline* — its quantized model classes cover
BERT/RoBERTa/MobileBERT only (reference: utils/hf_models.py:26,
main.py:216-240 raises for anything else). Here DistilBERT is a full
family: baseline AND quantizable (a capability superset).

Architecture vs BERT (HF ``DistilBertForSequenceClassification``):
- embeddings have no token-type table (modeled as a disabled site over a
  zero table so the BERT embedding code is reused verbatim)
- 6 post-LN encoder layers identical in shape to BERT's
- no pooler; head = pre_classifier (dense+ReLU) -> dropout -> classifier
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
class DistilBertConfig(B.BertConfig):
    num_hidden_layers: int = 6
    type_vocab_size: int = 1  # zero table, site disabled


def init_distilbert_params(rng: jax.Array, cfg: DistilBertConfig) -> Dict:
    kb, kh1, kh2 = jax.random.split(rng, 3)
    params = B.init_bert_params(kb, cfg)
    params["embeddings"]["token_type"] = jnp.zeros(
        (cfg.type_vocab_size, cfg.hidden_size), jnp.float32)
    del params["pooler"]
    std = cfg.initializer_range
    params["classifier"] = {
        "pre": B._linear_init(kh1, cfg.hidden_size, cfg.hidden_size, std),
        "out": B._linear_init(kh2, cfg.num_labels, cfg.hidden_size, std),
    }
    return params


def declare_distilbert_sites(defaults: QuantDefaults, cfg: DistilBertConfig,
                             quant_setup: str = "all",
                             quant_dict: Optional[Mapping] = None
                             ) -> QuantModelConfig:
    quant_dict = quant_dict or {}
    b = QuantConfigBuilder(defaults)
    B.declare_embedding_sites(b, quant_dict)
    B.declare_encoder_sites(b, cfg.num_hidden_layers)
    b.weight("clf.pre.w")
    b.act("clf.pre.out")
    B.declare_classifier_site(b, "clf.out", quant_setup)
    cfg_tree = b.build()
    # token-type table is a zero placeholder: never quantize it
    return cfg_tree.replace_site("emb.token_type.w", enabled=False)


def apply_distilbert_quant_dict(qcfg: QuantModelConfig, quant_dict: Mapping,
                                n_layers: int) -> QuantModelConfig:
    """BERT letter language with the head keys on pre_classifier/classifier."""
    ordered = B.encoder_quant_dict_entries(n_layers)
    ordered += [
        ("P", ("clf.pre.out",)),
        ("C", ("clf.out.out",)),
        ("wP", ("clf.pre.w",)),
        ("wC", ("clf.out.w",)),
    ]
    return B._apply_ordered_quant_dict(qcfg, quant_dict, ordered)


def apply_peg_wiring(qcfg: QuantModelConfig, n_layers: int,
                     per_token: bool = False, per_embd: bool = False,
                     per_groups: Optional[int] = None,
                     permute: bool = False) -> QuantModelConfig:
    return B.apply_peg_wiring(qcfg, n_layers, per_token=per_token,
                              per_embd=per_embd, per_groups=per_groups,
                              permute=permute, pooler_site="clf.pre.out")


def distilbert_weight_site_tensors(params: Dict) -> Dict[str, Array]:
    out = B.encoder_weight_site_tensors(params)
    out.pop("emb.token_type.w", None)
    out["clf.pre.w"] = params["classifier"]["pre"]["kernel"]
    out["clf.out.w"] = params["classifier"]["out"]["kernel"]
    return out


def distilbert_adaround_specs(params: Dict, cfg: DistilBertConfig
                              ) -> List[Tuple[str, Dict]]:
    specs = [s for s in B.encoder_adaround_specs(params, cfg)
             if s[0] != "emb.token_type"]
    c = params["classifier"]
    specs += [
        ("clf.pre", {"kind": "linear", "w": c["pre"]["kernel"],
                     "b": c["pre"]["bias"], "act": "relu"}),
        ("clf.out", {"kind": "linear", "w": c["out"]["kernel"],
                     "b": c["out"]["bias"], "act": None}),
    ]
    return specs


def build_distilbert_int_params(params: Dict, qcfg: QuantModelConfig,
                                qstate: Mapping,
                                use_int4: bool = False) -> Dict:
    return B.pack_int_params(distilbert_weight_site_tensors(params), qcfg,
                             qstate, use_int4=use_int4)


def distilbert_apply(params: Dict, batch: Mapping[str, Array],
                     cfg: DistilBertConfig,
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
    input_ids, _, position_ids, mask_bias = B.prepare_inputs(batch)
    token_type_ids = jnp.zeros_like(input_ids)
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

    c = params["classifier"]
    x = quant_linear(ctx, "clf.pre", h[:, 0], c["pre"]["kernel"],
                     c["pre"]["bias"], activation="relu",
                     input_site=h_site)
    x = dropout(x, cfg.hidden_dropout_prob, rngs[-1] if rngs else None,
                not train)
    logits = quant_linear(ctx, "clf.out", x, c["out"]["kernel"],
                          c["out"]["bias"], input_site="clf.pre.out")

    outputs = {"logits": logits, "sequence_output": h}
    labels = batch.get("labels")
    if labels is not None:
        outputs["loss"] = B.classification_loss(logits, labels,
                                                cfg.num_labels)
    if capture_sites:
        outputs["captures"] = getattr(ctx, "captures", {})
    return outputs, ctx.export()


# ---------------------------------------------------------------------------
# Full-handoff int8 inference engine (ops/engine.py) — the fast serving path
# ---------------------------------------------------------------------------


def build_distilbert_engine(params: Dict, cfg: DistilBertConfig,
                            qcfg: QuantModelConfig, qstate: Mapping,
                            int_params: Optional[Dict] = None,
                            use_int4: bool = False):
    """Engine plan for a calibrated DistilBERT — the standard ``L{i}.*``
    encoder rides the generic plan directly
    (models/bert.py:build_bert_engine for the shape of this)."""
    from transformer_quantization_tpu.ops import engine as ENG

    if int_params is None:
        int_params = build_distilbert_int_params(params, qcfg, qstate,
                                                 use_int4=use_int4)
    static, plan = ENG.build_encoder_plan(
        qcfg, qstate, int_params, params["layers"],
        n_heads=cfg.num_attention_heads, ln_eps=cfg.layer_norm_eps,
        hidden_act=cfg.hidden_act, entry_site="emb.ln.out")
    return static, plan, int_params


def distilbert_engine_apply(params: Dict, batch: Mapping[str, Array],
                            cfg: DistilBertConfig, qcfg: QuantModelConfig,
                            qstate: Mapping, static, plan,
                            int_params: Dict, *,
                            backend: str = "pallas",
                            engine_dtype=jnp.float32,
                            interpret: bool = False,
                            gelu_impl: str = "tanh") -> Dict:
    """Inference forward through the full-handoff int8 engine
    (models/bert.py:bert_engine_apply for the shape of this)."""
    from transformer_quantization_tpu.ops import engine as ENG

    ctx = B.make_ctx(qcfg, qstate, QuantMode(), int_params=int_params)
    input_ids, _, position_ids, _ = B.prepare_inputs(batch)
    token_type_ids = jnp.zeros_like(input_ids)
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
    c = params["classifier"]
    x = quant_linear(ctx, "clf.pre", h[:, 0], c["pre"]["kernel"],
                     c["pre"]["bias"], activation="relu",
                     input_site=h_site)
    logits = quant_linear(ctx, "clf.out", x, c["out"]["kernel"],
                          c["out"]["bias"], input_site="clf.pre.out")
    outputs = {"logits": logits, "sequence_output": h}
    labels = batch.get("labels")
    if labels is not None:
        outputs["loss"] = B.classification_loss(logits, labels,
                                                cfg.num_labels)
    return outputs


def family():
    from transformer_quantization_tpu.models.registry import ModelFamily

    def init_head(rng, cfg):
        return init_distilbert_params(
            rng, dataclasses.replace(cfg, num_hidden_layers=0))["classifier"]

    def load_checkpoint(model_dir, num_labels=None):
        from transformer_quantization_tpu.models import hf_loader as L

        return L.load_distilbert(model_dir, num_labels)

    return ModelFamily(
        name="distilbert",
        config_cls=DistilBertConfig,
        init_params=init_distilbert_params,
        init_head=init_head,
        head_key="classifier",
        apply=distilbert_apply,
        declare_sites=declare_distilbert_sites,
        apply_quant_dict=apply_distilbert_quant_dict,
        apply_peg=apply_peg_wiring,
        weight_site_tensors=distilbert_weight_site_tensors,
        adaround_specs=distilbert_adaround_specs,
        build_int_params=build_distilbert_int_params,
        build_engine=build_distilbert_engine,
        engine_apply=distilbert_engine_apply,
        shared_perm_groups=B.shared_permutation_groups,
        load_checkpoint=load_checkpoint,
        config_presets={"distilbert_base_uncased": {}},
        tiny_preset=dict(vocab_size=2048, hidden_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         intermediate_size=128,
                         max_position_embeddings=128),
    )
