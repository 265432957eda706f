"""Model-family registry.

The reference dispatches on ``HF_Models`` enum values in ``_quantize_model``
(reference: main.py:212-240, utils/hf_models.py:17-49 — only bert-base/
large, mobilebert, roberta/distilroberta are quantizable). Here each
family exposes one uniform functional surface so the CLI, trainer,
calibration, AdaRound driver, and serving engine are family-agnostic.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax


@dataclasses.dataclass(frozen=True)
class ModelFamily:
    """Uniform functional surface of one quantized model family."""

    name: str
    config_cls: type
    init_params: Callable                  # (rng, cfg) -> params
    init_head: Callable                    # (rng, cfg) -> head params subtree
    head_key: str                          # params key the head lives under
    apply: Callable                        # bert_apply-compatible signature
    declare_sites: Callable                # (defaults, cfg, quant_setup, qd)
    apply_quant_dict: Callable             # (qcfg, quant_dict, n_layers)
    apply_peg: Callable                    # (qcfg, n_layers, **peg)
    weight_site_tensors: Callable          # (params) -> {site: tensor}
    adaround_specs: Callable               # (params, cfg) -> [(name, spec)]
    build_int_params: Callable             # (params, qcfg, qstate, use_int4)
    shared_perm_groups: Optional[Callable]  # (n_layers) -> [(src, targets)]
    load_checkpoint: Callable              # (dir, num_labels) -> (cfg, params)
    # full-handoff int8 inference engine (ops/engine.py); None = family
    # not engine-capable, callers use the generic int path
    build_engine: Optional[Callable] = None   # (params, cfg, qcfg, qstate)
    engine_apply: Optional[Callable] = None   # (params, batch, cfg, ...)
    # per model-name config presets (model names from utils/hf_models.py)
    config_presets: Dict[str, Dict] = dataclasses.field(default_factory=dict)
    tiny_preset: Dict = dataclasses.field(default_factory=dict)


def _bert_family() -> ModelFamily:
    from transformer_quantization_tpu.models import bert as B
    from transformer_quantization_tpu.models import hf_loader as L

    def init_head(rng, cfg):
        import dataclasses as dc

        return B.init_bert_params(
            rng, dc.replace(cfg, num_hidden_layers=0))["classifier"]

    return ModelFamily(
        name="bert",
        config_cls=B.BertConfig,
        init_params=B.init_bert_params,
        init_head=init_head,
        head_key="classifier",
        apply=B.bert_apply,
        declare_sites=B.declare_bert_sites,
        apply_quant_dict=B.apply_bert_quant_dict,
        apply_peg=B.apply_peg_wiring,
        weight_site_tensors=B.bert_weight_site_tensors,
        adaround_specs=B.bert_adaround_specs,
        build_int_params=B.build_bert_int_params,
        shared_perm_groups=B.shared_permutation_groups,
        load_checkpoint=L.load_bert,
        build_engine=B.build_bert_engine,
        engine_apply=B.bert_engine_apply,
        config_presets={
            "bert_base_uncased": {},
            "bert_base_cased": dict(vocab_size=28996),
            "bert_large_uncased": dict(hidden_size=1024,
                                       num_hidden_layers=24,
                                       num_attention_heads=16,
                                       intermediate_size=4096),
        },
        tiny_preset=dict(vocab_size=2048, hidden_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         intermediate_size=128,
                         max_position_embeddings=128),
    )


def _roberta_family() -> ModelFamily:
    from transformer_quantization_tpu.models import hf_loader as L
    from transformer_quantization_tpu.models import roberta as R
    from transformer_quantization_tpu.models import bert as B

    def init_head(rng, cfg):
        return R.init_roberta_params(rng, dataclasses.replace(
            cfg, num_hidden_layers=0))["classifier"]

    return ModelFamily(
        name="roberta",
        config_cls=R.RobertaConfig,
        init_params=R.init_roberta_params,
        init_head=init_head,
        head_key="classifier",
        apply=R.roberta_apply,
        declare_sites=R.declare_roberta_sites,
        apply_quant_dict=R.apply_roberta_quant_dict,
        apply_peg=R.apply_peg_wiring,
        weight_site_tensors=R.roberta_weight_site_tensors,
        adaround_specs=R.roberta_adaround_specs,
        build_int_params=R.build_roberta_int_params,
        shared_perm_groups=B.shared_permutation_groups,
        load_checkpoint=L.load_roberta,
        build_engine=R.build_roberta_engine,
        engine_apply=R.roberta_engine_apply,
        config_presets={
            "roberta_base": {},
            "distilroberta_base": dict(num_hidden_layers=6),
        },
        tiny_preset=dict(vocab_size=2048, hidden_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         intermediate_size=128,
                         max_position_embeddings=130),
    )


def _mobilebert_family() -> ModelFamily:
    from transformer_quantization_tpu.models import mobilebert as M

    return M.family()


def _distilbert_family() -> ModelFamily:
    from transformer_quantization_tpu.models import distilbert as D

    return D.family()


def _albert_family() -> ModelFamily:
    from transformer_quantization_tpu.models import albert as A

    return A.family()


def _squeezebert_family() -> ModelFamily:
    from transformer_quantization_tpu.models import squeezebert as S

    return S.family()


_FAMILIES = {
    "bert": _bert_family,
    "roberta": _roberta_family,
    "mobilebert": _mobilebert_family,
    "distilbert": _distilbert_family,
    "albert": _albert_family,
    "squeezebert": _squeezebert_family,
}

# model-name -> family (HF_Models quantizable subset, main.py:216-225)
MODEL_NAME_TO_FAMILY = {
    "bert_base_uncased": "bert",
    "bert_base_cased": "bert",
    "bert_large_uncased": "bert",
    "roberta_base": "roberta",
    "distilroberta_base": "roberta",
    "mobilebert_uncased": "mobilebert",
    "distilbert_base_uncased": "distilbert",
    "albert_base_v2": "albert",
    "albert_large_v2": "albert",
    "squeezebert_uncased": "squeezebert",
}


def get_family(name: str) -> ModelFamily:
    """Resolve a family by family name or model name."""
    if name in MODEL_NAME_TO_FAMILY:
        name = MODEL_NAME_TO_FAMILY[name]
    return _FAMILIES[name]()


def build_model(model_name: str, seed: int = 0, tiny: bool = False,
                num_labels: int = 2, model_path: Optional[str] = None,
                **overrides) -> Tuple[ModelFamily, object, Dict]:
    """(family, cfg, params) for a model name; checkpoint dir optional."""
    import os

    fam = get_family(model_name)
    if model_path and os.path.exists(os.path.join(model_path,
                                                  "manifest.json")):
        # a framework checkpoint (utils/checkpoint.py) as the FP32 source
        from transformer_quantization_tpu.utils import checkpoint as CK

        ck = CK.load_checkpoint(model_path)
        fam = get_family(ck["family"])
        cfg = ck["cfg"]
        if num_labels and cfg.num_labels != num_labels:
            import dataclasses as _dc

            cfg = _dc.replace(cfg, num_labels=num_labels)
        return fam, cfg, ck["params"]
    if model_path and os.path.exists(os.path.join(model_path, "config.json")):
        cfg, params = fam.load_checkpoint(model_path, num_labels)
        return fam, cfg, params
    kw = dict(fam.config_presets.get(model_name, {}))
    if tiny:
        kw = dict(fam.tiny_preset)
    kw.update(overrides)
    kw["num_labels"] = num_labels
    cfg = fam.config_cls(**kw)
    params = fam.init_params(jax.random.PRNGKey(seed), cfg)
    return fam, cfg, params
