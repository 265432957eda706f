"""HuggingFace checkpoint ingestion (offline-capable).

The reference wraps live HF ``nn.Module`` instances
(reference: utils/hf_models.py:52-116, models/quantized_bert.py:525-560);
here we ingest an HF checkpoint *directory* (config.json +
pytorch_model.bin / model.safetensors) directly into a jnp parameter
pytree — no torch module graph, no network. With no checkpoint available
(this environment has zero egress), models initialize from config with
random weights.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from transformer_quantization_tpu.models.bert import BertConfig


def resolve_model_dir(name_or_dir: str, *, allow_hub: bool = False,
                      revision: Optional[str] = None,
                      cache_dir: Optional[str] = None) -> str:
    """Resolve a model source to a local checkpoint directory.

    A local directory passes through. With ``allow_hub``, a non-directory
    string is treated as a HuggingFace hub repo id and fetched via
    ``huggingface_hub.snapshot_download`` — the by-name model-zoo path of
    the reference (utils/hf_models.py:52-75, main.py:216-225), which
    downloads fine-tuned task checkpoints by name. Off by default: this
    framework's primary environments are zero-egress, and an accidental
    network fetch should be an explicit opt-in (--from-hub), not a
    fallback.
    """
    if os.path.isdir(name_or_dir):
        return name_or_dir
    if not allow_hub:
        raise FileNotFoundError(
            f"{name_or_dir!r} is not a local checkpoint directory; pass "
            "--from-hub to resolve it as a HuggingFace hub repo id")
    from huggingface_hub import snapshot_download  # ships w/ transformers

    return snapshot_download(
        repo_id=name_or_dir, revision=revision, cache_dir=cache_dir,
        allow_patterns=["config.json", "model.safetensors",
                        "pytorch_model.bin",
                        # every covered family's tokenizer artifacts:
                        # BERT/MobileBERT/SqueezeBERT vocab.txt,
                        # RoBERTa/DistilRoBERTa vocab.json+merges.txt,
                        # ALBERT spiece.model, plus the fast-tokenizer pair
                        "vocab.txt", "vocab.json", "merges.txt",
                        "spiece.model", "special_tokens_map.json",
                        "tokenizer.json", "tokenizer_config.json"])


def load_hf_state_dict(model_dir: str) -> Dict[str, np.ndarray]:
    """Read a local HF checkpoint into {name: np.ndarray}."""
    st_path = os.path.join(model_dir, "model.safetensors")
    pt_path = os.path.join(model_dir, "pytorch_model.bin")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file  # ships with transformers
        return dict(load_file(st_path))
    if os.path.exists(pt_path):
        import torch  # CPU-only torch is available in this image
        sd = torch.load(pt_path, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"no checkpoint found under {model_dir}")


def load_bert_config(model_dir: str, num_labels: Optional[int] = None
                     ) -> BertConfig:
    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    return BertConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        intermediate_size=hf["intermediate_size"],
        max_position_embeddings=hf["max_position_embeddings"],
        type_vocab_size=hf.get("type_vocab_size", 2),
        hidden_dropout_prob=hf.get("hidden_dropout_prob", 0.1),
        attention_probs_dropout_prob=hf.get("attention_probs_dropout_prob",
                                            0.1),
        layer_norm_eps=hf.get("layer_norm_eps", 1e-12),
        num_labels=num_labels or len(hf.get("id2label", {0: 0, 1: 1})),
    )


def _lin(sd, prefix) -> Dict:
    return {"kernel": jnp.asarray(sd[prefix + ".weight"]),
            "bias": jnp.asarray(sd[prefix + ".bias"])}


def _ln(sd, prefix) -> Dict:
    return {"scale": jnp.asarray(sd[prefix + ".weight"]),
            "bias": jnp.asarray(sd[prefix + ".bias"])}


def bert_params_from_state_dict(sd: Dict[str, np.ndarray], cfg: BertConfig,
                                backbone: str = "bert") -> Dict:
    """Map HF BertForSequenceClassification names onto our pytree.

    Kernels stay in the torch ``(out, in)`` layout — the forward contracts
    accordingly — so per-channel quantization axes match the reference.
    """
    sd = {k[len("model."):] if k.startswith("model.") else k: v
          for k, v in sd.items()}
    e = f"{backbone}.embeddings"
    params = {
        "embeddings": {
            "word": jnp.asarray(sd[f"{e}.word_embeddings.weight"]),
            "position": jnp.asarray(sd[f"{e}.position_embeddings.weight"]),
            "token_type": jnp.asarray(sd[f"{e}.token_type_embeddings.weight"]),
            "ln": _ln(sd, f"{e}.LayerNorm"),
        },
        "layers": [],
        "pooler": _lin(sd, f"{backbone}.pooler.dense"),
        "classifier": _lin(sd, "classifier"),
    }
    for i in range(cfg.num_hidden_layers):
        p = f"{backbone}.encoder.layer.{i}"
        params["layers"].append({
            "attn": {
                "q": _lin(sd, f"{p}.attention.self.query"),
                "k": _lin(sd, f"{p}.attention.self.key"),
                "v": _lin(sd, f"{p}.attention.self.value"),
            },
            "attn_out": {
                "dense": _lin(sd, f"{p}.attention.output.dense"),
                "ln": _ln(sd, f"{p}.attention.output.LayerNorm"),
            },
            "ffn": {
                "inter": _lin(sd, f"{p}.intermediate.dense"),
                "dense": _lin(sd, f"{p}.output.dense"),
                "ln": _ln(sd, f"{p}.output.LayerNorm"),
            },
        })
    return params


def load_bert(model_dir: str, num_labels: Optional[int] = None
              ) -> Tuple[BertConfig, Dict]:
    """Load config + params from a local HF BERT checkpoint directory."""
    cfg = load_bert_config(model_dir, num_labels)
    sd = load_hf_state_dict(model_dir)
    return cfg, bert_params_from_state_dict(sd, cfg)


def load_roberta_config(model_dir: str, num_labels: Optional[int] = None):
    from transformer_quantization_tpu.models.roberta import RobertaConfig

    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    return RobertaConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        intermediate_size=hf["intermediate_size"],
        max_position_embeddings=hf["max_position_embeddings"],
        type_vocab_size=hf.get("type_vocab_size", 1),
        hidden_dropout_prob=hf.get("hidden_dropout_prob", 0.1),
        attention_probs_dropout_prob=hf.get("attention_probs_dropout_prob",
                                            0.1),
        layer_norm_eps=hf.get("layer_norm_eps", 1e-5),
        pad_token_id=hf.get("pad_token_id", 1),
        num_labels=num_labels or len(hf.get("id2label", {0: 0, 1: 1})),
    )


def roberta_params_from_state_dict(sd: Dict[str, np.ndarray], cfg) -> Dict:
    """Map HF RobertaForSequenceClassification names onto our pytree."""
    backbone_sd = {k: v for k, v in sd.items()
                   if not k.startswith("classifier")}
    # RobertaForSequenceClassification has no pooler and a two-layer head;
    # satisfy the shared BERT mapper with placeholders, then replace
    for k in ("roberta.pooler.dense.weight", "roberta.pooler.dense.bias",
              "classifier.weight", "classifier.bias"):
        backbone_sd.setdefault(k, np.zeros((1, 1) if k.endswith("weight")
                                           else (1,), np.float32))
    params = bert_params_from_state_dict(backbone_sd, cfg, backbone="roberta")
    del params["pooler"]
    params["classifier"] = {
        "dense": _lin(sd, "classifier.dense"),
        "out_proj": _lin(sd, "classifier.out_proj"),
    }
    return params


def load_roberta(model_dir: str, num_labels: Optional[int] = None):
    """Load config + params from a local HF RoBERTa checkpoint directory."""
    cfg = load_roberta_config(model_dir, num_labels)
    sd = load_hf_state_dict(model_dir)
    return cfg, roberta_params_from_state_dict(sd, cfg)


def load_mobilebert_config(model_dir: str, num_labels: Optional[int] = None):
    from transformer_quantization_tpu.models.mobilebert import MobileBertConfig

    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    return MobileBertConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        intermediate_size=hf["intermediate_size"],
        embedding_size=hf.get("embedding_size", 128),
        intra_bottleneck_size=hf.get("intra_bottleneck_size", 128),
        num_feedforward_networks=hf.get("num_feedforward_networks", 4),
        use_bottleneck=hf.get("use_bottleneck", True),
        use_bottleneck_attention=hf.get("use_bottleneck_attention", False),
        key_query_shared_bottleneck=hf.get("key_query_shared_bottleneck",
                                           True),
        trigram_input=hf.get("trigram_input", True),
        hidden_act=hf.get("hidden_act", "relu"),
        classifier_activation=hf.get("classifier_activation", False),
        max_position_embeddings=hf["max_position_embeddings"],
        type_vocab_size=hf.get("type_vocab_size", 2),
        hidden_dropout_prob=hf.get("hidden_dropout_prob", 0.0),
        attention_probs_dropout_prob=hf.get("attention_probs_dropout_prob",
                                            0.1),
        num_labels=num_labels or len(hf.get("id2label", {0: 0, 1: 1})),
    )


def _nonorm(sd, prefix) -> Dict:
    return {"weight": jnp.asarray(sd[prefix + ".weight"]),
            "bias": jnp.asarray(sd[prefix + ".bias"])}


def mobilebert_params_from_state_dict(sd: Dict[str, np.ndarray], cfg) -> Dict:
    """Map HF MobileBertForSequenceClassification names onto our pytree."""
    sd = {k[len("model."):] if k.startswith("model.") else k: v
          for k, v in sd.items()}
    e = "mobilebert.embeddings"
    params: Dict = {
        "embeddings": {
            "word": jnp.asarray(sd[f"{e}.word_embeddings.weight"]),
            "position": jnp.asarray(sd[f"{e}.position_embeddings.weight"]),
            "token_type": jnp.asarray(
                sd[f"{e}.token_type_embeddings.weight"]),
            "transform": _lin(sd, f"{e}.embedding_transformation"),
            "norm": _nonorm(sd, f"{e}.LayerNorm"),
        },
        "layers": [],
        "pooler": (_lin(sd, "mobilebert.pooler.dense")
                   if "mobilebert.pooler.dense.weight" in sd
                   else {"kernel": None, "bias": None}),
        "classifier": _lin(sd, "classifier"),
    }
    for i in range(cfg.num_hidden_layers):
        p = f"mobilebert.encoder.layer.{i}"
        layer: Dict = {
            "attn": {
                "q": _lin(sd, f"{p}.attention.self.query"),
                "k": _lin(sd, f"{p}.attention.self.key"),
                "v": _lin(sd, f"{p}.attention.self.value"),
            },
            "attn_out": {
                "dense": _lin(sd, f"{p}.attention.output.dense"),
                "norm": _nonorm(sd, f"{p}.attention.output.LayerNorm"),
            },
            "inter": _lin(sd, f"{p}.intermediate.dense"),
            "out": {
                "dense": _lin(sd, f"{p}.output.dense"),
                "norm": _nonorm(sd, f"{p}.output.LayerNorm"),
            },
        }
        if cfg.use_bottleneck:
            layer["bottleneck"] = {
                "input": {
                    "dense": _lin(sd, f"{p}.bottleneck.input.dense"),
                    "norm": _nonorm(sd, f"{p}.bottleneck.input.LayerNorm"),
                },
            }
            if cfg.has_shared_kq_bottleneck:
                layer["bottleneck"]["attention"] = {
                    "dense": _lin(sd, f"{p}.bottleneck.attention.dense"),
                    "norm": _nonorm(sd,
                                    f"{p}.bottleneck.attention.LayerNorm"),
                }
            layer["out"]["bn_dense"] = _lin(sd, f"{p}.output.bottleneck.dense")
            layer["out"]["bn_norm"] = _nonorm(
                sd, f"{p}.output.bottleneck.LayerNorm")
        ffns = []
        for j in range(cfg.num_stacked_ffn):
            ffns.append({
                "inter": _lin(sd, f"{p}.ffn.{j}.intermediate.dense"),
                "dense": _lin(sd, f"{p}.ffn.{j}.output.dense"),
                "norm": _nonorm(sd, f"{p}.ffn.{j}.output.LayerNorm"),
            })
        layer["ffn"] = ffns
        params["layers"].append(layer)
    return params


def load_mobilebert(model_dir: str, num_labels: Optional[int] = None):
    """Load config + params from a local HF MobileBERT checkpoint dir."""
    cfg = load_mobilebert_config(model_dir, num_labels)
    sd = load_hf_state_dict(model_dir)
    return cfg, mobilebert_params_from_state_dict(sd, cfg)


def load_albert(model_dir: str, num_labels: Optional[int] = None):
    """Load a local HF AlbertForSequenceClassification checkpoint
    (1 hidden group / 1 inner layer — the released v2 configs)."""
    from transformer_quantization_tpu.models.albert import AlbertConfig

    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    assert hf.get("num_hidden_groups", 1) == 1
    assert hf.get("inner_group_num", 1) == 1
    cfg = AlbertConfig(
        vocab_size=hf["vocab_size"],
        embedding_size=hf.get("embedding_size", 128),
        hidden_size=hf["hidden_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        intermediate_size=hf["intermediate_size"],
        max_position_embeddings=hf["max_position_embeddings"],
        type_vocab_size=hf.get("type_vocab_size", 2),
        hidden_dropout_prob=hf.get("hidden_dropout_prob", 0.0),
        attention_probs_dropout_prob=hf.get(
            "attention_probs_dropout_prob", 0.0),
        layer_norm_eps=hf.get("layer_norm_eps", 1e-12),
        hidden_act=hf.get("hidden_act", "gelu_new"),
        num_labels=num_labels or len(hf.get("id2label", {0: 0, 1: 1})),
    )
    sd = load_hf_state_dict(model_dir)
    e = "albert.embeddings"
    lyr = "albert.encoder.albert_layer_groups.0.albert_layers.0"
    params = {
        "embeddings": {
            "word": jnp.asarray(sd[f"{e}.word_embeddings.weight"]),
            "position": jnp.asarray(sd[f"{e}.position_embeddings.weight"]),
            "token_type": jnp.asarray(
                sd[f"{e}.token_type_embeddings.weight"]),
            "ln": _ln(sd, f"{e}.LayerNorm"),
        },
        "emb_proj": _lin(sd, "albert.encoder.embedding_hidden_mapping_in"),
        "shared": {
            "attn": {
                "q": _lin(sd, f"{lyr}.attention.query"),
                "k": _lin(sd, f"{lyr}.attention.key"),
                "v": _lin(sd, f"{lyr}.attention.value"),
            },
            "attn_out": {
                "dense": _lin(sd, f"{lyr}.attention.dense"),
                "ln": _ln(sd, f"{lyr}.attention.LayerNorm"),
            },
            "ffn": {
                "inter": _lin(sd, f"{lyr}.ffn"),
                "dense": _lin(sd, f"{lyr}.ffn_output"),
                "ln": _ln(sd, f"{lyr}.full_layer_layer_norm"),
            },
        },
        "pooler": _lin(sd, "albert.pooler"),
        "classifier": _lin(sd, "classifier"),
    }
    return cfg, params


def load_squeezebert(model_dir: str, num_labels: Optional[int] = None):
    """Load a local HF SqueezeBertForSequenceClassification checkpoint.

    Kernel-size-1 conv weights ``(O, I/g, 1)`` squeeze to the grouped
    kernel layout ``(O, I/g)``.
    """
    from transformer_quantization_tpu.models.squeezebert import (
        SqueezeBertConfig,
    )

    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    cfg = SqueezeBertConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        intermediate_size=hf["intermediate_size"],
        max_position_embeddings=hf["max_position_embeddings"],
        type_vocab_size=hf.get("type_vocab_size", 2),
        hidden_dropout_prob=hf.get("hidden_dropout_prob", 0.1),
        attention_probs_dropout_prob=hf.get("attention_probs_dropout_prob",
                                            0.1),
        layer_norm_eps=hf.get("layer_norm_eps", 1e-12),
        hidden_act=hf.get("hidden_act", "gelu"),
        q_groups=hf.get("q_groups", 4),
        k_groups=hf.get("k_groups", 4),
        v_groups=hf.get("v_groups", 4),
        post_attention_groups=hf.get("post_attention_groups", 1),
        intermediate_groups=hf.get("intermediate_groups", 4),
        output_groups=hf.get("output_groups", 4),
        num_labels=num_labels or len(hf.get("id2label", {0: 0, 1: 1})),
    )
    sd = load_hf_state_dict(model_dir)

    def _conv(prefix):
        return {"kernel": jnp.asarray(sd[prefix + ".weight"]).squeeze(-1),
                "bias": jnp.asarray(sd[prefix + ".bias"])}

    e = "transformer.embeddings" if "transformer.embeddings." \
        "word_embeddings.weight" in sd else "squeezebert.embeddings"
    root = e.rsplit(".", 1)[0]
    params = {
        "embeddings": {
            "word": jnp.asarray(sd[f"{e}.word_embeddings.weight"]),
            "position": jnp.asarray(sd[f"{e}.position_embeddings.weight"]),
            "token_type": jnp.asarray(
                sd[f"{e}.token_type_embeddings.weight"]),
            "ln": _ln(sd, f"{e}.LayerNorm"),
        },
        "layers": [],
        "pooler": _lin(sd, f"{root}.pooler.dense"),
        "classifier": _lin(sd, "classifier"),
    }
    for i in range(cfg.num_hidden_layers):
        p = f"{root}.encoder.layers.{i}"
        params["layers"].append({
            "attn": {
                "q": _conv(f"{p}.attention.query"),
                "k": _conv(f"{p}.attention.key"),
                "v": _conv(f"{p}.attention.value"),
            },
            "attn_out": {
                "dense": _conv(f"{p}.post_attention.conv1d"),
                "ln": _ln(sd, f"{p}.post_attention.layernorm"),
            },
            "ffn": {
                "inter": _conv(f"{p}.intermediate.conv1d"),
                "dense": _conv(f"{p}.output.conv1d"),
                "ln": _ln(sd, f"{p}.output.layernorm"),
            },
        })
    return cfg, params


def load_distilbert(model_dir: str, num_labels: Optional[int] = None):
    """Load a local HF DistilBertForSequenceClassification checkpoint.

    HF name mapping: ``distilbert.transformer.layer.{i}`` with
    q_lin/k_lin/v_lin/out_lin, sa_layer_norm, ffn.lin1/lin2,
    output_layer_norm; head = pre_classifier + classifier.
    """
    from transformer_quantization_tpu.models.distilbert import (
        DistilBertConfig,
    )

    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    cfg = DistilBertConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf.get("dim", 768),
        num_hidden_layers=hf.get("n_layers", 6),
        num_attention_heads=hf.get("n_heads", 12),
        intermediate_size=hf.get("hidden_dim", 3072),
        max_position_embeddings=hf.get("max_position_embeddings", 512),
        hidden_dropout_prob=hf.get("dropout", 0.1),
        attention_probs_dropout_prob=hf.get("attention_dropout", 0.1),
        num_labels=num_labels or len(hf.get("id2label", {0: 0, 1: 1})),
    )
    sd = load_hf_state_dict(model_dir)
    e = "distilbert.embeddings"
    params = {
        "embeddings": {
            "word": jnp.asarray(sd[f"{e}.word_embeddings.weight"]),
            "position": jnp.asarray(sd[f"{e}.position_embeddings.weight"]),
            "token_type": jnp.zeros((1, cfg.hidden_size), jnp.float32),
            "ln": _ln(sd, f"{e}.LayerNorm"),
        },
        "layers": [],
        "classifier": {
            "pre": _lin(sd, "pre_classifier"),
            "out": _lin(sd, "classifier"),
        },
    }
    for i in range(cfg.num_hidden_layers):
        p = f"distilbert.transformer.layer.{i}"
        params["layers"].append({
            "attn": {
                "q": _lin(sd, f"{p}.attention.q_lin"),
                "k": _lin(sd, f"{p}.attention.k_lin"),
                "v": _lin(sd, f"{p}.attention.v_lin"),
            },
            "attn_out": {
                "dense": _lin(sd, f"{p}.attention.out_lin"),
                "ln": _ln(sd, f"{p}.sa_layer_norm"),
            },
            "ffn": {
                "inter": _lin(sd, f"{p}.ffn.lin1"),
                "dense": _lin(sd, f"{p}.ffn.lin2"),
                "ln": _ln(sd, f"{p}.output_layer_norm"),
            },
        })
    return cfg, params
