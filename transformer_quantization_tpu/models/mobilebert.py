"""Quantized MobileBERT for sequence classification, TPU-native.

Functional re-design of the reference's
``QuantizedMobileBertForSequenceClassification``
(reference: models/quantized_mobilebert.py, 760 LoC — SURVEY.md C26).
Structure (google/mobilebert-uncased):

- trigram embeddings: 128-d word vectors concatenated with their left and
  right neighbors into 384-d, then ``embedding_transformation`` to 512-d;
  sum with position embeddings (quantized), then token-type embeddings
  (quantized) — note the order differs from BERT
  (quantized_mobilebert.py:117-166)
- ``NoNorm`` layers (elementwise ``x*w+b``) everywhere LayerNorm would be;
  both w and b are quantized through the layer's weight quantizer
  (QuantNoNorm, quantized_mobilebert.py:58-72)
- inverted-bottleneck encoder layers: bottleneck-in projections (shared
  key/query bottleneck), 4 attention heads over 128-d true hidden size,
  ``num_feedforward_networks - 1`` stacked FFNs each with its own residual
  quantizer, then intermediate+output with a bottleneck-out back to 512-d
  with two residual quantizers (quantized_mobilebert.py:405-545)
- per-site static enable/disable + attn-probs overrides via the MobileBERT
  ``quant_dict`` (DEFAULT_QUANT_DICT, quantized_mobilebert.py:31-55)
- pooler is a pass-through when ``classifier_activation`` is false (the
  released checkpoint's setting), else dense+Tanh fused
  (quantized_mobilebert.py:549-569)
- ``quant_setup`` supports only 'all'/'FP_logits'
  (quantized_mobilebert.py:692-699)
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from transformer_quantization_tpu.models import bert as B
from transformer_quantization_tpu.ops import layers as L
from transformer_quantization_tpu.ops.layers import (
    dropout,
    quant_embedding,
    quant_linear,
    quant_nonorm,
)
from transformer_quantization_tpu.quant.qconfig import (
    QuantConfigBuilder,
    QuantDefaults,
    QuantModelConfig,
    QuantMode,
)
from transformer_quantization_tpu.quant.ranges import OptMethod, RangeMethod

Array = jax.Array

# reference: quantized_mobilebert.py:31-49
DEFAULT_QUANT_DICT = {
    "sum_input_pos_embd": True,
    "sum_token_type_embd": True,
    "attn_scores": True,
    "attn_probs": True,
    "attn_probs_n_bits_act": None,
    "attn_probs_act_range_method": None,
    "attn_probs_act_range_options": None,
    "attn_output": True,
    "res_self_output": True,
    "res_output": True,
    "res_output_bottleneck": True,
    "res_ffn_output": True,
}


@dataclasses.dataclass(frozen=True)
class MobileBertConfig:
    """HF ``MobileBertConfig`` subset (google/mobilebert-uncased defaults)."""

    vocab_size: int = 30522
    hidden_size: int = 512
    num_hidden_layers: int = 24
    num_attention_heads: int = 4
    intermediate_size: int = 512
    embedding_size: int = 128
    intra_bottleneck_size: int = 128
    num_feedforward_networks: int = 4
    use_bottleneck: bool = True
    use_bottleneck_attention: bool = False
    key_query_shared_bottleneck: bool = True
    trigram_input: bool = True
    hidden_act: str = "relu"
    classifier_activation: bool = False
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    hidden_dropout_prob: float = 0.0
    attention_probs_dropout_prob: float = 0.1
    num_labels: int = 2
    initializer_range: float = 0.02

    @property
    def true_hidden_size(self) -> int:
        return (self.intra_bottleneck_size if self.use_bottleneck
                else self.hidden_size)

    @property
    def head_dim(self) -> int:
        return self.true_hidden_size // self.num_attention_heads

    @property
    def num_stacked_ffn(self) -> int:
        return self.num_feedforward_networks - 1

    @property
    def has_shared_kq_bottleneck(self) -> bool:
        return (self.use_bottleneck and self.key_query_shared_bottleneck
                and not self.use_bottleneck_attention)


def make_quant_dict(partial: Optional[Mapping] = None) -> Dict:
    """DEFAULT_QUANT_DICT overlaid with user overrides
    (quantized_mobilebert.py:52-55)."""
    qd = dict(DEFAULT_QUANT_DICT)
    qd.update(partial or {})
    return qd


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------


def _nonorm_init(dim):
    return {"weight": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def init_mobilebert_params(rng: jax.Array, cfg: MobileBertConfig) -> Dict:
    std = cfg.initializer_range
    keys = jax.random.split(rng, 8 + cfg.num_hidden_layers)
    H, TH, E, I = (cfg.hidden_size, cfg.true_hidden_size, cfg.embedding_size,
                   cfg.intermediate_size)

    def emb(k, n, d):
        return (std * jax.random.normal(k, (n, d))).astype(jnp.float32)

    trigram_in = 3 * E if cfg.trigram_input else E
    params: Dict = {
        "embeddings": {
            "word": emb(keys[0], cfg.vocab_size, E),
            "position": emb(keys[1], cfg.max_position_embeddings, H),
            "token_type": emb(keys[2], cfg.type_vocab_size, H),
            "transform": B._linear_init(keys[3], H, trigram_in, std),
            "norm": _nonorm_init(H),
        },
        "layers": [],
        "pooler": (B._linear_init(keys[4], H, H, std)
                   if cfg.classifier_activation else
                   {"kernel": None, "bias": None}),
        "classifier": B._linear_init(keys[5], cfg.num_labels, H, std),
    }
    if not cfg.classifier_activation:
        # HF checkpoints still carry pooler weights; keep a slot for loaders
        params["pooler"] = B._linear_init(keys[4], H, H, std)
    for i in range(cfg.num_hidden_layers):
        ks = jax.random.split(keys[8 + i], 16)
        layer: Dict = {
            "attn": {
                "q": B._linear_init(ks[0], TH, TH, std),
                "k": B._linear_init(ks[1], TH, TH, std),
                "v": B._linear_init(
                    ks[2], TH,
                    TH if cfg.use_bottleneck_attention else H, std),
            },
            "attn_out": {
                "dense": B._linear_init(ks[3], TH, TH, std),
                "norm": _nonorm_init(TH),
            },
            "inter": B._linear_init(ks[4], I, TH, std),
            "out": {
                "dense": B._linear_init(ks[5], TH, I, std),
                "norm": _nonorm_init(TH),
            },
        }
        if cfg.use_bottleneck:
            layer["bottleneck"] = {
                "input": {"dense": B._linear_init(ks[6], TH, H, std),
                          "norm": _nonorm_init(TH)},
            }
            if cfg.has_shared_kq_bottleneck:
                layer["bottleneck"]["attention"] = {
                    "dense": B._linear_init(ks[7], TH, H, std),
                    "norm": _nonorm_init(TH),
                }
            layer["out"]["bn_dense"] = B._linear_init(ks[8], H, TH, std)
            layer["out"]["bn_norm"] = _nonorm_init(H)
        ffns = []
        for j in range(cfg.num_stacked_ffn):
            ffns.append({
                "inter": B._linear_init(ks[9 + 2 * j], I, TH, std),
                "dense": B._linear_init(ks[10 + 2 * j], TH, I, std),
                "norm": _nonorm_init(TH),
            })
        layer["ffn"] = ffns
        params["layers"].append(layer)
    return params


# ---------------------------------------------------------------------------
# Quant site inventory
# ---------------------------------------------------------------------------


def _declare_nonorm(b: QuantConfigBuilder, name: str) -> None:
    b.weight(f"{name}.w")
    b.act(f"{name}.out")


def _declare_dense(b: QuantConfigBuilder, name: str) -> None:
    b.weight(f"{name}.w")
    b.act(f"{name}.out")


def declare_mobilebert_sites(defaults: QuantDefaults, cfg: MobileBertConfig,
                             quant_setup: str = "all",
                             quant_dict: Optional[Mapping] = None
                             ) -> QuantModelConfig:
    """Declare every quantizer site, honoring the MobileBERT quant_dict's
    static enables and attn-probs overrides
    (quantized_mobilebert.py:77-207)."""
    qd = make_quant_dict(quant_dict)
    b = QuantConfigBuilder(defaults)

    b.weight("emb.word.w")
    b.weight("emb.position.w")
    b.weight("emb.token_type.w")
    _declare_dense(b, "emb.transform")
    b.act("emb.sum_pos", enabled=bool(qd["sum_input_pos_embd"]))
    b.act("emb.sum_tt", enabled=bool(qd["sum_token_type_embd"]))
    _declare_nonorm(b, "emb.norm")

    probs_over: Dict = {}
    if qd["attn_probs_n_bits_act"] is not None:
        probs_over["n_bits"] = int(qd["attn_probs_n_bits_act"])
    if qd["attn_probs_act_range_method"] is not None:
        probs_over["range_method"] = RangeMethod[
            qd["attn_probs_act_range_method"]]
    if qd["attn_probs_act_range_options"]:
        # the only range option the reference recipes use here is
        # opt_method (quantized_mobilebert.py:195-199)
        opts = dict(qd["attn_probs_act_range_options"])
        om = opts.get("opt_method")
        if om is not None:
            probs_over["opt_method"] = (om if isinstance(om, OptMethod)
                                        else OptMethod[om])

    for i in range(cfg.num_hidden_layers):
        p = f"L{i}."
        if cfg.use_bottleneck:
            _declare_dense(b, p + "bn.in.dense")
            _declare_nonorm(b, p + "bn.in.norm")
            if cfg.has_shared_kq_bottleneck:
                _declare_dense(b, p + "bn.attn.dense")
                _declare_nonorm(b, p + "bn.attn.norm")
        for lin in ("attn.q", "attn.k", "attn.v"):
            _declare_dense(b, p + lin)
        b.act(p + "attn.scores", enabled=bool(qd["attn_scores"]))
        b.act(p + "attn.probs", enabled=bool(qd["attn_probs"]), **probs_over)
        b.act(p + "attn.context", enabled=bool(qd["attn_output"]))
        _declare_dense(b, p + "attn_out.dense")
        b.act(p + "attn_out.res", enabled=bool(qd["res_self_output"]))
        _declare_nonorm(b, p + "attn_out.norm")
        for j in range(cfg.num_stacked_ffn):
            _declare_dense(b, p + f"ffn{j}.inter")
            _declare_dense(b, p + f"ffn{j}.dense")
            b.act(p + f"ffn{j}.res", enabled=bool(qd["res_ffn_output"]))
            _declare_nonorm(b, p + f"ffn{j}.norm")
        _declare_dense(b, p + "ffn.inter")
        _declare_dense(b, p + "out.dense")
        b.act(p + "out.res", enabled=bool(qd["res_output"]))
        _declare_nonorm(b, p + "out.norm")
        if cfg.use_bottleneck:
            _declare_dense(b, p + "out.bn.dense")
            b.act(p + "out.bn.res",
                  enabled=bool(qd["res_output_bottleneck"]))
            _declare_nonorm(b, p + "out.bn.norm")

    if cfg.classifier_activation:
        _declare_dense(b, "pooler.dense")
    b.weight("classifier.w")
    if quant_setup == "FP_logits":
        b.act("classifier.out", enabled=False)
    elif quant_setup in ("all", None):
        b.act("classifier.out")
    else:
        raise ValueError(f"Quantization setup '{quant_setup}' not supported.")
    return b.build()


def apply_mobilebert_quant_dict(qcfg: QuantModelConfig, quant_dict: Mapping,
                                n_layers: int) -> QuantModelConfig:
    """MobileBERT consumes its quant_dict at declaration time
    (the boolean/override language above), not through BERT's letter
    language (main.py:446 wires letters only for bert_base/large)."""
    return qcfg


def apply_peg_wiring(qcfg: QuantModelConfig, n_layers: int,
                     **_kw) -> QuantModelConfig:
    """The reference applies per-embedding/per-group wiring only to BERT
    (main.py:366-369); MobileBERT passes through unchanged."""
    return qcfg


# ---------------------------------------------------------------------------
# Weight tensors / AdaRound / int packing
# ---------------------------------------------------------------------------


def _nonorm_range_tensor(p: Dict) -> Array:
    # shared-quantizer semantic: range covers both w and b (ops/layers.py
    # quant_nonorm)
    return jnp.concatenate([p["weight"], p["bias"]])


def mobilebert_weight_site_tensors(params: Dict) -> Dict[str, Array]:
    e = params["embeddings"]
    out = {
        "emb.word.w": e["word"],
        "emb.position.w": e["position"],
        "emb.token_type.w": e["token_type"],
        "emb.transform.w": e["transform"]["kernel"],
        "emb.norm.w": _nonorm_range_tensor(e["norm"]),
        "classifier.w": params["classifier"]["kernel"],
    }
    if params["pooler"].get("kernel") is not None:
        out["pooler.dense.w"] = params["pooler"]["kernel"]
    for i, layer in enumerate(params["layers"]):
        p = f"L{i}."
        if "bottleneck" in layer:
            bn = layer["bottleneck"]
            out[p + "bn.in.dense.w"] = bn["input"]["dense"]["kernel"]
            out[p + "bn.in.norm.w"] = _nonorm_range_tensor(bn["input"]["norm"])
            if "attention" in bn:
                out[p + "bn.attn.dense.w"] = bn["attention"]["dense"]["kernel"]
                out[p + "bn.attn.norm.w"] = _nonorm_range_tensor(
                    bn["attention"]["norm"])
        out[p + "attn.q.w"] = layer["attn"]["q"]["kernel"]
        out[p + "attn.k.w"] = layer["attn"]["k"]["kernel"]
        out[p + "attn.v.w"] = layer["attn"]["v"]["kernel"]
        out[p + "attn_out.dense.w"] = layer["attn_out"]["dense"]["kernel"]
        out[p + "attn_out.norm.w"] = _nonorm_range_tensor(
            layer["attn_out"]["norm"])
        for j, f in enumerate(layer["ffn"]):
            out[p + f"ffn{j}.inter.w"] = f["inter"]["kernel"]
            out[p + f"ffn{j}.dense.w"] = f["dense"]["kernel"]
            out[p + f"ffn{j}.norm.w"] = _nonorm_range_tensor(f["norm"])
        out[p + "ffn.inter.w"] = layer["inter"]["kernel"]
        out[p + "out.dense.w"] = layer["out"]["dense"]["kernel"]
        out[p + "out.norm.w"] = _nonorm_range_tensor(layer["out"]["norm"])
        if "bn_dense" in layer["out"]:
            out[p + "out.bn.dense.w"] = layer["out"]["bn_dense"]["kernel"]
            out[p + "out.bn.norm.w"] = _nonorm_range_tensor(
                layer["out"]["bn_norm"])
    return out


def mobilebert_adaround_specs(params: Dict, cfg: MobileBertConfig
                              ) -> List[Tuple[str, Dict]]:
    """Every weighted module in module order
    (utils/adaround_utils.py:58-76 enumerates the tree recursively)."""
    e = params["embeddings"]
    specs: List[Tuple[str, Dict]] = [
        ("emb.word", {"kind": "embedding", "w": e["word"]}),
        ("emb.position", {"kind": "embedding", "w": e["position"]}),
        ("emb.token_type", {"kind": "embedding", "w": e["token_type"]}),
        ("emb.transform", {"kind": "linear", "w": e["transform"]["kernel"],
                           "b": e["transform"]["bias"], "act": None}),
        ("emb.norm", {"kind": "nonorm",
                      "w": _nonorm_range_tensor(e["norm"])}),
    ]
    act = cfg.hidden_act
    for i, layer in enumerate(params["layers"]):
        p = f"L{i}."
        if "bottleneck" in layer:
            bn = layer["bottleneck"]
            specs += [
                (p + "bn.in.dense",
                 {"kind": "linear", "w": bn["input"]["dense"]["kernel"],
                  "b": bn["input"]["dense"]["bias"], "act": None}),
                (p + "bn.in.norm",
                 {"kind": "nonorm",
                  "w": _nonorm_range_tensor(bn["input"]["norm"])}),
            ]
            if "attention" in bn:
                specs += [
                    (p + "bn.attn.dense",
                     {"kind": "linear", "w": bn["attention"]["dense"]["kernel"],
                      "b": bn["attention"]["dense"]["bias"], "act": None}),
                    (p + "bn.attn.norm",
                     {"kind": "nonorm",
                      "w": _nonorm_range_tensor(bn["attention"]["norm"])}),
                ]
        a, so = layer["attn"], layer["attn_out"]
        specs += [
            (p + "attn.q", {"kind": "linear", "w": a["q"]["kernel"],
                            "b": a["q"]["bias"], "act": None}),
            (p + "attn.k", {"kind": "linear", "w": a["k"]["kernel"],
                            "b": a["k"]["bias"], "act": None}),
            (p + "attn.v", {"kind": "linear", "w": a["v"]["kernel"],
                            "b": a["v"]["bias"], "act": None}),
            (p + "attn_out.dense", {"kind": "linear",
                                    "w": so["dense"]["kernel"],
                                    "b": so["dense"]["bias"], "act": None}),
            (p + "attn_out.norm", {"kind": "nonorm",
                                   "w": _nonorm_range_tensor(so["norm"])}),
        ]
        for j, f in enumerate(layer["ffn"]):
            specs += [
                (p + f"ffn{j}.inter", {"kind": "linear",
                                       "w": f["inter"]["kernel"],
                                       "b": f["inter"]["bias"], "act": act}),
                (p + f"ffn{j}.dense", {"kind": "linear",
                                       "w": f["dense"]["kernel"],
                                       "b": f["dense"]["bias"], "act": None}),
                (p + f"ffn{j}.norm", {"kind": "nonorm",
                                      "w": _nonorm_range_tensor(f["norm"])}),
            ]
        o = layer["out"]
        specs += [
            (p + "ffn.inter", {"kind": "linear", "w": layer["inter"]["kernel"],
                               "b": layer["inter"]["bias"], "act": act}),
            (p + "out.dense", {"kind": "linear", "w": o["dense"]["kernel"],
                               "b": o["dense"]["bias"], "act": None}),
            (p + "out.norm", {"kind": "nonorm",
                              "w": _nonorm_range_tensor(o["norm"])}),
        ]
        if "bn_dense" in o:
            specs += [
                (p + "out.bn.dense", {"kind": "linear",
                                      "w": o["bn_dense"]["kernel"],
                                      "b": o["bn_dense"]["bias"],
                                      "act": None}),
                (p + "out.bn.norm", {"kind": "nonorm",
                                     "w": _nonorm_range_tensor(o["bn_norm"])}),
            ]
    if cfg.classifier_activation:
        specs.append(("pooler.dense",
                      {"kind": "linear", "w": params["pooler"]["kernel"],
                       "b": params["pooler"]["bias"], "act": "tanh"}))
    specs.append(("classifier",
                  {"kind": "linear", "w": params["classifier"]["kernel"],
                   "b": params["classifier"]["bias"], "act": None}))
    return specs


def build_mobilebert_int_params(params: Dict, qcfg: QuantModelConfig,
                                qstate: Mapping,
                                use_int4: bool = False) -> Dict:
    tensors = {k: v for k, v in mobilebert_weight_site_tensors(params).items()
               if not k.endswith("norm.w")}
    return B.pack_int_params(tensors, qcfg, qstate, use_int4=use_int4)


# ---------------------------------------------------------------------------
# Forward pass
# ---------------------------------------------------------------------------


def _embeddings(ctx, params, cfg: MobileBertConfig, input_ids, token_type_ids,
                position_ids, train, rng):
    e = params["embeddings"]
    x = quant_embedding(ctx, "emb.word", input_ids, e["word"])  # (B, T, E)
    if cfg.trigram_input:
        # cat(x_{t+1}, x_t, x_{t-1}) along features, zero-padded at the ends
        # (quantized_mobilebert.py:141-156)
        nxt = jnp.pad(x[:, 1:], ((0, 0), (0, 1), (0, 0)))
        prv = jnp.pad(x[:, :-1], ((0, 0), (1, 0), (0, 0)))
        x = jnp.concatenate([nxt, x, prv], axis=2)
    if cfg.trigram_input or cfg.embedding_size != cfg.hidden_size:
        x = quant_linear(ctx, "emb.transform", x,
                         e["transform"]["kernel"], e["transform"]["bias"])
    pos = quant_embedding(ctx, "emb.position", position_ids, e["position"])
    tok = quant_embedding(ctx, "emb.token_type", token_type_ids,
                          e["token_type"])
    x = ctx.act("emb.sum_pos", x + pos)
    x = ctx.act("emb.sum_tt", x + tok)
    x = quant_nonorm(ctx, "emb.norm", x, e["norm"]["weight"],
                     e["norm"]["bias"])
    return dropout(x, cfg.hidden_dropout_prob, rng, not train)


def _attention(ctx, layer, cfg: MobileBertConfig, q_in, k_in, v_in,
               layer_input, mask_bias, prefix, train, rng,
               qk_site=None, v_site=None):
    """Self-attention + self-output (quantized_mobilebert.py:168-305)."""
    B_, T, _ = q_in.shape
    nh, hd, TH = cfg.num_attention_heads, cfg.head_dim, cfg.true_hidden_size
    a = layer["attn"]
    q = quant_linear(ctx, prefix + "attn.q", q_in, a["q"]["kernel"],
                     a["q"]["bias"], input_site=qk_site)
    k = quant_linear(ctx, prefix + "attn.k", k_in, a["k"]["kernel"],
                     a["k"]["bias"], input_site=qk_site)
    v = quant_linear(ctx, prefix + "attn.v", v_in, a["v"]["kernel"],
                     a["v"]["bias"], input_site=v_site)
    q = q.reshape(B_, T, nh, hd)
    k = k.reshape(B_, T, nh, hd)
    v = v.reshape(B_, T, nh, hd)

    int_engine = (bool(getattr(ctx, "int_params", None))
                  and getattr(ctx, "int8_attention", False))
    q_sp, q_qp = B._act_site_params(ctx, prefix + "attn.q.out")
    k_sp, k_qp = B._act_site_params(ctx, prefix + "attn.k.out")
    if int_engine and q_sp is not None and k_sp is not None:
        from transformer_quantization_tpu.ops import int_linear as IL

        scores = IL.int8_attention_scores(q, k, q_sp, q_qp, k_sp, k_qp)
    else:
        scores = jnp.einsum(
            "bqnd,bknd->bnqk", q, k,
            precision=L.wide_matmul_precision(
                ctx, prefix + "attn.q.out", prefix + "attn.k.out"))
    scores = ctx.act(prefix + "attn.scores", scores)
    scores = scores / jnp.sqrt(jnp.asarray(hd, q_in.dtype))
    if mask_bias is not None:
        scores = scores + mask_bias
    probs = jax.nn.softmax(scores.astype(jnp.float32),
                           axis=-1).astype(scores.dtype)
    probs = ctx.act(prefix + "attn.probs", probs)
    probs = dropout(probs, cfg.attention_probs_dropout_prob, rng, not train)
    p_sp, p_qp = B._act_site_params(ctx, prefix + "attn.probs")
    v_sp, v_qp = B._act_site_params(ctx, prefix + "attn.v.out")
    if int_engine and p_sp is not None and v_sp is not None:
        from transformer_quantization_tpu.ops import int_linear as IL

        context = IL.int8_attention_context(
            probs, v, p_sp, p_qp, v_sp, v_qp).reshape(B_, T, TH)
    else:
        context = jnp.einsum(
            "bnqk,bknd->bqnd", probs, v,
            precision=L.wide_matmul_precision(
                ctx, prefix + "attn.probs",
                prefix + "attn.v.out")).reshape(B_, T, TH)
    context = ctx.act(prefix + "attn.context", context)

    # self-output: dense -> +layer_input residual -> quant -> NoNorm
    # (no dropout in bottleneck mode, quantized_mobilebert.py:265-305)
    so = layer["attn_out"]
    y = quant_linear(ctx, prefix + "attn_out.dense", context,
                     so["dense"]["kernel"], so["dense"]["bias"],
                     input_site=prefix + "attn.context")
    if not cfg.use_bottleneck:
        y = dropout(y, cfg.hidden_dropout_prob, rng, not train)
    y = y + layer_input
    y = ctx.act(prefix + "attn_out.res", y)
    return quant_nonorm(ctx, prefix + "attn_out.norm", y,
                        so["norm"]["weight"], so["norm"]["bias"])


def _layer(ctx, layer, cfg: MobileBertConfig, h, mask_bias, prefix, train,
           rng, h_site=None):
    """One inverted-bottleneck layer (quantized_mobilebert.py:465-545)."""
    if cfg.use_bottleneck:
        bn = layer["bottleneck"]
        bi = bn["input"]
        layer_input = quant_linear(ctx, prefix + "bn.in.dense", h,
                                   bi["dense"]["kernel"], bi["dense"]["bias"],
                                   input_site=h_site)
        layer_input = quant_nonorm(ctx, prefix + "bn.in.norm", layer_input,
                                   bi["norm"]["weight"], bi["norm"]["bias"])
        if cfg.use_bottleneck_attention:
            q_in = k_in = v_in = layer_input
            qk_site = v_site = prefix + "bn.in.norm.out"
        elif cfg.key_query_shared_bottleneck:
            ba = bn["attention"]
            shared = quant_linear(ctx, prefix + "bn.attn.dense", h,
                                  ba["dense"]["kernel"], ba["dense"]["bias"],
                                  input_site=h_site)
            shared = quant_nonorm(ctx, prefix + "bn.attn.norm", shared,
                                  ba["norm"]["weight"], ba["norm"]["bias"])
            q_in, k_in, v_in = shared, shared, h
            qk_site, v_site = prefix + "bn.attn.norm.out", h_site
        else:
            q_in, k_in, v_in = h, h, h
            qk_site = v_site = h_site
    else:
        q_in = k_in = v_in = layer_input = h
        qk_site = v_site = h_site

    x = _attention(ctx, layer, cfg, q_in, k_in, v_in, layer_input, mask_bias,
                   prefix, train, rng, qk_site=qk_site, v_site=v_site)

    # stacked FFNs (quantized_mobilebert.py:446-462, :520-526)
    x_site = prefix + "attn_out.norm.out"
    for j, f in enumerate(layer["ffn"]):
        inter = quant_linear(ctx, prefix + f"ffn{j}.inter", x,
                             f["inter"]["kernel"], f["inter"]["bias"],
                             activation=cfg.hidden_act, input_site=x_site)
        y = quant_linear(ctx, prefix + f"ffn{j}.dense", inter,
                         f["dense"]["kernel"], f["dense"]["bias"],
                         input_site=prefix + f"ffn{j}.inter.out")
        y = y + x
        y = ctx.act(prefix + f"ffn{j}.res", y)
        x = quant_nonorm(ctx, prefix + f"ffn{j}.norm", y,
                         f["norm"]["weight"], f["norm"]["bias"])
        x_site = prefix + f"ffn{j}.norm.out"

    # intermediate + output (+ bottleneck-out) (quantized_mobilebert.py:
    # 361-404, :528-545)
    o = layer["out"]
    inter = quant_linear(ctx, prefix + "ffn.inter", x,
                         layer["inter"]["kernel"], layer["inter"]["bias"],
                         activation=cfg.hidden_act, input_site=x_site)
    y = quant_linear(ctx, prefix + "out.dense", inter, o["dense"]["kernel"],
                     o["dense"]["bias"], input_site=prefix + "ffn.inter.out")
    if not cfg.use_bottleneck:
        y = dropout(y, cfg.hidden_dropout_prob, rng, not train)
        y = y + x
        y = ctx.act(prefix + "out.res", y)
        return quant_nonorm(ctx, prefix + "out.norm", y, o["norm"]["weight"],
                            o["norm"]["bias"])
    y = y + x
    y = ctx.act(prefix + "out.res", y)
    y = quant_nonorm(ctx, prefix + "out.norm", y, o["norm"]["weight"],
                     o["norm"]["bias"])
    y = quant_linear(ctx, prefix + "out.bn.dense", y, o["bn_dense"]["kernel"],
                     o["bn_dense"]["bias"],
                     input_site=prefix + "out.norm.out")
    y = dropout(y, cfg.hidden_dropout_prob, rng, not train)
    y = y + h
    y = ctx.act(prefix + "out.bn.res", y)
    return quant_nonorm(ctx, prefix + "out.bn.norm", y,
                        o["bn_norm"]["weight"], o["bn_norm"]["bias"])


def mobilebert_apply(params: Dict, batch: Mapping[str, Array],
                     cfg: MobileBertConfig,
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
                     int8_attention: bool = False,
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
    ctx.int8_attention = int8_attention
    input_ids, token_type_ids, position_ids, mask_bias = B.prepare_inputs(
        batch)
    if compute_dtype is not None and mask_bias is not None:
        mask_bias = mask_bias.astype(compute_dtype)
    if train and dropout_rng is not None:
        rngs = list(jax.random.split(dropout_rng,
                                     1 + cfg.num_hidden_layers + 1))
    else:
        rngs = None

    h = _embeddings(ctx, params, cfg, input_ids, token_type_ids, position_ids,
                    train, rngs[0] if rngs else None)
    h_site = "emb.norm.out"
    if pp_mesh is not None and pp_mesh.shape.get("pp", 1) > 1:
        from transformer_quantization_tpu.parallel.pipeline import (
            can_pipeline,
            pipeline_layer_stack,
        )

        why = can_pipeline(ctx, cfg, pp_mesh.shape["pp"], pp_microbatches,
                           h.shape[0])
        if why:
            raise ValueError(f"cannot pipeline the encoder: {why}")
        h = pipeline_layer_stack(
            pp_mesh, ctx, cfg.num_hidden_layers, params["layers"], h,
            mask_bias,
            [rngs[1 + i] for i in range(cfg.num_hidden_layers)]
            if rngs else None,
            lambda sub, p_i, hc, m, r: _layer(sub, p_i, cfg, hc, m,
                                              "L.", train, r),
            n_micro=pp_microbatches, remat=remat)
        i = cfg.num_hidden_layers - 1
        h_site = (f"L{i}.out.bn.norm.out" if cfg.use_bottleneck
                  else f"L{i}.out.norm.out")
    elif scan_layers and B.can_scan_encoder(ctx, cfg):
        h = B.scan_layer_stack(
            ctx, cfg.num_hidden_layers, params["layers"], h,
            [rngs[1 + i] for i in range(cfg.num_hidden_layers)]
            if rngs else None,
            lambda sub, p_i, hc, r: _layer(sub, p_i, cfg, hc, mask_bias,
                                           "L.", train, r),
            remat=remat)
        i = cfg.num_hidden_layers - 1
        h_site = (f"L{i}.out.bn.norm.out" if cfg.use_bottleneck
                  else f"L{i}.out.norm.out")
    else:
        for i in range(cfg.num_hidden_layers):
            h = B.maybe_remat_layer(
                ctx, remat,
                lambda sub, p_i, h, r, prefix=f"L{i}.", hs=h_site: _layer(
                    sub, p_i, cfg, h, mask_bias, prefix, train, r,
                    h_site=hs),
                params["layers"][i], h, rngs[1 + i] if rngs else None)
            h_site = (f"L{i}.out.bn.norm.out" if cfg.use_bottleneck
                      else f"L{i}.out.norm.out")

    # pooler: first token; pass-through unless classifier_activation
    # (quantized_mobilebert.py:549-569)
    pooled = h[:, 0]
    clf_site = h_site
    if cfg.classifier_activation:
        pooled = quant_linear(ctx, "pooler.dense", pooled,
                              params["pooler"]["kernel"],
                              params["pooler"]["bias"], activation="tanh",
                              input_site=h_site)
        clf_site = "pooler.dense.out"
    pooled_do = dropout(pooled, cfg.hidden_dropout_prob,
                        rngs[-1] if rngs else None, not train)
    logits = quant_linear(ctx, "classifier", pooled_do,
                          params["classifier"]["kernel"],
                          params["classifier"]["bias"],
                          input_site=clf_site)

    outputs = {"logits": logits, "pooled": pooled, "sequence_output": h}
    labels = batch.get("labels")
    if labels is not None:
        outputs["loss"] = B.classification_loss(logits, labels,
                                                cfg.num_labels)
    if capture_sites:
        outputs["captures"] = getattr(ctx, "captures", {})
    return outputs, ctx.export()


# ---------------------------------------------------------------------------
# Full-handoff int8 inference engine (ops/engine.py kernels over the
# inverted-bottleneck topology) — the fast serving path
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MobileBertEngineStatic:
    """Hashable engine shape/flags for the MobileBERT topology."""

    n_layers: int
    n_heads: int
    hidden: int        # true_hidden_size (bottleneck width)
    n_ffn: int         # stacked FFNs before the final inter/out
    attn_case: str     # 'bottleneck' | 'shared_kq' | 'plain'
    hidden_act: str
    # per layer: (res_attn_out, (res_ffn0, ...), res_out, res_out_bn)
    res_quant: Tuple[Tuple, ...]
    # per layer: w4 flag per matmul in plan order
    w4: Tuple[Tuple[bool, ...], ...]
    attn_skip_max: bool = False
    # per layer: (scores_bits, probs_bits, context_bits) — the
    # attn_probs_n_bits_act override (quantized_mobilebert.py:189-190)
    # and the attn_scores/attn_probs/attn_output toggles (bits 0 =
    # disabled; context outside 1..8 = float value edge into attn_out).
    # Empty = all-(8, 8, 8); 2-tuples stay accepted.
    attn_bits: Tuple[Tuple[int, ...], ...] = ()

    def layer_attn_bits(self, i: int) -> Tuple[int, ...]:
        return self.attn_bits[i] if self.attn_bits else (8, 8, 8)


def _nonorm_plan(qcfg, qstate, norm_params: Mapping, wsite: str,
                 res_site: Optional[str], out_site: str,
                 r_site) -> Tuple[Dict, bool]:
    """gamma_q/beta_q (shared concat(w,b) grid, ops/layers.py
    quant_nonorm) + the (1, 8) scalar row for the fused matmul+norm
    kernels. ``r_site``: (s, shift) of the residual payload or None."""
    from transformer_quantization_tpu.ops import engine as ENG
    from transformer_quantization_tpu.quant import quantizers as Q

    gamma = norm_params["weight"].astype(jnp.float32)
    beta = norm_params["bias"].astype(jnp.float32)
    if wsite in qcfg and qcfg[wsite].enabled:
        c = qcfg[wsite]
        ENG._require(wsite in qstate, f"{wsite!r} not calibrated")
        wb = Q.fake_quant(c.spec, qstate[wsite]["qp"],
                          jnp.concatenate([gamma, beta]),
                          axis=0 if c.per_channel else None)
        gamma, beta = jnp.split(wb, 2)
    res_quant = res_site is not None and ENG._act_enabled(qcfg, res_site)
    if res_quant:
        res_s, res_sh = ENG.act_site_scalars(qcfg, qstate, res_site)
    else:
        res_s, res_sh = jnp.ones(()), jnp.zeros(())
    n_s, n_sh = ENG.act_site_scalars(qcfg, qstate, out_site)
    r_s, r_sh = r_site if r_site is not None else (jnp.ones(()),
                                                  jnp.zeros(()))
    return {
        "gb": jnp.stack([gamma, beta]),
        "scal": jnp.stack([jnp.ones(()), jnp.zeros(()), r_s, r_sh,
                           res_s, res_sh, n_s, n_sh]).reshape(1, 8),
    }, res_quant


def build_mobilebert_engine(params: Dict, cfg: MobileBertConfig,
                            qcfg: QuantModelConfig, qstate: Mapping,
                            int_params: Optional[Dict] = None,
                            use_int4: bool = False):
    """Assemble the full-handoff engine plan for a calibrated MobileBERT.

    Every edge of the inverted-bottleneck layer rides int8 payloads:
    bottleneck-in/attention matmuls fuse their NoNorm consumer
    (reduction-free — even cheaper than the BERT add+LN epilogue), q|k
    is one fused matmul over the shared bottleneck, v its own, and every
    residual-feeding matmul (attn_out, stacked-FFN dense, out.dense,
    out.bn.dense) runs add + res-quant + NoNorm + requant in its
    epilogue. Raises EngineIncompatible for configs off this path
    (callers fall back to mobilebert_apply with int_params).
    """
    from transformer_quantization_tpu.ops import engine as ENG

    ENG._require(cfg.use_bottleneck,
                 "mobilebert engine requires use_bottleneck")
    if int_params is None:
        int_params = build_mobilebert_int_params(params, qcfg, qstate,
                                                 use_int4=use_int4)
    if cfg.use_bottleneck_attention:
        attn_case = "bottleneck"
    elif cfg.key_query_shared_bottleneck:
        attn_case = "shared_kq"
    else:
        attn_case = "plain"

    site = lambda name: ENG.act_site_scalars(qcfg, qstate, name)  # noqa
    layers = []
    res_flags = []
    w4_flags = []
    attn_bits_flags = []
    for i, lp in enumerate(params["layers"]):
        p = f"L{i}."
        in_site = "emb.norm.out" if i == 0 else f"L{i - 1}.out.bn.norm.out"
        h_scal = site(in_site)
        w4s = []

        def mm(names, biases, in_scal, outs):
            plan, w4 = ENG._mm_plan(int_params, names, biases, in_scal,
                                    outs)
            w4s.append(w4)
            return plan

        bn = lp["bottleneck"]
        bn_in = mm([p + "bn.in.dense"], [bn["input"]["dense"]["bias"]],
                   h_scal, [site(p + "bn.in.dense.out")])
        bn_in_norm, _ = _nonorm_plan(qcfg, qstate, bn["input"]["norm"],
                                     p + "bn.in.norm.w", None,
                                     p + "bn.in.norm.out", None)
        li_scal = site(p + "bn.in.norm.out")

        bn_attn = bn_attn_norm = None
        if attn_case == "bottleneck":
            qk_scal, v_scal = li_scal, li_scal
        elif attn_case == "shared_kq":
            ba = bn["attention"]
            bn_attn = mm([p + "bn.attn.dense"], [ba["dense"]["bias"]],
                         h_scal, [site(p + "bn.attn.dense.out")])
            bn_attn_norm, _ = _nonorm_plan(qcfg, qstate, ba["norm"],
                                           p + "bn.attn.norm.w", None,
                                           p + "bn.attn.norm.out", None)
            qk_scal, v_scal = site(p + "bn.attn.norm.out"), h_scal
        else:
            qk_scal, v_scal = h_scal, h_scal

        a = lp["attn"]
        qk = mm([p + "attn.q", p + "attn.k"],
                [a["q"]["bias"], a["k"]["bias"]], qk_scal,
                [site(p + "attn.q.out"), site(p + "attn.k.out")])
        v = mm([p + "attn.v"], [a["v"]["bias"]], v_scal,
               [site(p + "attn.v.out")])
        sc_s, sc_sh, sc_bits = ENG.attn_edge_scalars(qcfg, qstate,
                                                     p + "attn.scores")
        p_s, p_sh, p_bits = ENG.attn_edge_scalars(qcfg, qstate,
                                                  p + "attn.probs")
        c_s, c_sh, c_bits = ENG.attn_edge_scalars(qcfg, qstate,
                                                  p + "attn.context")
        attn_scal = jnp.concatenate(
            [jnp.stack(site(p + s)) for s in
             ("attn.q.out", "attn.k.out", "attn.v.out")]
            + [jnp.stack((sc_s, sc_sh)), jnp.stack((p_s, p_sh)),
               jnp.stack((c_s, c_sh))]).reshape(1, 12)
        attn_bits_flags.append((sc_bits, p_bits, c_bits))

        # flex context (attn_output: False / 'c': 16): float value edge
        # into attn_out — no input-site folding (in_mode='f')
        ctx_in = ((c_s, c_sh) if 1 <= c_bits <= 8
                  else (jnp.ones(()), jnp.zeros(())))
        so = lp["attn_out"]
        attn_out = mm([p + "attn_out.dense"], [so["dense"]["bias"]],
                      ctx_in,
                      [site(p + "attn_out.dense.out")])
        attn_out_norm, res_ao = _nonorm_plan(
            qcfg, qstate, so["norm"], p + "attn_out.norm.w",
            p + "attn_out.res", p + "attn_out.norm.out", li_scal)

        x_site = p + "attn_out.norm.out"
        ffns = []
        res_ffn = []
        for j, f in enumerate(lp["ffn"]):
            inter = mm([p + f"ffn{j}.inter"], [f["inter"]["bias"]],
                       site(x_site), [site(p + f"ffn{j}.inter.out")])
            dense = mm([p + f"ffn{j}.dense"], [f["dense"]["bias"]],
                       site(p + f"ffn{j}.inter.out"),
                       [site(p + f"ffn{j}.dense.out")])
            norm, rq = _nonorm_plan(qcfg, qstate, f["norm"],
                                    p + f"ffn{j}.norm.w", p + f"ffn{j}.res",
                                    p + f"ffn{j}.norm.out", site(x_site))
            ffns.append({"inter": inter, "dense": dense, "norm": norm})
            res_ffn.append(rq)
            x_site = p + f"ffn{j}.norm.out"

        o = lp["out"]
        inter = mm([p + "ffn.inter"], [lp["inter"]["bias"]], site(x_site),
                   [site(p + "ffn.inter.out")])
        out_d = mm([p + "out.dense"], [o["dense"]["bias"]],
                   site(p + "ffn.inter.out"), [site(p + "out.dense.out")])
        out_norm, res_out = _nonorm_plan(
            qcfg, qstate, o["norm"], p + "out.norm.w", p + "out.res",
            p + "out.norm.out", site(x_site))
        out_bn = mm([p + "out.bn.dense"], [o["bn_dense"]["bias"]],
                    site(p + "out.norm.out"),
                    [site(p + "out.bn.dense.out")])
        out_bn_norm, res_obn = _nonorm_plan(
            qcfg, qstate, o["bn_norm"], p + "out.bn.norm.w",
            p + "out.bn.res", p + "out.bn.norm.out", h_scal)

        layers.append({
            "bn_in": bn_in, "bn_in_norm": bn_in_norm,
            "bn_attn": bn_attn, "bn_attn_norm": bn_attn_norm,
            "qk": qk, "v": v, "attn_scal": attn_scal,
            "attn_out": attn_out, "attn_out_norm": attn_out_norm,
            "ffns": ffns, "inter": inter,
            "out": out_d, "out_norm": out_norm,
            "out_bn": out_bn, "out_bn_norm": out_bn_norm,
        })
        res_flags.append((res_ao, tuple(res_ffn), res_out, res_obn))
        w4_flags.append(tuple(w4s))

    entry_scal = jnp.stack(site("emb.norm.out")).reshape(1, 2)
    skip_max = False
    try:
        # an unquantized scores site (bits 0) has no grid bound -> the
        # max-subtraction cannot be proven dead
        if any(b[0] == 0 for b in attn_bits_flags):
            raise ValueError("unbounded scores")
        worst = max(
            (2.0 ** attn_bits_flags[li][0]) * float(lp_["attn_scal"][0, 6])
            for li, lp_ in enumerate(layers))
        bound = (worst / float(np.sqrt(cfg.head_dim))
                 * float(np.log2(np.e)))
        skip_max = bound < 100.0
    except Exception:
        skip_max = False
    static = MobileBertEngineStatic(
        n_layers=cfg.num_hidden_layers, n_heads=cfg.num_attention_heads,
        hidden=cfg.true_hidden_size, n_ffn=cfg.num_stacked_ffn,
        attn_case=attn_case, hidden_act=cfg.hidden_act,
        res_quant=tuple(res_flags), w4=tuple(w4_flags),
        attn_skip_max=skip_max, attn_bits=tuple(attn_bits_flags))
    return static, {"layers": layers, "entry_scal": entry_scal}, int_params


def mobilebert_encoder_engine(h: Array, mask_bias: Array,
                              static: MobileBertEngineStatic, plan: Dict, *,
                              backend: str = "pallas",
                              out_dtype=jnp.float32,
                              interpret: bool = False,
                              fuse_layer: Optional[bool] = None) -> Array:
    """Run the MobileBERT encoder stack on int8 payloads.

    ``fuse_layer``: run each layer as ONE kernel (int8_mb_layer_ln;
    default on the all-pallas backend, bit-identical to the per-op
    chain); ``False`` forces the chain (used by the equivalence test).
    """
    from transformer_quantization_tpu.ops import engine as ENG
    from transformer_quantization_tpu.ops.pallas import engine_kernels as EK

    b, t, hdim = h.shape
    mm_be, attn_be, ln_be = ENG.parse_backend(backend)
    act = static.hidden_act
    es = plan["entry_scal"]
    h8 = EK.quantize_payload(h.reshape(b * t, hdim).astype(jnp.float32),
                             es[0, 0], es[0, 1])

    def mm(x8, mp, w4, activation=None):
        if mm_be == "pallas":
            return EK.int8_matmul(x8, mp["w"], mp["vecs"], mp["scal"],
                                  activation=activation, out_mode="emit",
                                  interpret=interpret, w4=w4)
        return EK.int8_matmul_ref(x8, mp["w"], mp["vecs"], mp["scal"],
                                  activation=activation, out_mode="emit",
                                  w4=w4)

    def mm_norm(x8, mp, np_, w4):
        if mm_be == "pallas":
            return EK.int8_matmul_norm(x8, mp["w"], mp["vecs"], mp["scal"],
                                       np_["gb"], np_["scal"], eps=0.0,
                                       res_quant=False, norm="nonorm",
                                       interpret=interpret, w4=w4)
        return EK.int8_matmul_norm_ref(x8, mp["w"], mp["vecs"], mp["scal"],
                                       np_["gb"], np_["scal"], eps=0.0,
                                       res_quant=False, norm="nonorm",
                                       w4=w4)

    def mm_add_norm(x8, mp, r8, np_, res_quant, w4, in_mode="i8"):
        if mm_be == "pallas":
            return EK.int8_matmul_add_ln(
                x8, mp["w"], mp["vecs"], mp["scal"], r8, np_["gb"],
                np_["scal"], eps=0.0, res_quant=res_quant, norm="nonorm",
                interpret=interpret, w4=w4, in_mode=in_mode)
        return EK.int8_matmul_add_ln_ref(
            x8, mp["w"], mp["vecs"], mp["scal"], r8, np_["gb"],
            np_["scal"], eps=0.0, res_quant=res_quant, norm="nonorm",
            w4=w4, in_mode=in_mode)

    def ffn(x8, ip, dp, r8, np_, res_quant, w4i, w4d):
        # whole (inter -> act -> dense -> +residual -> NoNorm) block in
        # one kernel (int8_ffn_ln) — MobileBERT's small FFN shapes are
        # launch-overhead-bound, so halving the launches matters as much
        # as keeping the inter payload in VMEM
        if mm_be == "pallas":
            return EK.int8_ffn_ln(
                x8, ip["w"], ip["vecs"], ip["scal"], dp["w"], dp["vecs"],
                dp["scal"], r8, np_["gb"], np_["scal"], activation=act,
                eps=0.0, res_quant=res_quant, norm="nonorm",
                interpret=interpret, w4i=w4i, w4d=w4d)
        return EK.int8_ffn_ln_ref(
            x8, ip["w"], ip["vecs"], ip["scal"], dp["w"], dp["vecs"],
            dp["scal"], r8, np_["gb"], np_["scal"], activation=act,
            eps=0.0, res_quant=res_quant, norm="nonorm", w4i=w4i, w4d=w4d)

    if fuse_layer is None:
        fuse_layer = mm_be == attn_be == ln_be == "pallas"
    for i, lp in enumerate(plan["layers"]):
        res_ao, res_ffn, res_out, res_obn = static.res_quant[i]
        if fuse_layer:
            # the WHOLE inverted-bottleneck layer in one kernel launch:
            # MobileBERT's ~10 small per-layer kernels each round-trip an
            # (M, 128/512) payload through HBM; the fusion keeps every
            # intermediate in VMEM (bit-identical to the chain below)
            h8 = EK.int8_mb_layer_ln(
                h8, mask_bias, lp["attn_scal"],
                EK.mb_layer_flat(lp, static.attn_case),
                n_heads=static.n_heads, seq=t, hidden=static.hidden,
                attn_case=static.attn_case, activation=act,
                res=static.res_quant[i], w4=static.w4[i],
                n_ffn=static.n_ffn, skip_max=static.attn_skip_max,
                interpret=interpret,
                attn_bits=static.layer_attn_bits(i))
            continue
        w4s = list(static.w4[i])
        w4 = lambda: w4s.pop(0)  # noqa: E731 — plan order

        li8 = mm_norm(h8, lp["bn_in"], lp["bn_in_norm"], w4())
        if static.attn_case == "bottleneck":
            qk_in, v_in = li8, li8
        elif static.attn_case == "shared_kq":
            sh8 = mm_norm(h8, lp["bn_attn"], lp["bn_attn_norm"], w4())
            qk_in, v_in = sh8, h8
        else:
            qk_in, v_in = h8, h8

        qk8 = mm(qk_in, lp["qk"], w4())       # (M, 2*hidden): [q | k]
        v8 = mm(v_in, lp["v"], w4())          # (M, hidden)
        if attn_be == "pallas":
            c8 = EK.int8_attention_qkv(
                qk8, qk8, v8, mask_bias, lp["attn_scal"],
                n_heads=static.n_heads, seq=t, hidden=static.hidden,
                cols=(0, 1, 0), skip_max=static.attn_skip_max,
                interpret=interpret,
                attn_bits=static.layer_attn_bits(i))
        else:
            c8 = EK.int8_attention_qkv_ref(
                qk8, qk8, v8, mask_bias, lp["attn_scal"],
                n_heads=static.n_heads, seq=t, hidden=static.hidden,
                cols=(0, 1, 0), skip_max=static.attn_skip_max,
                attn_bits=static.layer_attn_bits(i))

        c_bits = EK._attn3(static.layer_attn_bits(i))[2]
        x8 = mm_add_norm(c8, lp["attn_out"], li8, lp["attn_out_norm"],
                         res_ao, w4(),
                         in_mode="i8" if 1 <= c_bits <= 8 else "f")
        for j, f in enumerate(lp["ffns"]):
            x8 = ffn(x8, f["inter"], f["dense"], x8, f["norm"],
                     res_ffn[j], w4(), w4())
        y8 = ffn(x8, lp["inter"], lp["out"], x8, lp["out_norm"], res_out,
                 w4(), w4())
        h8 = mm_add_norm(y8, lp["out_bn"], h8, lp["out_bn_norm"], res_obn,
                         w4())

    ls = plan["layers"][-1]["out_bn_norm"]["scal"]
    hf = EK.dequantize_payload(h8, ls[0, 6], ls[0, 7]).astype(out_dtype)
    return hf.reshape(b, t, hdim)


def mobilebert_engine_apply(params: Dict, batch: Mapping[str, Array],
                            cfg: MobileBertConfig, qcfg: QuantModelConfig,
                            qstate: Mapping, static, plan,
                            int_params: Dict, *,
                            backend: str = "pallas",
                            engine_dtype=jnp.float32,
                            interpret: bool = False,
                            gelu_impl: str = "tanh") -> Dict:
    """Inference forward through the full-handoff int8 engine
    (models/bert.py:bert_engine_apply for the shape of this)."""
    ctx = B.make_ctx(qcfg, qstate, QuantMode(), int_params=int_params)
    input_ids, token_type_ids, position_ids, _ = B.prepare_inputs(batch)
    h = _embeddings(ctx, params, cfg, input_ids, token_type_ids,
                    position_ids, False, None)
    attention_mask = batch.get("attention_mask")
    if attention_mask is None:
        bias_vec = jnp.zeros(input_ids.shape, jnp.float32)
    else:
        bias_vec = (1.0 - attention_mask.astype(jnp.float32)) * -10000.0
    h = mobilebert_encoder_engine(h, bias_vec, static, plan,
                                  backend=backend, out_dtype=engine_dtype,
                                  interpret=interpret)
    h = h.astype(jnp.float32)
    h_site = f"L{cfg.num_hidden_layers - 1}.out.bn.norm.out"
    pooled = h[:, 0]
    clf_site = h_site
    if cfg.classifier_activation:
        pooled = quant_linear(ctx, "pooler.dense", pooled,
                              params["pooler"]["kernel"],
                              params["pooler"]["bias"], activation="tanh",
                              input_site=h_site)
        clf_site = "pooler.dense.out"
    logits = quant_linear(ctx, "classifier", pooled,
                          params["classifier"]["kernel"],
                          params["classifier"]["bias"],
                          input_site=clf_site)
    outputs = {"logits": logits, "pooled": pooled, "sequence_output": h}
    labels = batch.get("labels")
    if labels is not None:
        outputs["loss"] = B.classification_loss(logits, labels,
                                                cfg.num_labels)
    return outputs


# ---------------------------------------------------------------------------
# Registry entry
# ---------------------------------------------------------------------------


def family():
    from transformer_quantization_tpu.models.registry import ModelFamily

    def init_head(rng, cfg):
        return B._linear_init(rng, cfg.num_labels, cfg.hidden_size,
                              cfg.initializer_range)

    def load_checkpoint(model_dir, num_labels=None):
        from transformer_quantization_tpu.models import hf_loader as L

        return L.load_mobilebert(model_dir, num_labels)

    return ModelFamily(
        name="mobilebert",
        config_cls=MobileBertConfig,
        init_params=init_mobilebert_params,
        init_head=init_head,
        head_key="classifier",
        apply=mobilebert_apply,
        declare_sites=declare_mobilebert_sites,
        apply_quant_dict=apply_mobilebert_quant_dict,
        apply_peg=apply_peg_wiring,
        weight_site_tensors=mobilebert_weight_site_tensors,
        adaround_specs=mobilebert_adaround_specs,
        build_int_params=build_mobilebert_int_params,
        build_engine=build_mobilebert_engine,
        engine_apply=mobilebert_engine_apply,
        shared_perm_groups=None,
        load_checkpoint=load_checkpoint,
        config_presets={"mobilebert_uncased": {}},
        tiny_preset=dict(vocab_size=2048, hidden_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         intermediate_size=64, embedding_size=16,
                         intra_bottleneck_size=32,
                         max_position_embeddings=128),
    )
