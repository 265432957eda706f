"""Quantized ALBERT for sequence classification, TPU-native.

The reference lists ``albert_base_v2``/``albert_large_v2`` in its model
zoo but supports them only as FP32 baselines (reference:
utils/hf_models.py:33-35, main.py:216-240). Here ALBERT is a full family:
baseline AND quantizable.

Architecture (HF ``AlbertForSequenceClassification``, 1 hidden group /
1 inner layer — the released configs):
- factorized embeddings: 128-d tables + ``embedding_hidden_mapping_in``
  projection to the hidden size
- ONE shared transformer layer applied ``num_hidden_layers`` times
  (cross-layer parameter sharing). Quant sites carry the shared prefix
  ``shared.``: weight quantizers are genuinely shared, and activation
  quantizers aggregate statistics across all layer applications — the
  natural functional reading of sharing (the reference never quantizes
  ALBERT, so this is new surface, not a parity constraint)
- ``gelu_new`` activations; pooler dense+Tanh; BERT-style classifier
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
class AlbertConfig(B.BertConfig):
    vocab_size: int = 30000
    embedding_size: int = 128
    hidden_size: int = 768
    num_hidden_layers: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu_new"
    hidden_dropout_prob: float = 0.0
    attention_probs_dropout_prob: float = 0.0


def init_albert_params(rng: jax.Array, cfg: AlbertConfig) -> Dict:
    std = cfg.initializer_range
    ks = jax.random.split(rng, 4)
    base = B.init_bert_params(
        ks[0], dataclasses.replace(cfg, num_hidden_layers=1))
    E = cfg.embedding_size

    def emb(k, n):
        return (std * jax.random.normal(k, (n, E))).astype(jnp.float32)

    ke = jax.random.split(ks[1], 3)
    params = {
        "embeddings": {
            "word": emb(ke[0], cfg.vocab_size),
            "position": emb(ke[1], cfg.max_position_embeddings),
            "token_type": emb(ke[2], cfg.type_vocab_size),
            "ln": B._ln_init(E),
        },
        "emb_proj": B._linear_init(ks[2], cfg.hidden_size, E, std),
        "shared": base["layers"][0],
        "pooler": base["pooler"],
        "classifier": base["classifier"],
    }
    return params


def declare_albert_sites(defaults: QuantDefaults, cfg: AlbertConfig,
                         quant_setup: str = "all",
                         quant_dict: Optional[Mapping] = None
                         ) -> QuantModelConfig:
    quant_dict = quant_dict or {}
    b = QuantConfigBuilder(defaults)
    B.declare_embedding_sites(b, quant_dict)
    b.weight("emb_proj.w")
    b.act("emb_proj.out")
    # ONE shared layer's sites, hit num_hidden_layers times per forward
    b_tmp = QuantConfigBuilder(defaults)
    B.declare_encoder_sites(b_tmp, 1)
    for name, site in b_tmp.build().items():
        b._sites.append((name.replace("L0.", "shared."), site))
    b.weight("pooler.dense.w")
    b.act("pooler.dense.out")
    B.declare_classifier_site(b, "classifier", quant_setup)
    return b.build()


def apply_albert_quant_dict(qcfg: QuantModelConfig, quant_dict: Mapping,
                            n_layers: int) -> QuantModelConfig:
    """Letter language over the shared layer: per-layer indices collapse
    onto the one shared site set."""
    letter_site = {k: f"shared.{v}" for k, v in B.LETTER_SITE.items()}
    shared_acts = tuple(f"shared.{s[3:]}" for s in B._layer_act_sites(0))
    ordered: List[Tuple[str, Tuple[str, ...]]] = [
        ("e", ("emb.sum_tt", "emb.sum_pos")),
        ("Et", ("emb.word.w",)),
    ]
    for letter, site in letter_site.items():
        for i in range(n_layers):
            ordered.append((f"{letter}{i}", (site,)))
        ordered.append((letter, (site,)))
    for i in range(n_layers):
        ordered.append((f"L{i}", shared_acts))
    ordered.append(("L", shared_acts))
    ordered += [
        ("P", ("pooler.dense.out",)),
        ("C", ("classifier.out",)),
        ("wP", ("pooler.dense.w",)),
        ("wC", ("classifier.w",)),
    ]
    return B._apply_ordered_quant_dict(qcfg, quant_dict, ordered)


def apply_peg_wiring(qcfg: QuantModelConfig, n_layers: int,
                     per_token: bool = False, per_embd: bool = False,
                     per_groups: Optional[int] = None,
                     permute: bool = False) -> QuantModelConfig:
    if not (per_token or per_embd or per_groups):
        return qcfg
    base_axis = 2 if (per_embd or per_groups) else 1
    changes = {"axis": base_axis, "n_groups": per_groups, "permute": permute}
    sites = ["emb.sum_tt", "emb.sum_pos", "emb.ln.out", "emb_proj.out"]
    sites += [f"shared.{s}" for s in (
        "attn.q.out", "attn.k.out", "attn.v.out", "attn.context",
        "attn_out.dense.out", "attn_out.res", "attn_out.ln.out",
        "ffn.dense.out", "ffn.res", "ffn.ln.out")]
    qcfg = qcfg.replace_sites({s: dict(changes) for s in sites})
    if per_embd:
        qcfg = qcfg.replace_site("pooler.dense.out", axis=1,
                                 n_groups=per_groups, permute=permute)
    return qcfg


def albert_weight_site_tensors(params: Dict) -> Dict[str, Array]:
    e = params["embeddings"]
    out = {
        "emb.word.w": e["word"],
        "emb.position.w": e["position"],
        "emb.token_type.w": e["token_type"],
        "emb.ln.w": e["ln"]["scale"],
        "emb_proj.w": params["emb_proj"]["kernel"],
        "pooler.dense.w": params["pooler"]["kernel"],
        "classifier.w": params["classifier"]["kernel"],
    }
    s = params["shared"]
    out["shared.attn.q.w"] = s["attn"]["q"]["kernel"]
    out["shared.attn.k.w"] = s["attn"]["k"]["kernel"]
    out["shared.attn.v.w"] = s["attn"]["v"]["kernel"]
    out["shared.attn_out.dense.w"] = s["attn_out"]["dense"]["kernel"]
    out["shared.attn_out.ln.w"] = s["attn_out"]["ln"]["scale"]
    out["shared.ffn.inter.w"] = s["ffn"]["inter"]["kernel"]
    out["shared.ffn.dense.w"] = s["ffn"]["dense"]["kernel"]
    out["shared.ffn.ln.w"] = s["ffn"]["ln"]["scale"]
    return out


def albert_adaround_specs(params: Dict, cfg: AlbertConfig
                          ) -> List[Tuple[str, Dict]]:
    e = params["embeddings"]
    s = params["shared"]
    a, so, f = s["attn"], s["attn_out"], s["ffn"]
    return [
        ("emb.word", {"kind": "embedding", "w": e["word"]}),
        ("emb.position", {"kind": "embedding", "w": e["position"]}),
        ("emb.token_type", {"kind": "embedding", "w": e["token_type"]}),
        ("emb.ln", {"kind": "layernorm", "w": e["ln"]["scale"],
                    "b": e["ln"]["bias"], "eps": cfg.layer_norm_eps}),
        ("emb_proj", {"kind": "linear", "w": params["emb_proj"]["kernel"],
                      "b": params["emb_proj"]["bias"], "act": None}),
        ("shared.attn.q", {"kind": "linear", "w": a["q"]["kernel"],
                           "b": a["q"]["bias"], "act": None}),
        ("shared.attn.k", {"kind": "linear", "w": a["k"]["kernel"],
                           "b": a["k"]["bias"], "act": None}),
        ("shared.attn.v", {"kind": "linear", "w": a["v"]["kernel"],
                           "b": a["v"]["bias"], "act": None}),
        ("shared.attn_out.dense", {"kind": "linear",
                                   "w": so["dense"]["kernel"],
                                   "b": so["dense"]["bias"], "act": None}),
        ("shared.attn_out.ln", {"kind": "layernorm", "w": so["ln"]["scale"],
                                "b": so["ln"]["bias"],
                                "eps": cfg.layer_norm_eps}),
        ("shared.ffn.inter", {"kind": "linear", "w": f["inter"]["kernel"],
                              "b": f["inter"]["bias"],
                              "act": cfg.hidden_act}),
        ("shared.ffn.dense", {"kind": "linear", "w": f["dense"]["kernel"],
                              "b": f["dense"]["bias"], "act": None}),
        ("shared.ffn.ln", {"kind": "layernorm", "w": f["ln"]["scale"],
                           "b": f["ln"]["bias"], "eps": cfg.layer_norm_eps}),
        ("pooler.dense", {"kind": "linear", "w": params["pooler"]["kernel"],
                          "b": params["pooler"]["bias"], "act": "tanh"}),
        ("classifier", {"kind": "linear", "w": params["classifier"]["kernel"],
                        "b": params["classifier"]["bias"], "act": None}),
    ]


def build_albert_int_params(params: Dict, qcfg: QuantModelConfig,
                            qstate: Mapping, use_int4: bool = False) -> Dict:
    return B.pack_int_params(albert_weight_site_tensors(params), qcfg,
                             qstate, use_int4=use_int4)


def _can_scan_shared(ctx, cfg) -> bool:
    """ALBERT scan gate: shared-site states live in the scan CARRY (every
    iteration updates the same sites sequentially), so they must all be
    initialized up front — plus the generic no-per-layer-identity gates
    (shared with every other family via :func:`bert.generic_scan_gates`)."""
    if not B.generic_scan_gates(ctx, cfg):
        return False
    for name, c in ctx.cfg.items():
        if name.startswith("shared.") and c.enabled and name not in ctx.qstate:
            return False  # lazy init inside scan would change the carry
    return True


def _scan_shared_encoder(ctx, params, cfg, h, mask_bias, train, rngs, *,
                         remat: bool = False):
    """The shared ALBERT layer as one lax.scan: params are loop-invariant
    (closure), the hidden state AND the shared quant-site states ride the
    carry — each iteration sees the previous iteration's range updates,
    exactly like the python loop."""
    import copy

    L = cfg.num_hidden_layers
    carry_qs = {n: st for n, st in ctx.qstate.items()
                if n.startswith("shared.")}
    if rngs:
        layer_rngs = jnp.stack(
            [jnp.stack(rngs[1 + 3 * i:4 + 3 * i]) for i in range(L)])
    else:
        layer_rngs = jnp.zeros((L, 1), jnp.int32)  # unused placeholder

    def body(carry, rng_i):
        hc, qs = carry
        sub = copy.copy(ctx)
        sub.qstate = dict(qs)
        r = [rng_i[j] for j in range(3)] if rngs else None
        y = B._layer(sub, params["shared"], cfg, hc, mask_bias, "shared.",
                     train, r)
        new_qs = {n: st for n, st in sub.export().items()
                  if n.startswith("shared.")}
        return (y, new_qs), None

    body_fn = jax.checkpoint(body) if remat else body
    (h, final_qs), _ = jax.lax.scan(body_fn, (h, carry_qs), layer_rngs)
    ctx.qstate.update(final_qs)
    return h


def albert_apply(params: Dict, batch: Mapping[str, Array], cfg: AlbertConfig,
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
    input_ids, token_type_ids, position_ids, mask_bias = B.prepare_inputs(
        batch)
    if compute_dtype is not None and mask_bias is not None:
        mask_bias = mask_bias.astype(compute_dtype)
    rngs = B.make_dropout_rngs(cfg, train, dropout_rng)

    h = B._embeddings(ctx, params, cfg, input_ids, token_type_ids,
                      position_ids, train, rngs[0] if rngs else None)
    h = quant_linear(ctx, "emb_proj", h, params["emb_proj"]["kernel"],
                     params["emb_proj"]["bias"], input_site="emb.ln.out")

    h_site = "emb_proj.out"
    if pp_mesh is not None and pp_mesh.shape.get("pp", 1) > 1:
        from transformer_quantization_tpu.parallel.pipeline import (
            can_pipeline,
            pipeline_shared_stack,
        )

        why = can_pipeline(ctx, cfg, pp_mesh.shape["pp"], pp_microbatches,
                           h.shape[0])
        if why:
            raise ValueError(f"cannot pipeline the encoder: {why}")
        L = cfg.num_hidden_layers
        h = pipeline_shared_stack(
            pp_mesh, ctx, L, params["shared"], h, mask_bias,
            [list(rngs[1 + 3 * i:4 + 3 * i]) for i in range(L)]
            if rngs else None,
            lambda sub, p_sh, hc, m, r: B._layer(sub, p_sh, cfg, hc, m,
                                                 "shared.", train, r),
            n_micro=pp_microbatches, remat=remat)
        h_site = "shared.ffn.ln.out"
    elif scan_layers and _can_scan_shared(ctx, cfg):
        h = _scan_shared_encoder(ctx, params, cfg, h, mask_bias, train,
                                 rngs, remat=remat)
        h_site = "shared.ffn.ln.out"
    else:
        for i in range(cfg.num_hidden_layers):
            layer_rngs = rngs[1 + 3 * i:4 + 3 * i] if rngs else None
            h = B.maybe_remat_layer(
                ctx, remat,
                lambda sub, p_i, h, r, hs=h_site: B._layer(
                    sub, p_i, cfg, h, mask_bias, "shared.", train, r,
                    h_site=hs),
                params["shared"], h, layer_rngs)
            h_site = "shared.ffn.ln.out"

    pooled = quant_linear(ctx, "pooler.dense", h[:, 0],
                          params["pooler"]["kernel"],
                          params["pooler"]["bias"], activation="tanh",
                          input_site=h_site)
    pooled = dropout(pooled, cfg.hidden_dropout_prob,
                     rngs[-1] if rngs else None, not train)
    logits = quant_linear(ctx, "classifier", pooled,
                          params["classifier"]["kernel"],
                          params["classifier"]["bias"],
                          input_site="pooler.dense.out")

    outputs = {"logits": logits, "pooled": pooled, "sequence_output": h}
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


def build_albert_engine(params: Dict, cfg: AlbertConfig,
                        qcfg: QuantModelConfig, qstate: Mapping,
                        int_params: Optional[Dict] = None,
                        use_int4: bool = False):
    """Engine plan for a calibrated ALBERT: the shared layer's sites and
    weights ride the generic encoder plan with ``prefixes=["shared."]*n``
    (models/bert.py:build_bert_engine for the shape of this). The plan
    repeats references to the one shared weight set — no duplication on
    device."""
    from transformer_quantization_tpu.ops import engine as ENG

    if int_params is None:
        int_params = build_albert_int_params(params, qcfg, qstate,
                                             use_int4=use_int4)
    n = cfg.num_hidden_layers
    static, plan = ENG.build_encoder_plan(
        qcfg, qstate, int_params, [params["shared"]] * n,
        n_heads=cfg.num_attention_heads, ln_eps=cfg.layer_norm_eps,
        hidden_act=cfg.hidden_act, entry_site="emb_proj.out",
        prefixes=["shared."] * n)
    return static, plan, int_params


def albert_engine_apply(params: Dict, batch: Mapping[str, Array],
                        cfg: AlbertConfig, qcfg: QuantModelConfig,
                        qstate: Mapping, static, plan, int_params: Dict, *,
                        backend: str = "pallas", engine_dtype=jnp.float32,
                        interpret: bool = False,
                        gelu_impl: str = "tanh") -> Dict:
    """Inference forward through the full-handoff int8 engine
    (models/bert.py:bert_engine_apply for the shape of this)."""
    from transformer_quantization_tpu.ops import engine as ENG

    ctx = B.make_ctx(qcfg, qstate, QuantMode(), int_params=int_params)
    input_ids, token_type_ids, position_ids, _ = B.prepare_inputs(batch)
    h = B._embeddings(ctx, params, cfg, input_ids, token_type_ids,
                      position_ids, False, None)
    h = quant_linear(ctx, "emb_proj", h, params["emb_proj"]["kernel"],
                     params["emb_proj"]["bias"], input_site="emb.ln.out")
    attention_mask = batch.get("attention_mask")
    if attention_mask is None:
        bias_vec = jnp.zeros(input_ids.shape, jnp.float32)
    else:
        bias_vec = (1.0 - attention_mask.astype(jnp.float32)) * -10000.0
    h = ENG.encoder_engine(h, bias_vec, static, plan, backend=backend,
                           out_dtype=engine_dtype, interpret=interpret,
                           gelu_impl=gelu_impl)
    h = h.astype(jnp.float32)
    h_site = "shared.ffn.ln.out"
    pooled = quant_linear(ctx, "pooler.dense", h[:, 0],
                          params["pooler"]["kernel"],
                          params["pooler"]["bias"], activation="tanh",
                          input_site=h_site)
    logits = quant_linear(ctx, "classifier", pooled,
                          params["classifier"]["kernel"],
                          params["classifier"]["bias"],
                          input_site="pooler.dense.out")
    outputs = {"logits": logits, "pooled": pooled, "sequence_output": h}
    labels = batch.get("labels")
    if labels is not None:
        outputs["loss"] = B.classification_loss(logits, labels,
                                                cfg.num_labels)
    return outputs


def family():
    from transformer_quantization_tpu.models.registry import ModelFamily

    def init_head(rng, cfg):
        return B._linear_init(rng, cfg.num_labels, cfg.hidden_size,
                              cfg.initializer_range)

    def load_checkpoint(model_dir, num_labels=None):
        from transformer_quantization_tpu.models import hf_loader as L

        return L.load_albert(model_dir, num_labels)

    return ModelFamily(
        name="albert",
        config_cls=AlbertConfig,
        init_params=init_albert_params,
        init_head=init_head,
        head_key="classifier",
        apply=albert_apply,
        declare_sites=declare_albert_sites,
        apply_quant_dict=apply_albert_quant_dict,
        apply_peg=apply_peg_wiring,
        weight_site_tensors=albert_weight_site_tensors,
        adaround_specs=albert_adaround_specs,
        build_int_params=build_albert_int_params,
        build_engine=build_albert_engine,
        engine_apply=albert_engine_apply,
        shared_perm_groups=None,
        load_checkpoint=load_checkpoint,
        config_presets={
            "albert_base_v2": {},
            "albert_large_v2": dict(hidden_size=1024, num_hidden_layers=24,
                                    num_attention_heads=16,
                                    intermediate_size=4096),
        },
        tiny_preset=dict(vocab_size=2048, hidden_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         intermediate_size=128, embedding_size=16,
                         max_position_embeddings=128),
    )
