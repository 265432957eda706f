"""Quantized SqueezeBERT for sequence classification, TPU-native.

The reference lists ``squeezebert_uncased`` in its model zoo but supports
it only as an FP32 baseline (reference: utils/hf_models.py:31,
main.py:216-240). Here it is a full, quantizable family.

Architecture (HF ``SqueezeBertForSequenceClassification``): BERT-shaped
embeddings + encoder whose denses are kernel-size-1 *grouped* Conv1ds —
block-diagonal linears. The HF implementation runs layers in (B, C, T)
conv layout; kernel-size-1 convs are layout-independent, so this
implementation stays in (B, T, C) with a grouped-linear primitive
(ops/layers.py: quant_grouped_linear) — identical math, and XLA keeps the
activations in one layout instead of transposing around every layer.
Group counts follow the HF config: q/k/v and FFN convs grouped (default
4), post-attention conv grouped, and the pooler/classifier are plain
denses.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp

from transformer_quantization_tpu.models import bert as B
from transformer_quantization_tpu.ops import layers as L
from transformer_quantization_tpu.ops.layers import (
    dropout,
    quant_grouped_linear,
    quant_layernorm,
    quant_linear,
)
from transformer_quantization_tpu.quant.qconfig import (
    QuantConfigBuilder,
    QuantDefaults,
    QuantModelConfig,
    QuantMode,
)

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class SqueezeBertConfig(B.BertConfig):
    q_groups: int = 4
    k_groups: int = 4
    v_groups: int = 4
    post_attention_groups: int = 1
    intermediate_groups: int = 4
    output_groups: int = 4


def _grouped_init(rng, n_out, n_in, groups, std):
    k, _ = jax.random.split(rng)
    return {"kernel": (std * jax.random.normal(
                k, (n_out, n_in // groups))).astype(jnp.float32),
            "bias": jnp.zeros((n_out,), jnp.float32)}


def init_squeezebert_params(rng: jax.Array, cfg: SqueezeBertConfig) -> Dict:
    std = cfg.initializer_range
    base = B.init_bert_params(
        rng, dataclasses.replace(cfg, num_hidden_layers=0))
    params = {
        "embeddings": base["embeddings"],
        "layers": [],
        "pooler": base["pooler"],
        "classifier": base["classifier"],
    }
    h, m = cfg.hidden_size, cfg.intermediate_size
    keys = jax.random.split(jax.random.fold_in(rng, 7),
                            cfg.num_hidden_layers)
    for i in range(cfg.num_hidden_layers):
        ks = jax.random.split(keys[i], 6)
        params["layers"].append({
            "attn": {
                "q": _grouped_init(ks[0], h, h, cfg.q_groups, std),
                "k": _grouped_init(ks[1], h, h, cfg.k_groups, std),
                "v": _grouped_init(ks[2], h, h, cfg.v_groups, std),
            },
            "attn_out": {
                "dense": _grouped_init(ks[3], h, h,
                                       cfg.post_attention_groups, std),
                "ln": B._ln_init(h),
            },
            "ffn": {
                "inter": _grouped_init(ks[4], m, h,
                                       cfg.intermediate_groups, std),
                "dense": _grouped_init(ks[5], h, m, cfg.output_groups, std),
                "ln": B._ln_init(h),
            },
        })
    return params


def declare_squeezebert_sites(defaults: QuantDefaults,
                              cfg: SqueezeBertConfig,
                              quant_setup: str = "all",
                              quant_dict: Optional[Mapping] = None
                              ) -> QuantModelConfig:
    quant_dict = quant_dict or {}
    b = QuantConfigBuilder(defaults)
    B.declare_embedding_sites(b, quant_dict)
    B.declare_encoder_sites(b, cfg.num_hidden_layers)
    b.weight("pooler.dense.w")
    b.act("pooler.dense.out")
    B.declare_classifier_site(b, "classifier", quant_setup)
    return b.build()


def squeezebert_weight_site_tensors(params: Dict) -> Dict[str, Array]:
    # identical site names to BERT; tensors are the grouped kernels
    return B.bert_weight_site_tensors(params)


def squeezebert_adaround_specs(params: Dict, cfg: SqueezeBertConfig
                               ) -> List[Tuple[str, Dict]]:
    """Grouped layers carry their group count for the local re-apply."""
    specs = B.encoder_adaround_specs(params, cfg)
    group_of = {
        "attn.q": cfg.q_groups, "attn.k": cfg.k_groups,
        "attn.v": cfg.v_groups, "attn_out.dense": cfg.post_attention_groups,
        "ffn.inter": cfg.intermediate_groups, "ffn.dense": cfg.output_groups,
    }
    out = []
    for name, spec in specs:
        suffix = name.split(".", 1)[-1] if name.startswith("L") else name
        g = group_of.get(suffix)
        if g and g > 1 and spec["kind"] == "linear":
            spec = dict(spec, kind="grouped_linear", groups=g)
        out.append((name, spec))
    out += [
        ("pooler.dense", {"kind": "linear", "w": params["pooler"]["kernel"],
                          "b": params["pooler"]["bias"], "act": "tanh"}),
        ("classifier", {"kind": "linear", "w": params["classifier"]["kernel"],
                        "b": params["classifier"]["bias"], "act": None}),
    ]
    return out


def build_squeezebert_int_params(params: Dict, qcfg: QuantModelConfig,
                                 qstate: Mapping,
                                 use_int4: bool = False) -> Dict:
    """All weight sites pack, including the grouped (block-diagonal)
    kernels: a grouped kernel is ``(O, I/groups)`` and each output row
    contracts only its own group's inputs, so the dense packer's per-row
    ``colsum`` zero-point correction is already exact — execution rides
    ops/int_linear.int8_grouped_linear."""
    return B.pack_int_params(squeezebert_weight_site_tensors(params),
                             qcfg, qstate, use_int4=use_int4)


def _sq_layer(ctx, layer, cfg: SqueezeBertConfig, h, mask_bias, prefix,
              train, rngs, h_site=None):
    r0, r1, r2 = rngs if rngs is not None else (None, None, None)
    Bsz, T, H = h.shape
    nh, hd = cfg.num_attention_heads, cfg.head_dim
    a = layer["attn"]
    q = quant_grouped_linear(ctx, prefix + "attn.q", h, a["q"]["kernel"],
                             a["q"]["bias"], cfg.q_groups, input_site=h_site)
    k = quant_grouped_linear(ctx, prefix + "attn.k", h, a["k"]["kernel"],
                             a["k"]["bias"], cfg.k_groups, input_site=h_site)
    v = quant_grouped_linear(ctx, prefix + "attn.v", h, a["v"]["kernel"],
                             a["v"]["bias"], cfg.v_groups, input_site=h_site)
    q = q.reshape(Bsz, T, nh, hd)
    k = k.reshape(Bsz, T, nh, hd)
    v = v.reshape(Bsz, T, nh, hd)
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
    scores = scores / jnp.sqrt(jnp.asarray(hd, scores.dtype))
    if mask_bias is not None:
        scores = scores + mask_bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores.astype(jnp.float32),
                           axis=-1).astype(scores.dtype)
    probs = ctx.act(prefix + "attn.probs", probs)
    probs = dropout(probs, cfg.attention_probs_dropout_prob, r0, not train)
    p_sp, p_qp = B._act_site_params(ctx, prefix + "attn.probs")
    v_sp, v_qp = B._act_site_params(ctx, prefix + "attn.v.out")
    if int_engine and p_sp is not None and v_sp is not None:
        from transformer_quantization_tpu.ops import int_linear as IL

        context = IL.int8_attention_context(
            probs, v, p_sp, p_qp, v_sp, v_qp).reshape(Bsz, T, H)
    else:
        context = jnp.einsum(
            "bnqk,bknd->bqnd", probs, v,
            precision=L.wide_matmul_precision(
                ctx, prefix + "attn.probs",
                prefix + "attn.v.out")).reshape(Bsz, T, H)
    context = ctx.act(prefix + "attn.context", context)

    so = layer["attn_out"]
    y = quant_grouped_linear(ctx, prefix + "attn_out.dense", context,
                             so["dense"]["kernel"], so["dense"]["bias"],
                             cfg.post_attention_groups,
                             input_site=prefix + "attn.context")
    y = dropout(y, cfg.hidden_dropout_prob, r1, not train)
    y = y + h
    y = ctx.act(prefix + "attn_out.res", y)
    attn_out = quant_layernorm(ctx, prefix + "attn_out.ln", y,
                               so["ln"]["scale"], so["ln"]["bias"],
                               cfg.layer_norm_eps)

    f = layer["ffn"]
    inter = quant_grouped_linear(ctx, prefix + "ffn.inter", attn_out,
                                 f["inter"]["kernel"], f["inter"]["bias"],
                                 cfg.intermediate_groups,
                                 activation=cfg.hidden_act,
                                 input_site=prefix + "attn_out.ln.out")
    y = quant_grouped_linear(ctx, prefix + "ffn.dense", inter,
                             f["dense"]["kernel"], f["dense"]["bias"],
                             cfg.output_groups,
                             input_site=prefix + "ffn.inter.out")
    y = dropout(y, cfg.hidden_dropout_prob, r2, not train)
    y = y + attn_out
    y = ctx.act(prefix + "ffn.res", y)
    return quant_layernorm(ctx, prefix + "ffn.ln", y, f["ln"]["scale"],
                           f["ln"]["bias"], cfg.layer_norm_eps)


def squeezebert_apply(params: Dict, batch: Mapping[str, Array],
                      cfg: SqueezeBertConfig,
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
    h_site = "emb.ln.out"
    if pp_mesh is not None and pp_mesh.shape.get("pp", 1) > 1:
        from transformer_quantization_tpu.parallel.pipeline import (
            can_pipeline,
            pipeline_layer_stack,
        )

        why = can_pipeline(ctx, cfg, pp_mesh.shape["pp"], pp_microbatches,
                           h.shape[0])
        if why:
            raise ValueError(f"cannot pipeline the encoder: {why}")
        L = cfg.num_hidden_layers
        h = pipeline_layer_stack(
            pp_mesh, ctx, L, params["layers"], h, mask_bias,
            [list(rngs[1 + 3 * i:4 + 3 * i]) for i in range(L)]
            if rngs else None,
            lambda sub, p_i, hc, m, r: _sq_layer(sub, p_i, cfg, hc, m,
                                                 "L.", train, r),
            n_micro=pp_microbatches, remat=remat)
        h_site = f"L{L - 1}.ffn.ln.out"
    elif scan_layers and B.can_scan_encoder(ctx, cfg):
        L = cfg.num_hidden_layers

        def _fn(sub, p_i, hc, rng_i):
            r = [rng_i[j] for j in range(3)] if rng_i is not None else None
            return _sq_layer(sub, p_i, cfg, hc, mask_bias, "L.", train, r)

        h = B.scan_layer_stack(
            ctx, L, params["layers"], h,
            [jnp.stack(rngs[1 + 3 * i:4 + 3 * i]) for i in range(L)]
            if rngs else None, _fn, remat=remat)
        h_site = f"L{L - 1}.ffn.ln.out"
    else:
        for i in range(cfg.num_hidden_layers):
            layer_rngs = rngs[1 + 3 * i:4 + 3 * i] if rngs else None
            h = B.maybe_remat_layer(
                ctx, remat,
                lambda sub, p_i, h, r, prefix=f"L{i}.", hs=h_site: _sq_layer(
                    sub, p_i, cfg, h, mask_bias, prefix, train, r,
                    h_site=hs),
                params["layers"][i], h, layer_rngs)
            h_site = f"L{i}.ffn.ln.out"

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


def _group_counts(cfg: SqueezeBertConfig) -> Dict[str, int]:
    return {
        "attn.q": cfg.q_groups, "attn.k": cfg.k_groups,
        "attn.v": cfg.v_groups,
        "attn_out.dense": cfg.post_attention_groups,
        "ffn.inter": cfg.intermediate_groups,
        "ffn.dense": cfg.output_groups,
    }


def _block_diag_kernel(kernel: Array, groups: int,
                       fill: float = 0.0) -> Array:
    """Densify a grouped kernel (O, I/g) into the equivalent
    block-diagonal dense kernel (O, I). ``fill`` sets the off-block
    entries (0 for weights; -1 for AdaRound alphas so the hard rounding
    ``floor(0/s) + (alpha >= 0)`` keeps the zeros exactly zero)."""
    out_f, ig = kernel.shape
    og = out_f // groups
    blocks = kernel.reshape(groups, og, ig)
    wd = jnp.full((out_f, ig * groups), fill, kernel.dtype)
    for j in range(groups):
        wd = wd.at[j * og:(j + 1) * og, j * ig:(j + 1) * ig].set(blocks[j])
    return wd


def _densify_for_engine(params: Dict, cfg: SqueezeBertConfig,
                        qstate: Mapping) -> Tuple[Dict, Dict]:
    """Block-diagonal dense view of the grouped encoder + a matching
    qstate (AdaRound alphas densified with a hard round-down fill).

    Exactness: weight packing is symmetric-only
    (ops/int_linear.py:can_pack_weight), the range clamps guarantee
    0 in [x_min, x_max], and ``round(0/s) == 0`` — so the off-block zeros
    quantize to exactly 0 and the dense int8 matmul equals the grouped
    fake-quant op bit-for-bit (modulo float-summation order). The 4x MXU
    FLOP overhead of the zero blocks is cheap next to full kernel fusion
    (int8 MXU runs at ~4x the VPU fake-quant path's effective rate).
    """
    group_of = _group_counts(cfg)
    qstate2 = dict(qstate)
    new_layers = []
    for i, layer in enumerate(params["layers"]):
        nl = {
            "attn": {x: dict(layer["attn"][x]) for x in "qkv"},
            "attn_out": {"dense": dict(layer["attn_out"]["dense"]),
                         "ln": layer["attn_out"]["ln"]},
            "ffn": {"inter": dict(layer["ffn"]["inter"]),
                    "dense": dict(layer["ffn"]["dense"]),
                    "ln": layer["ffn"]["ln"]},
        }
        for suffix, g in group_of.items():
            if g <= 1:
                continue
            top, leaf = suffix.split(".")
            slot = nl[top][leaf]
            slot["kernel"] = _block_diag_kernel(slot["kernel"], g)
            wsite = f"L{i}.{suffix}.w"
            entry = qstate.get(wsite)
            if entry is not None and entry.get("alpha") is not None:
                qstate2[wsite] = dict(
                    entry, alpha=_block_diag_kernel(entry["alpha"], g,
                                                    fill=-1.0))
        new_layers.append(nl)
    return {**params, "layers": new_layers}, qstate2


def build_squeezebert_engine(params: Dict, cfg: SqueezeBertConfig,
                             qcfg: QuantModelConfig, qstate: Mapping,
                             int_params: Optional[Dict] = None,
                             use_int4: bool = False):
    """Assemble the full-handoff engine plan for a calibrated SqueezeBERT.

    The grouped convs densify to block-diagonal kernels (exact — see
    :func:`_densify_for_engine`) and the encoder then rides the shared
    BERT engine plan: SqueezeBERT's site inventory and layer pytree are
    BERT-shaped by construction (declare_squeezebert_sites reuses
    declare_encoder_sites)."""
    dense_params, qstate2 = _densify_for_engine(params, cfg, qstate)
    eng_int = B.build_bert_int_params(dense_params, qcfg, qstate2,
                                      use_int4=use_int4)
    static, plan, _ = B.build_bert_engine(dense_params, cfg, qcfg, qstate2,
                                          int_params=eng_int,
                                          use_int4=use_int4)
    # the caller's generic-path int_params (embeddings/pooler/classifier
    # are dense sites packed identically in both sets)
    if int_params is None:
        int_params = build_squeezebert_int_params(params, qcfg, qstate,
                                                  use_int4=use_int4)
    return static, plan, int_params


def squeezebert_engine_apply(params: Dict, batch: Mapping[str, Array],
                             cfg: SqueezeBertConfig,
                             qcfg: QuantModelConfig, qstate: Mapping,
                             static, plan, int_params: Dict, *,
                             backend: str = "pallas",
                             engine_dtype=jnp.float32,
                             interpret: bool = False,
                             gelu_impl: str = "tanh") -> Dict:
    """Engine forward: embeddings/head via the generic site machinery,
    encoder on int8 payloads (the plan holds the densified weights)."""
    return B.bert_engine_apply(params, batch, cfg, qcfg, qstate, static,
                               plan, int_params, backend=backend,
                               engine_dtype=engine_dtype,
                               interpret=interpret, gelu_impl=gelu_impl)


def family():
    from transformer_quantization_tpu.models.registry import ModelFamily

    def init_head(rng, cfg):
        return B._linear_init(rng, cfg.num_labels, cfg.hidden_size,
                              cfg.initializer_range)

    def load_checkpoint(model_dir, num_labels=None):
        from transformer_quantization_tpu.models import hf_loader as L

        return L.load_squeezebert(model_dir, num_labels)

    return ModelFamily(
        name="squeezebert",
        config_cls=SqueezeBertConfig,
        init_params=init_squeezebert_params,
        init_head=init_head,
        head_key="classifier",
        apply=squeezebert_apply,
        declare_sites=declare_squeezebert_sites,
        apply_quant_dict=B.apply_bert_quant_dict,
        apply_peg=B.apply_peg_wiring,
        weight_site_tensors=squeezebert_weight_site_tensors,
        adaround_specs=squeezebert_adaround_specs,
        build_int_params=build_squeezebert_int_params,
        build_engine=build_squeezebert_engine,
        engine_apply=squeezebert_engine_apply,
        shared_perm_groups=B.shared_permutation_groups,
        load_checkpoint=load_checkpoint,
        config_presets={"squeezebert_uncased": {}},
        tiny_preset=dict(vocab_size=2048, hidden_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         intermediate_size=128,
                         max_position_embeddings=128),
    )
