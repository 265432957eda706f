"""Tensor-parallel BERT eval forward with int8-compressed collectives.

GSPMD TP (parallel/mesh.py pspecs) moves uncompressed bf16/f32 bytes at
the two row-parallel closings per layer. This module is the *manual*
shard_map TP execution mode whose closings ride the quantized
collectives of parallel/collectives.py (EQuARX-style, SURVEY.md §5
'distributed communication backend' row): each psum decomposes into
``psum_scatter_int8`` + ``all_gather_int8``, moving 2·(n-1)/n·|y| int8
bytes (+ per-row scales) over ICI instead of 4x that in f32.

The model math mirrors models/bert.py's full-precision forward
op-for-op (Megatron layout: q/k/v and ffn.inter column-parallel — heads
and FFN hidden local, no comms — attn_out.dense and ffn.dense
row-parallel, one closing each). ``comm='psum'`` uses exact f32 psums
(parity oracle for the TP decomposition itself); ``comm='int8'`` is the
compressed wire format, with error bounded by one per-row
absmax/127 quantization step per ring hop.

The reference has no distributed execution of any kind (SURVEY.md §2.6).
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from transformer_quantization_tpu.models import bert as B
from transformer_quantization_tpu.ops.layers import _resolve_act
from transformer_quantization_tpu.parallel.collectives import (
    all_gather_int8,
    psum_scatter_int8,
)
from transformer_quantization_tpu.parallel.mesh import bert_param_pspecs

Array = jax.Array


def _ln(x, p, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps) * p["scale"]
            + p["bias"]).astype(x.dtype)


def _close(partial: Array, bias: Array, comm: str) -> Array:
    """Close a row-parallel partial product over the 'tp' axis."""
    if comm == "psum":
        y = jax.lax.psum(partial, "tp")
    else:
        y_shard = psum_scatter_int8(partial, "tp", scatter_dimension=-1)
        y = all_gather_int8(y_shard, "tp", axis=-1).astype(partial.dtype)
    return y + bias


def tp_bert_logits(params: Dict, batch: Mapping[str, Array],
                   cfg: B.BertConfig, mesh: Mesh, *, comm: str = "int8",
                   dtype=jnp.float32) -> Array:
    """Full BERT classifier forward under manual TP via shard_map.

    ``params`` in the standard (replicated) layout; kernels are sharded by
    the in_specs (bert_param_pspecs), everything else replicated. Inference
    only (no dropout). ``comm``: 'int8' compressed closings | 'psum' exact.
    """
    tp = mesh.shape["tp"]
    assert cfg.num_attention_heads % tp == 0
    nh_local = cfg.num_attention_heads // tp
    hd = cfg.head_dim
    act = _resolve_act(cfg.hidden_act)

    def body(params, input_ids, token_type_ids, position_ids, mask_bias):
        e = params["embeddings"]
        h = (e["word"][input_ids] + e["token_type"][token_type_ids]
             + e["position"][position_ids])
        h = _ln(h, e["ln"], cfg.layer_norm_eps).astype(dtype)
        Bb, T, H = h.shape

        for layer in params["layers"]:
            a = layer["attn"]
            # column-parallel q/k/v: local (H/tp) output features
            q = jnp.einsum("bti,oi->bto", h, a["q"]["kernel"]) + a["q"]["bias"]
            k = jnp.einsum("bti,oi->bto", h, a["k"]["kernel"]) + a["k"]["bias"]
            v = jnp.einsum("bti,oi->bto", h, a["v"]["kernel"]) + a["v"]["bias"]
            q = q.reshape(Bb, T, nh_local, hd)
            k = k.reshape(Bb, T, nh_local, hd)
            v = v.reshape(Bb, T, nh_local, hd)
            scores = jnp.einsum("bqnd,bknd->bnqk", q, k).astype(h.dtype)
            scores = scores / jnp.sqrt(jnp.asarray(hd, scores.dtype))
            if mask_bias is not None:
                scores = scores + mask_bias.astype(scores.dtype)
            probs = jax.nn.softmax(scores.astype(jnp.float32),
                                   axis=-1).astype(scores.dtype)
            context = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(
                Bb, T, nh_local * hd)

            so = layer["attn_out"]
            partial = jnp.einsum("bti,oi->bto", context,
                                 so["dense"]["kernel"])
            y = _close(partial, so["dense"]["bias"], comm)
            attn_out = _ln(y + h, so["ln"], cfg.layer_norm_eps)

            f = layer["ffn"]
            inter = act(jnp.einsum("bti,oi->bto", attn_out,
                                   f["inter"]["kernel"]) + f["inter"]["bias"])
            partial = jnp.einsum("bti,oi->bto", inter, f["dense"]["kernel"])
            y = _close(partial, f["dense"]["bias"], comm)
            h = _ln(y + attn_out, f["ln"], cfg.layer_norm_eps)

        pooled = jnp.tanh(
            jnp.einsum("bi,oi->bo", h[:, 0, :].astype(jnp.float32),
                       params["pooler"]["kernel"]) + params["pooler"]["bias"])
        return (jnp.einsum("bi,oi->bo", pooled,
                           params["classifier"]["kernel"])
                + params["classifier"]["bias"])

    input_ids, token_type_ids, position_ids, mask_bias = B.prepare_inputs(
        batch)
    pspecs = bert_param_pspecs(cfg)
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(pspecs, P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(params, input_ids, token_type_ids, position_ids, mask_bias)


def tp_wire_bytes(cfg: B.BertConfig, batch_size: int, seq: int,
                  tp: int) -> Dict[str, float]:
    """Per-step ICI wire bytes of the TP closings, per device.

    Each layer closes two row-parallel products of B*T*H elements. A psum
    decomposes into reduce-scatter + all-gather, each moving (n-1)/n of
    the tensor per device. The int8 format moves 1 byte/element plus one
    f32 scale per row (H elements) per hop.
    """
    n = tp
    elems = 2 * cfg.num_hidden_layers * batch_size * seq * cfg.hidden_size
    frac = 2.0 * (n - 1) / n  # reduce-scatter + all-gather
    scale_elems = elems / cfg.hidden_size  # one per row
    return {
        "f32_bytes": frac * elems * 4,
        "bf16_bytes": frac * elems * 2,
        "int8_bytes": frac * (elems * 1 + scale_elems * 4),
        "compression_vs_f32": (frac * elems * 4)
        / (frac * (elems + scale_elems * 4)),
    }


def tp_int8_report(cfg: B.BertConfig, params, batch, mesh: Mesh) -> Dict:
    """Run both comm modes + the replicated oracle; return error/bytes."""
    ref, _ = B.bert_apply(params, batch, cfg, None, None,
                          B.QuantMode(weight_quant=False, act_quant=False))
    ref = np.asarray(ref["logits"])
    exact = np.asarray(tp_bert_logits(params, batch, cfg, mesh,
                                      comm="psum"))
    q = np.asarray(tp_bert_logits(params, batch, cfg, mesh, comm="int8"))
    bs, seq = batch["input_ids"].shape
    wire = tp_wire_bytes(cfg, bs, seq, mesh.shape["tp"])
    return {
        "tp": mesh.shape["tp"],
        "max_err_psum_vs_replicated": float(np.max(np.abs(exact - ref))),
        "max_err_int8_vs_replicated": float(np.max(np.abs(q - ref))),
        "logit_scale": float(np.max(np.abs(ref))),
        **{k: round(v, 1) if isinstance(v, float) else v
           for k, v in wire.items()},
    }
