"""Device mesh and sharding layout (DP x TP).

The reference is single-process single-device (SURVEY.md §2.6 — no
distributed code of any kind); scale-out is a capability this framework
adds, the TPU-native way: a ``jax.sharding.Mesh`` with named axes

- ``dp`` — data parallel: batch dimension sharded across it
- ``tp`` — tensor parallel over ICI: attention heads and FFN hidden
  sharded Megatron-style (q/k/v and ffn.inter split over output features;
  attn_out.dense and ffn.dense split over input features, so XLA inserts a
  single psum per block)

Shardings are *annotations*: the forward/backward code is unchanged, GSPMD
propagates the layouts and inserts all-gather/reduce-scatter/psum on ICI.
Per-tensor activation-range reductions inside calibration/QAT become global
collectives automatically.

Sequence-parallel seams: activations are laid out (batch, seq, hidden) and
every quant site reduces with ``axis``-aware code, so a ``sp`` mesh axis over
seq can be added without touching site logic (SURVEY.md §5 long-context row).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from transformer_quantization_tpu.models.bert import BertConfig


def make_mesh(dp: int = 1, tp: int = 1, sp: int = 1, pp: int = 1,
              devices=None) -> Mesh:
    """dp x tp x sp x pp device mesh.

    ``sp`` (sequence parallel) shards the time dimension of activations;
    it is a pure annotation axis — models are unchanged and GSPMD inserts
    the all-gathers attention needs (scores contract the full sequence)
    while embeddings/LayerNorm/FFN stay sequence-sharded.

    ``pp`` (pipeline parallel) is a *manual* axis consumed by the GPipe
    encoder schedule (parallel/pipeline.py): layer stacks shard over it and
    activations hop stages via ppermute; dp/tp/sp stay automatic (GSPMD)
    inside each stage.
    """
    devices = devices if devices is not None else jax.devices()
    assert dp * tp * sp * pp <= len(devices), (dp, tp, sp, pp, len(devices))
    arr = np.asarray(devices[: dp * tp * sp * pp]).reshape(dp, tp, sp, pp)
    return Mesh(arr, ("dp", "tp", "sp", "pp"))


def _lin_col(shard_bias: bool = True) -> Dict:
    # column-parallel: output features sharded (kernel stored (out, in))
    return {"kernel": P("tp", None), "bias": P("tp") if shard_bias else P()}


def _lin_row() -> Dict:
    # row-parallel: input features sharded; output replicated via psum
    return {"kernel": P(None, "tp"), "bias": P()}


def _lin_rep() -> Dict:
    return {"kernel": P(), "bias": P()}


def _ln() -> Dict:
    return {"scale": P(), "bias": P()}


def bert_param_pspecs(cfg: BertConfig) -> Dict:
    """Megatron-style TP layout for the BERT parameter pytree."""
    layer = {
        "attn": {"q": _lin_col(), "k": _lin_col(), "v": _lin_col()},
        "attn_out": {"dense": _lin_row(), "ln": _ln()},
        "ffn": {"inter": _lin_col(), "dense": _lin_row(), "ln": _ln()},
    }
    return {
        "embeddings": {
            "word": P(),  # replicated: gathers stay local
            "position": P(),
            "token_type": P(),
            "ln": _ln(),
        },
        "layers": [layer for _ in range(cfg.num_hidden_layers)],
        "pooler": _lin_rep(),
        "classifier": _lin_rep(),
    }


def roberta_param_pspecs(cfg) -> Dict:
    """TP layout for RoBERTa: BERT encoder + two-layer head (replicated)."""
    base = bert_param_pspecs(cfg)
    del base["pooler"]
    base["classifier"] = {"dense": _lin_rep(), "out_proj": _lin_rep()}
    return base


def _nonorm_p() -> Dict:
    return {"weight": P(), "bias": P()}


def mobilebert_param_pspecs(cfg) -> Dict:
    """TP layout for MobileBERT's inverted-bottleneck layers.

    q/k/v and both intermediates are column-parallel; self-output and FFN
    output denses row-parallel; bottleneck-in projections column-parallel
    and bottleneck-out row-parallel, so each block closes with one psum.
    NoNorm vectors replicate (elementwise, tiny).
    """
    def layer():
        d: Dict = {
            "attn": {"q": _lin_col(), "k": _lin_col(), "v": _lin_col()},
            "attn_out": {"dense": _lin_row(), "norm": _nonorm_p()},
            "inter": _lin_col(),
            "out": {"dense": _lin_row(), "norm": _nonorm_p()},
            "ffn": [{"inter": _lin_col(), "dense": _lin_row(),
                     "norm": _nonorm_p()}
                    for _ in range(cfg.num_stacked_ffn)],
        }
        if cfg.use_bottleneck:
            d["bottleneck"] = {"input": {"dense": _lin_col(),
                                         "norm": _nonorm_p()}}
            if cfg.has_shared_kq_bottleneck:
                d["bottleneck"]["attention"] = {"dense": _lin_col(),
                                                "norm": _nonorm_p()}
            d["out"]["bn_dense"] = _lin_row()
            d["out"]["bn_norm"] = _nonorm_p()
        return d

    return {
        "embeddings": {
            "word": P(), "position": P(), "token_type": P(),
            "transform": _lin_rep(), "norm": _nonorm_p(),
        },
        "layers": [layer() for _ in range(cfg.num_hidden_layers)],
        "pooler": _lin_rep(),
        "classifier": _lin_rep(),
    }


def family_param_pspecs(family: str, cfg) -> Dict:
    """Dispatch TP parameter layouts by model family."""
    if family == "bert":
        return bert_param_pspecs(cfg)
    if family == "roberta":
        return roberta_param_pspecs(cfg)
    if family == "mobilebert":
        return mobilebert_param_pspecs(cfg)
    raise KeyError(family)


def batch_pspec(seq_shard: bool = False) -> P:
    """(B, T)-shaped model inputs: batch over dp, optionally seq over sp."""
    return P("dp", "sp") if seq_shard else P("dp")


def shard_params(params, mesh: Mesh, pspecs=None, cfg: Optional[BertConfig] = None):
    if pspecs is None:
        assert cfg is not None
        pspecs = bert_param_pspecs(cfg)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, pspecs,
        is_leaf=lambda x: x is None)


def shard_batch(batch, mesh: Mesh, seq_shard: bool = False):
    """Place a host batch on the mesh: (B, T) arrays over (dp[, sp]),
    1-D arrays (labels) over dp only."""
    s2 = NamedSharding(mesh, batch_pspec(seq_shard and "sp" in
                                         mesh.axis_names))
    s1 = NamedSharding(mesh, P("dp"))
    return {k: jax.device_put(v, s2 if getattr(v, "ndim", 1) >= 2 else s1)
            for k, v in batch.items()}
