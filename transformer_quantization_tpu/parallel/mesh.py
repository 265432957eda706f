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


def make_mesh(dp: int = 1, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert dp * tp <= len(devices), (dp, tp, len(devices))
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


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


def batch_pspec() -> Dict:
    return P("dp")


def shard_params(params, mesh: Mesh, pspecs=None, cfg: Optional[BertConfig] = None):
    if pspecs is None:
        assert cfg is not None
        pspecs = bert_param_pspecs(cfg)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, pspecs,
        is_leaf=lambda x: x is None)


def shard_batch(batch, mesh: Mesh):
    s = NamedSharding(mesh, P("dp"))
    return {k: jax.device_put(v, s) for k, v in batch.items()}
