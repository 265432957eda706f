"""Checkpoint / resume for quantized models.

The reference delegates checkpoints to HF ``Trainer.save_model`` and dumps
AdaRound alphas as ``state_dict_adaround.pth`` (reference: main.py:586-588,
:654-656; README.md:84-136 directory contract), and its
``--quant-model-path`` flag exists but is never consumed
(transformer_click_options.py:143-147). Here checkpoints are first-class:
one directory holds

- ``params.npz``        — model weights (the FP32 master pytree)
- ``qstate.npz``        — per-site quant state: scales, zero points,
                          signedness, range state, AdaRound alphas, PEG
                          permutations (the full artifact of calibration)
- ``int_params.npz``    — optional packed int8/int4 payloads
- ``manifest.json``     — model family/config, tree structure, dtypes

Arrays are stored flat under ``/``-joined pytree paths, so the format is
inspectable with plain numpy and stable across refactors of the tree
containers.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

_SENTINEL_NONE = "__none__"


def _flatten(tree: Any, prefix: str = "") -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}#{i}/"))
    elif dataclasses.is_dataclass(tree) and not isinstance(tree, type):
        for f in dataclasses.fields(tree):
            out.update(_flatten(getattr(tree, f.name),
                                f"{prefix}@{type(tree).__name__}.{f.name}/"))
    elif tree is None:
        out[prefix.rstrip("/")] = _SENTINEL_NONE
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def _set_path(root: Dict, path: str, value: Any) -> None:
    parts = path.split("/")
    node = root
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _rebuild(node: Any) -> Any:
    if not isinstance(node, dict):
        return node
    keys = list(node.keys())
    if keys and all(k.startswith("#") for k in keys):
        return [_rebuild(node[f"#{i}"]) for i in range(len(keys))]
    if keys and all(k.startswith("@") for k in keys):
        # dataclass: one level "@ClassName.field"
        cls_name = keys[0][1:].split(".")[0]
        fields = {k.split(".", 1)[1]: _rebuild(v) for k, v in node.items()}
        cls = _QP_TYPES.get(cls_name)
        if cls is None:
            return fields
        return cls(**fields)
    return {k: _rebuild(v) for k, v in node.items()}


def _qp_types() -> Dict[str, type]:
    from transformer_quantization_tpu.quant.quantizers import QuantParams

    return {"QuantParams": QuantParams}


_QP_TYPES: Dict[str, type] = {}


def save_tree(path: str, tree: Any) -> None:
    flat = _flatten(tree)
    arrays = {}
    nones = []
    for k, v in flat.items():
        if isinstance(v, str) and v == _SENTINEL_NONE:
            nones.append(k)
        else:
            arrays[k] = np.asarray(v)
    np.savez(path, __none_paths__=np.asarray(nones, dtype=object),
             **arrays)


def load_tree(path: str) -> Any:
    global _QP_TYPES
    if not _QP_TYPES:
        _QP_TYPES = _qp_types()
    with np.load(path, allow_pickle=True) as z:
        root: Dict = {}
        nones = set(z["__none_paths__"].tolist())
        for k in z.files:
            if k == "__none_paths__":
                continue
            _set_path(root, k, jnp.asarray(z[k]))
        for k in nones:
            _set_path(root, k, None)
    return _rebuild(root)


def save_checkpoint(ckpt_dir: str, *, params: Any, family: str, cfg: Any,
                    qstate: Optional[Dict] = None,
                    int_params: Optional[Dict] = None,
                    extra: Optional[Dict] = None) -> None:
    """Write a checkpoint directory (main.py:586-588 equivalent + more)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    save_tree(os.path.join(ckpt_dir, "params.npz"), params)
    if qstate is not None:
        save_tree(os.path.join(ckpt_dir, "qstate.npz"), qstate)
    if int_params is not None:
        save_tree(os.path.join(ckpt_dir, "int_params.npz"), int_params)
    manifest = {
        "family": family,
        "config": dataclasses.asdict(cfg),
        "config_cls": type(cfg).__name__,
        "has_qstate": qstate is not None,
        "has_int_params": int_params is not None,
        "extra": extra or {},
        "format_version": 1,
    }
    with open(os.path.join(ckpt_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, default=str)


def load_checkpoint(ckpt_dir: str) -> Dict[str, Any]:
    """Load a checkpoint directory -> {family, cfg, params, qstate?,
    int_params?, extra}."""
    from transformer_quantization_tpu.models.registry import get_family

    with open(os.path.join(ckpt_dir, "manifest.json")) as f:
        manifest = json.load(f)
    fam = get_family(manifest["family"])
    cfg_kwargs = manifest["config"]
    cfg = fam.config_cls(**cfg_kwargs)
    out: Dict[str, Any] = {
        "family": manifest["family"],
        "cfg": cfg,
        "params": load_tree(os.path.join(ckpt_dir, "params.npz")),
        "extra": manifest.get("extra", {}),
    }
    if manifest.get("has_qstate"):
        out["qstate"] = load_tree(os.path.join(ckpt_dir, "qstate.npz"))
    if manifest.get("has_int_params"):
        out["int_params"] = load_tree(os.path.join(ckpt_dir,
                                                   "int_params.npz"))
    return out


def is_checkpoint(path: Optional[str]) -> bool:
    return bool(path) and os.path.exists(os.path.join(path, "manifest.json"))
