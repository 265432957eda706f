"""AOT model export: the calibrated quantized forward as a portable
StableHLO artifact.

Deployment story the reference lacks entirely (its eval path re-builds the
torch module tree in-process every run): quantize + calibrate once, export,
then serve from the artifact with no model code and no jit-on-first-request.
`jax.export` serializes the jitted forward — including the packed int8/int4
weight payloads and all baked quantization scales, which ride the artifact
as StableHLO constants — with a *symbolic batch dimension*, so one artifact
serves every batch size at a fixed sequence bucket. The torch-world
analogue is TorchScript/ONNX export; here the artifact is the same StableHLO
that XLA compiles on any supported backend (TPU/CPU).

Layout on disk::

    <dir>/manifest.json      {seq_buckets, family, num_labels, vs, ...}
    <dir>/seq<T>.stablehlo   one serialized Exported per sequence bucket
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Sequence

import jax
import jax.numpy as jnp
from jax import export as jexport

MANIFEST = "manifest.json"


def export_forward(fwd: Callable, seq_len: int, *,
                   with_token_types: bool = True,
                   platforms: Sequence[str] = ("cpu", "tpu")):
    """Export ``fwd(input_ids, attention_mask[, token_type_ids]) -> logits``
    at one sequence bucket with a symbolic batch dimension.

    ``fwd`` must close over params / quant state / int payloads — they are
    baked into the artifact as constants. Returns the serialized bytes.
    """
    b, = jexport.symbolic_shape("b")
    args = [jax.ShapeDtypeStruct((b, seq_len), jnp.int32),
            jax.ShapeDtypeStruct((b, seq_len), jnp.float32)]
    if with_token_types:
        args.append(jax.ShapeDtypeStruct((b, seq_len), jnp.int32))
    try:
        exp = jexport.export(jax.jit(fwd), platforms=tuple(platforms))(*args)
    except Exception:
        # single-platform fallback: some lowerings (e.g. custom calls)
        # refuse multi-platform export; the artifact is then tied to the
        # exporting backend, which the manifest records
        exp = jexport.export(jax.jit(fwd))(*args)
    return exp.serialize(), list(exp.platforms)


def export_forward_concrete(fwd: Callable, batch_size: int, seq_len: int, *,
                            with_token_types: bool = True):
    """Export at one CONCRETE (batch, seq) bucket.

    Symbolic batch dims cannot drive Pallas grids, so the generic
    artifact runs the XLA int path; per-bucket concrete exports carry the
    megakernel engine itself (the serving engine already buckets shapes,
    serving/engine.py). Mosaic custom calls are platform-specific — the
    artifact is tied to the exporting backend (recorded per program).
    """
    args = [jax.ShapeDtypeStruct((batch_size, seq_len), jnp.int32),
            jax.ShapeDtypeStruct((batch_size, seq_len), jnp.float32)]
    if with_token_types:
        args.append(jax.ShapeDtypeStruct((batch_size, seq_len), jnp.int32))
    exp = jexport.export(jax.jit(fwd))(*args)
    return exp.serialize(), list(exp.platforms)


def save_export(dir_path: str, fwd: Callable, *, seq_buckets: Sequence[int],
                meta: Dict, with_token_types: bool = True,
                engine_fwd: Callable = None,
                engine_batch_buckets: Sequence[int] = ()) -> Dict:
    """Export ``fwd`` at every sequence bucket into ``dir_path``.

    ``engine_fwd`` (optional): the megakernel-engine forward, exported
    additionally at every concrete (batch, seq) bucket pair as
    ``b<B>seq<T>.engine.stablehlo`` — served preferentially when the
    runtime platform matches (ExportedModel); the symbolic-batch generic
    artifact stays the portable fallback.
    """
    os.makedirs(dir_path, exist_ok=True)
    platforms = None
    for seq in seq_buckets:
        data, platforms = export_forward(
            fwd, seq, with_token_types=with_token_types)
        with open(os.path.join(dir_path, f"seq{seq}.stablehlo"), "wb") as f:
            f.write(data)
    engine_platforms = None
    if engine_fwd is None:
        engine_batch_buckets = ()  # never claim buckets that don't exist
    if engine_fwd is not None and engine_batch_buckets:
        for seq in seq_buckets:
            for b in engine_batch_buckets:
                data, engine_platforms = export_forward_concrete(
                    engine_fwd, b, seq, with_token_types=with_token_types)
                path = os.path.join(dir_path, f"b{b}seq{seq}.engine.stablehlo")
                with open(path, "wb") as f:
                    f.write(data)
    manifest = dict(meta, seq_buckets=sorted(seq_buckets),
                    with_token_types=with_token_types,
                    platforms=platforms,
                    engine_batch_buckets=sorted(engine_batch_buckets),
                    engine_platforms=engine_platforms,
                    format="jax.export.Exported v" + str(
                        jexport.maximum_supported_calling_convention_version))
    with open(os.path.join(dir_path, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def is_export(dir_path: str) -> bool:
    return os.path.exists(os.path.join(dir_path, MANIFEST))


class ExportedModel:
    """Serve-side loader: rebuilds callables from a :func:`save_export`
    directory. ``__call__`` pads the sequence up to the nearest bucket and
    dispatches to that bucket's deserialized program (batch is symbolic —
    any batch size runs without recompilation beyond XLA's per-shape
    specialization)."""

    def __init__(self, dir_path: str):
        with open(os.path.join(dir_path, MANIFEST)) as f:
            self.manifest = json.load(f)
        self.seq_buckets = list(self.manifest["seq_buckets"])
        self._fns = {}
        for seq in self.seq_buckets:
            with open(os.path.join(dir_path, f"seq{seq}.stablehlo"),
                      "rb") as f:
                self._fns[seq] = jexport.deserialize(f.read())
        # engine-path programs at concrete (batch, seq) buckets — used
        # preferentially when the runtime platform matches the exporter's
        self.engine_batch_buckets = list(
            self.manifest.get("engine_batch_buckets") or [])
        self._engine_fns = {}
        eplat = self.manifest.get("engine_platforms") or []
        if self.engine_batch_buckets and jax.default_backend() in [
                p.lower() for p in eplat] + (
                ["axon"] if "tpu" in [p.lower() for p in eplat] else []):
            for seq in self.seq_buckets:
                for b in self.engine_batch_buckets:
                    p = os.path.join(dir_path, f"b{b}seq{seq}.engine"
                                               ".stablehlo")
                    if os.path.exists(p):
                        with open(p, "rb") as f:
                            self._engine_fns[(b, seq)] = jexport.deserialize(
                                f.read())

    def bucket_for(self, seq_len: int) -> int:
        for s in self.seq_buckets:
            if seq_len <= s:
                return s
        raise ValueError(f"sequence length {seq_len} exceeds the largest "
                         f"exported bucket {self.seq_buckets[-1]}")

    def _engine_batch_bucket(self, bsz: int, seq: int):
        """Smallest exported engine batch bucket that holds ``bsz`` AND
        whose (bucket, seq) program actually exists (partial exports are
        legal; skip missing programs rather than falling back)."""
        for b in self.engine_batch_buckets:
            if bsz <= b and (b, seq) in self._engine_fns:
                return b
        return None

    def __call__(self, batch: Dict) -> jax.Array:
        ids = jnp.asarray(batch["input_ids"], jnp.int32)
        mask = jnp.asarray(batch.get(
            "attention_mask", jnp.ones(ids.shape, jnp.float32)), jnp.float32)
        bsz = ids.shape[0]
        seq = self.bucket_for(ids.shape[1])
        pad = seq - ids.shape[1]
        eb = self._engine_batch_bucket(bsz, seq) if self._engine_fns else None
        use_engine = eb is not None
        bpad = (eb - bsz) if use_engine else 0
        if pad or bpad:
            ids = jnp.pad(ids, ((0, bpad), (0, pad)))
            mask = jnp.pad(mask, ((0, bpad), (0, pad)))
        args = [ids, mask]
        if self.manifest["with_token_types"]:
            tt = batch.get("token_type_ids")
            tt = (jnp.zeros(ids.shape, jnp.int32) if tt is None
                  else jnp.pad(jnp.asarray(tt, jnp.int32),
                               ((0, bpad), (0, pad))))
            args.append(tt)
        if use_engine:
            out = self._engine_fns[(eb, seq)].call(*args)
            return out[:bsz] if bpad else out
        return self._fns[seq].call(*args)
