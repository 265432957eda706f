"""Quantization observability.

The reference's outlier-analysis tooling (SURVEY.md §5 metrics row):
per-tensor/per-token TensorBoard histograms of residual activations
(reference: utils/tb_utils.py:26-52, wired into model forwards at
models/quantized_bert.py:268-274), plus the per-quantizer clamped-fraction
statistic (quantization/quantizers.py:163-170). Functional equivalents:

- :func:`range_summary` — every site's learned range/scale/bits, straight
  from the calibrated quant state (no forward needed)
- :func:`clipped_fraction` — fraction of a tensor outside a site's range,
  the reference's ``_clamped`` stat
- :func:`activation_report` — one capture forward over chosen sites:
  per-site histograms, per-token max-abs profiles (the paper's outlier
  fingerprint), and clip rates
- :class:`TBWriter` — TensorBoard event files when torch's writer is
  importable, JSONL fallback otherwise
"""

from __future__ import annotations

import json
import os
from typing import Dict, Mapping, Sequence

import jax.numpy as jnp
import numpy as np

from transformer_quantization_tpu.quant import quantizers as Q


def range_summary(qcfg, qstate: Mapping) -> Dict[str, Dict]:
    """Per-site range/scale summary from calibrated state."""
    out: Dict[str, Dict] = {}
    for name, site in qcfg.items():
        st = qstate.get(name)
        if st is None or "qp" not in st:
            continue
        qp = st["qp"]
        xmin, xmax = Q.x_min_max_of(site.spec, qp)
        out[name] = {
            "kind": site.kind,
            "n_bits": site.spec.n_bits,
            "enabled": site.enabled,
            "symmetric": site.spec.symmetric,
            "x_min": np.asarray(xmin).tolist(),
            "x_max": np.asarray(xmax).tolist(),
            "delta": np.asarray(Q.scale_of(site.spec, qp)).tolist(),
            "per_channel_shape": list(np.shape(qp.delta)),
            "has_alpha": st.get("alpha") is not None,
        }
    return out


def clipped_fraction(spec, qp, x) -> float:
    """Fraction of elements clamped by the quantizer's range —
    the reference's ``_clamped`` tracker (quantizers.py:163-170)."""
    xmin, xmax = Q.x_min_max_of(spec, qp)
    clipped = jnp.logical_or(x < xmin, x > xmax)
    return float(jnp.mean(clipped.astype(jnp.float32)))


def _histogram(x: np.ndarray, bins: int = 64) -> Dict:
    hist, edges = np.histogram(x, bins=bins)
    return {"counts": hist.tolist(), "lo": float(edges[0]),
            "hi": float(edges[-1])}


def activation_report(apply_fn, params, qcfg, qstate, batch,
                      sites: Sequence[str], mode=None,
                      bins: int = 64) -> Dict[str, Dict]:
    """Capture the chosen sites in one forward and fingerprint them.

    Per site: histogram, per-token max-abs profile over (B, T, d) tensors
    (the per-token outlier structure of tb_utils.py:26-52), dynamic range,
    and the clip rate against the site's calibrated range.
    """
    from transformer_quantization_tpu.quant.qconfig import QuantMode

    mode = mode or QuantMode(weight_quant=False, act_quant=False)
    out, _ = apply_fn(params, batch, qcfg=qcfg, qstate=qstate, mode=mode,
                      capture_sites=tuple(sites))
    caps = out.get("captures", {})
    report: Dict[str, Dict] = {}
    for name in sites:
        if name not in caps:
            continue
        _, y = caps[name]
        y = np.asarray(y)
        entry: Dict = {
            "shape": list(y.shape),
            "min": float(y.min()),
            "max": float(y.max()),
            "mean": float(y.mean()),
            "std": float(y.std()),
            "hist": _histogram(y, bins),
        }
        if y.ndim == 3:
            entry["per_token_max_abs"] = np.abs(y).max(axis=(0, 2)).tolist()
        site_key = f"{name}.out" if f"{name}.out" in qcfg else name
        st = qstate.get(site_key)
        if st is not None and "qp" in st and site_key in qcfg:
            entry["clipped_fraction"] = clipped_fraction(
                qcfg[site_key].spec, st["qp"], jnp.asarray(y))
        report[name] = entry
    return report


def residual_sites(qcfg) -> list:
    """All residual-sum activation sites (``*.res``) — the tensors whose
    outlier structure the paper analyzes (models/quantized_bert.py:233-277
    res quantizers; logged via tb_utils.py hooks in the reference)."""
    return [n for n, c in qcfg.items()
            if c.kind == "act" and n.endswith(".res")]


def write_residual_histograms(apply_fn, params, qcfg, qstate, batch, writer,
                              *, step: int = 0, mode=None,
                              per_token: bool = True,
                              sites: Sequence[str] = None) -> list:
    """In-forward per-layer residual histograms, per-tensor AND per-token.

    The functional equivalent of the reference's forward-hook TB logging
    (reference: utils/tb_utils.py:26-52 wired at
    models/quantized_bert.py:268-274): one capture forward, then for each
    residual site a whole-tensor histogram (tag ``<site>/layer`` at
    ``step``) and, for the first sample, one histogram per token position
    (tag ``<site>/token``, token index as the step — the reference's
    layout). Returns the list of sites written.
    """
    from transformer_quantization_tpu.quant.qconfig import QuantMode

    sites = list(sites) if sites is not None else residual_sites(qcfg)
    mode = mode or QuantMode(weight_quant=False, act_quant=False)
    out, _ = apply_fn(params, batch, qcfg=qcfg, qstate=qstate, mode=mode,
                      capture_sites=tuple(sites))
    caps = out.get("captures", {})
    written = []
    for name in sites:
        if name not in caps:
            continue
        y = np.asarray(caps[name][1])
        writer.histogram(f"{name}/layer", y, step)
        if per_token and y.ndim == 3:
            for t in range(y.shape[1]):
                writer.histogram(f"{name}/token", y[0, t], step=t)
        written.append(name)
    return written


class TBWriter:
    """TensorBoard writer with a JSONL fallback.

    The reference writes per-layer histograms + global-step counters via
    ``torch.utils.tensorboard`` (main.py:599-648); torch ships in this
    image so the same backend is used when available.
    """

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(logdir)
        except Exception:
            self._tb = None
            self._jsonl = open(os.path.join(logdir, "events.jsonl"), "a")

    def scalar(self, tag: str, value: float, step: int = 0):
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        else:
            self._jsonl.write(json.dumps(
                {"type": "scalar", "tag": tag, "value": float(value),
                 "step": step}) + "\n")

    def histogram(self, tag: str, values: np.ndarray, step: int = 0):
        if self._tb is not None:
            self._tb.add_histogram(tag, np.asarray(values), step)
        else:
            self._jsonl.write(json.dumps(
                {"type": "histogram", "tag": tag,
                 "hist": _histogram(np.asarray(values)), "step": step}) + "\n")

    def write_range_summary(self, qcfg, qstate, step: int = 0):
        for name, info in range_summary(qcfg, qstate).items():
            d = np.asarray(info["delta"]).ravel()
            self.scalar(f"ranges/{name}/delta_mean", float(d.mean()), step)
            xmin = np.asarray(info["x_min"]).ravel()
            xmax = np.asarray(info["x_max"]).ravel()
            self.scalar(f"ranges/{name}/x_min", float(xmin.min()), step)
            self.scalar(f"ranges/{name}/x_max", float(xmax.max()), step)

    def close(self):
        if self._tb is not None:
            self._tb.close()
        if self._jsonl is not None:
            self._jsonl.close()
