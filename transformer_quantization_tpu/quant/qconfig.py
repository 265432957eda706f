"""Site-addressable quantization configuration.

The reference wires quantization into models by *mutating* module trees:
``QuantizationHijacker`` mixins intercept forwards
(reference: quantization/hijacker.py:18-116), ``quantize_model`` rewrites
module trees (autoquant_utils.py:219-252), and a ``quant_dict``
mini-language hijacks individual quantizers after the fact
(main.py:443-498, utils/per_embd_quant_utils.py:7-68).

The TPU-native equivalent is declarative: a model *declares* its quantization
sites by name, and a :class:`QuantModelConfig` — a hashable, jit-static tree
of per-site configs — controls bits / method / estimator / axis / grouping
per site. The ``quant_dict`` language is preserved verbatim as a config
transformation (:func:`apply_quant_dict`), applied before tracing instead of
by runtime monkey-patching.

Supported ``quant_dict`` values (per_embd_quant_utils.py:7-34):
  int        -> n_bits override
  'fp32'     -> disable the quantizer at that site
  'per_embd' -> per-embedding activation quant (axis=2)
  'ngN'      -> N per-embedding groups (axis=2)
  'ngpN'     -> N groups + range-based channel permutation
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Dict, Mapping, Optional, Tuple

from transformer_quantization_tpu.quant.quantizers import QMethod, QuantizerSpec
from transformer_quantization_tpu.quant.ranges import (
    OptMethod,
    RangeEstimatorConfig,
    RangeMethod,
    ReduceSpec,
)


class Phase(enum.Enum):
    """Quantizer phase — the reference's ``Qstates``
    (quantization/quantization_manager.py:12-16) as static jit
    specialization instead of a runtime state machine.

    - ``estimate``: range estimators update from data, then quantize
      (estimate_ranges; also estimate_ranges_train during training).
    - ``fix``: quantize with stored parameters (fix_ranges).
    - ``learn``: scale/zero-point are trainable leaves supplied by the
      caller's parameter pytree (learn_ranges).
    - ``record_ranges``: PEG permutation pre-pass — record per-channel
      dynamic ranges, pass data through unquantized
      (range_estimators.py:68-80, quantization_manager.py:95-97).
    """

    estimate = "estimate"
    fix = "fix"
    learn = "learn"
    record_ranges = "record_ranges"


@dataclasses.dataclass(frozen=True)
class QuantMode:
    """Whole-model quantization state for one traced forward.

    Mirrors ``QuantizedModel.set_quant_state`` and the per-kind range-state
    switches (reference: quantization/base_quantized_model.py:15-113).
    """

    weight_quant: bool = True
    act_quant: bool = True
    weight_phase: Phase = Phase.fix
    act_phase: Phase = Phase.fix


@dataclasses.dataclass(frozen=True)
class QuantSiteConfig:
    """Static per-site configuration.

    One of these exists for every weight quantizer and every activation
    quantizer in the model — the functional analogue of one
    ``QuantizationManager`` (quantization/quantization_manager.py:19-112).
    """

    kind: str  # 'weight' | 'act'
    spec: QuantizerSpec = QuantizerSpec()
    range_cfg: RangeEstimatorConfig = RangeEstimatorConfig()
    enabled: bool = True  # False == the reference's FP32Acts replacement
    per_channel: bool = False
    axis: Optional[int] = None
    n_groups: Optional[int] = None
    permute: bool = False

    @property
    def reduce_spec(self) -> ReduceSpec:
        return ReduceSpec(per_channel=self.per_channel, axis=self.axis,
                          n_groups=self.n_groups, permute=self.permute)

    @property
    def n_channels_of(self):
        return None

    def ranges_shape(self, x_shape: Tuple[int, ...]) -> Tuple[int, ...]:
        """Reduced range/param shape for data of shape ``x_shape``."""
        if self.axis is not None:
            return (x_shape[self.axis],)
        if self.per_channel:
            return (x_shape[0],)
        return ()


@dataclasses.dataclass(frozen=True)
class QuantModelConfig:
    """Hashable mapping site-name -> :class:`QuantSiteConfig`."""

    sites: Tuple[Tuple[str, QuantSiteConfig], ...] = ()

    def __post_init__(self):
        object.__setattr__(self, "_by_name", dict(self.sites))

    def __getitem__(self, name: str) -> QuantSiteConfig:
        return self._by_name[name]

    def __contains__(self, name: str) -> bool:
        return name in self._by_name

    def names(self):
        return [n for n, _ in self.sites]

    def items(self):
        return self.sites

    def replace_site(self, name: str, **changes) -> "QuantModelConfig":
        new = tuple(
            (n, dataclasses.replace(c, **changes) if n == name else c)
            for n, c in self.sites
        )
        if name not in self._by_name:
            raise KeyError(name)
        return QuantModelConfig(new)

    def replace_sites(self, changes: Mapping[str, Dict]) -> "QuantModelConfig":
        unknown = set(changes) - set(self._by_name)
        if unknown:
            raise KeyError(f"unknown quant sites: {sorted(unknown)}")
        new = tuple(
            (n, dataclasses.replace(c, **changes[n]) if n in changes else c)
            for n, c in self.sites
        )
        return QuantModelConfig(new)


# ---------------------------------------------------------------------------
# Default-config builder — the functional analogue of make_qparams
# (reference: utils/quant_click_options.py:356-380) + QuantizedModule defaults
# (quantization/base_quantized_classes.py:35-60).
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class QuantDefaults:
    """Global quantization options, as produced by the CLI layer."""

    method: QMethod = QMethod.asymmetric_uniform
    act_method: Optional[QMethod] = None  # None -> same as method
    n_bits: int = 8
    n_bits_act: Optional[int] = None
    per_channel_weights: bool = False
    percentile: Optional[float] = None
    weight_range_method: RangeMethod = RangeMethod.current_minmax
    weight_range_opt: OptMethod = OptMethod.grid
    weight_num_candidates: int = 100
    act_range_method: RangeMethod = RangeMethod.running_minmax
    act_range_opt: OptMethod = OptMethod.golden_section
    act_momentum: float = 0.9
    act_num_candidates: int = 100
    scale_domain: str = "linear"

    def weight_site(self, **over) -> QuantSiteConfig:
        spec = QuantizerSpec(n_bits=over.pop("n_bits", self.n_bits),
                             method=over.pop("method", self.method),
                             scale_domain=self.scale_domain)
        range_cfg = RangeEstimatorConfig(
            method=over.pop("range_method", self.weight_range_method),
            percentile=self.percentile,
            opt_method=over.pop("opt_method", self.weight_range_opt),
            num_candidates=self.weight_num_candidates)
        return QuantSiteConfig(kind="weight", spec=spec, range_cfg=range_cfg,
                               per_channel=over.pop("per_channel",
                                                    self.per_channel_weights),
                               **over)

    def act_site(self, **over) -> QuantSiteConfig:
        spec = QuantizerSpec(
            n_bits=over.pop("n_bits", self.n_bits_act or self.n_bits),
            method=over.pop("method", self.act_method or self.method),
            scale_domain=self.scale_domain)
        range_cfg = RangeEstimatorConfig(
            method=over.pop("range_method", self.act_range_method),
            momentum=self.act_momentum,
            opt_method=over.pop("opt_method", self.act_range_opt),
            num_candidates=self.act_num_candidates)
        return QuantSiteConfig(kind="act", spec=spec, range_cfg=range_cfg,
                               **over)


class QuantConfigBuilder:
    """Collects site declarations from a model definition."""

    def __init__(self, defaults: QuantDefaults):
        self.defaults = defaults
        self._sites = []

    def weight(self, name: str, **over) -> str:
        self._sites.append((name, self.defaults.weight_site(**over)))
        return name

    def act(self, name: str, **over) -> str:
        self._sites.append((name, self.defaults.act_site(**over)))
        return name

    def build(self) -> QuantModelConfig:
        names = [n for n, _ in self._sites]
        assert len(names) == len(set(names)), "duplicate quant site names"
        return QuantModelConfig(tuple(self._sites))


# ---------------------------------------------------------------------------
# quant_dict value language (utils/per_embd_quant_utils.py:7-34)
# ---------------------------------------------------------------------------


def parse_quant_dict_value(value) -> Optional[Dict]:
    """Translate one ``quant_dict`` value into QuantSiteConfig field changes."""
    if value is None:
        return None
    if isinstance(value, int):
        return {"__n_bits__": value}
    if value == "fp32":
        return {"enabled": False}
    if value == "per_embd":
        return {"axis": 2, "n_groups": None}
    if isinstance(value, str) and value.startswith("ngp"):
        return {"axis": 2, "n_groups": int(value[3:]), "permute": True}
    if isinstance(value, str) and value.startswith("ng"):
        return {"axis": 2, "n_groups": int(value[2:]), "permute": False}
    raise NotImplementedError(f'Unknown value "{value}" in quant_dict')


def _apply_value(cfg: QuantModelConfig, site: str, value) -> QuantModelConfig:
    changes = parse_quant_dict_value(value)
    if changes is None or site not in cfg:
        return cfg
    if "__n_bits__" in changes:
        site_cfg = cfg[site]
        new_spec = dataclasses.replace(site_cfg.spec,
                                       n_bits=changes.pop("__n_bits__"))
        changes["spec"] = new_spec
    return cfg.replace_site(site, **changes)


def apply_quant_dict(cfg: QuantModelConfig, quant_dict: Mapping,
                     site_map: Mapping[str, Tuple[str, ...]]) -> QuantModelConfig:
    """Apply a reference-style ``quant_dict`` to a config tree.

    ``site_map`` maps each quant_dict key (e.g. ``'y'``, ``'s3'``, ``'Et'``,
    ``'L'``) to the tuple of site names it addresses; model families provide
    their own maps (for BERT: models/bert.py, mirroring main.py:443-498).
    """
    for key, value in quant_dict.items():
        if key not in site_map:
            raise KeyError(f"unknown quant_dict key {key!r}")
        for site in site_map[key]:
            cfg = _apply_value(cfg, site, value)
    return cfg
