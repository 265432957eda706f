from transformer_quantization_tpu.quant.quantizers import (
    QMethod,
    QuantizerSpec,
    QuantParams,
    round_ste,
    floor_ste,
    int_min_max,
    set_quant_range,
    scale_of,
    zero_point_of,
    fake_quant,
    to_int,
    from_int,
    x_min_max_of,
    expand_qparams,
    clamped_fraction,
)
from transformer_quantization_tpu.quant.ranges import (
    RangeMethod,
    OptMethod,
    RangeEstimatorConfig,
    init_range_state,
    update_range_state,
    finalize_ranges,
)
from transformer_quantization_tpu.quant.qconfig import (
    Phase,
    QuantSiteConfig,
    QuantModelConfig,
    apply_quant_dict,
)
from transformer_quantization_tpu.quant.manager import QuantCtx, SiteState
