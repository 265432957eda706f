from transformer_quantization_tpu.serving.engine import (
    Metrics,
    ServeConfig,
    ServingEngine,
)
from transformer_quantization_tpu.serving.export import (  # noqa: F401
    ExportedModel,
    is_export,
    save_export,
)
