from transformer_quantization_tpu.serving.engine import (
    Metrics,
    ServeConfig,
    ServingEngine,
)
