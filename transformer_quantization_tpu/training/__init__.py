from transformer_quantization_tpu.training.calibration import (
    calibrate_model,
    prepare_quantized_model,
)
