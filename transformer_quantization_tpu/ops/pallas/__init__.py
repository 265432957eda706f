from transformer_quantization_tpu.ops.pallas.int_matmul import (
    fused_int8_linear,
    pallas_available,
)
