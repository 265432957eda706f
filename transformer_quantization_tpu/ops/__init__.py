from transformer_quantization_tpu.ops.layers import (
    quant_linear,
    quant_layernorm,
    quant_embedding,
    ACTIVATIONS,
)
