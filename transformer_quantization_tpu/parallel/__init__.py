from transformer_quantization_tpu.parallel.mesh import (
    make_mesh,
    bert_param_pspecs,
    batch_pspec,
    shard_params,
    shard_batch,
)
