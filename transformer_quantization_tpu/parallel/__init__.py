from transformer_quantization_tpu.parallel.mesh import (
    make_mesh,
    bert_param_pspecs,
    batch_pspec,
    shard_params,
    shard_batch,
)
from transformer_quantization_tpu.parallel.pipeline import (  # noqa: F401
    can_pipeline,
    pipeline_layer_stack,
    pipeline_shared_stack,
)
