from transformer_quantization_tpu.utils.glue import (
    GlueTask,
    TASKS,
    compute_metrics,
    load_task_data,
)
from transformer_quantization_tpu.utils.misc import (
    DotDict,
    Stopwatch,
    seed_all,
    count_params,
    count_embedding_params,
)
