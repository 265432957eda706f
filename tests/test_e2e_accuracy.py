"""End-to-end: FP32 training learns synthetic GLUE; W8A8 PTQ keeps the
accuracy (the SURVEY.md §4d score-preservation check, offline form)."""

import numpy as np
import pytest

from transformer_quantization_tpu import cli


@pytest.mark.parametrize("quant_args,max_drop", [
    ([], 0.10),                                     # default W8A8 recipe
    (["--quant-dict", "{'y': 16, 'h': 16, 'x': 16}"], 0.10),  # mixed W8A{8,16}
    (["--n-bits", "4", "--per-channel"], 0.25),     # W4 per-channel
])
def test_train_then_quantize_preserves_accuracy(tmp_path, quant_args,
                                                max_drop):
    out_dir = str(tmp_path / "run")
    base = ["--task", "rte", "--synthetic-data", "--tiny-model",
            "--max-seq-length", "32", "--seed", "1000"]
    fp32 = cli.main(["train-baseline", *base,
                     "--num-epochs", "6", "--batch-size", "16",
                     "--learning-rate", "3e-4",
                     "--output-dir", out_dir])
    assert fp32 > 0.8, f"fp32 training failed to fit synthetic data: {fp32}"

    q = cli.main(["validate-quantized", *base,
                  "--model-path", f"{out_dir}/checkpoint_rte",
                  "--num-est-batches", "4", "--est-ranges-batch-size", "8",
                  *quant_args])
    assert q >= fp32 - max_drop, (fp32, q)
