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


def test_qat_estimate_ranges_trains_from_scratch(tmp_path):
    """train-quantized in estimate-ranges-train mode fits synthetic data
    from scratch (qat_utils.py:30-41 semantics; ranges track the
    training activations each step)."""
    score = cli.main(["train-quantized", "--task", "rte", "--synthetic-data",
                      "--tiny-model", "--max-seq-length", "32",
                      "--seed", "1000", "--num-epochs", "6",
                      "--batch-size", "16", "--learning-rate", "3e-4",
                      "--weight-quant-method", "current_minmax",
                      "--num-est-batches", "2",
                      "--est-ranges-batch-size", "8"])
    assert score > 0.75, score


def test_qat_learn_ranges_finetune(tmp_path):
    """The reference QAT workflow (README.md:187-200): start from a
    TRAINED fp32 checkpoint, then fine-tune with learnable ranges.
    (From a random-init model, learned ranges pin activations to the
    random net's scale and block fitting — the reference never does
    that either.)"""
    out_dir = str(tmp_path / "run")
    base = ["--task", "rte", "--synthetic-data", "--tiny-model",
            "--max-seq-length", "32", "--seed", "1000"]
    fp32 = cli.main(["train-baseline", *base, "--num-epochs", "6",
                     "--batch-size", "16", "--learning-rate", "3e-4",
                     "--output-dir", out_dir])
    assert fp32 > 0.8, fp32
    score = cli.main(["train-quantized", *base,
                      "--model-path", f"{out_dir}/checkpoint_rte",
                      "--num-epochs", "2", "--batch-size", "16",
                      "--learning-rate", "5e-5", "--learn-ranges",
                      "--range-learning-rate", "1e-5",
                      "--num-est-batches", "2",
                      "--est-ranges-batch-size", "8"])
    assert score >= fp32 - 0.1, (fp32, score)
