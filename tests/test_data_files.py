"""File-based GLUE ingestion (utils/glue.py load_task_data data_dir path):
JSONL and TSV layouts matching the official GLUE downloads — the offline
alternative to an HF datasets cache."""

import json
import os

import numpy as np

from transformer_quantization_tpu.utils.glue import TASKS, load_task_data


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _write_tsv(path, rows, keys):
    with open(path, "w") as f:
        f.write("\t".join(keys) + "\n")
        for r in rows:
            f.write("\t".join(str(r[k]) for k in keys) + "\n")


def test_jsonl_task_dir_layout(tmp_path):
    task = TASKS["rte"]
    d = tmp_path / "glue" / "rte"
    os.makedirs(d)
    rows = [{"sentence1": f"premise {i}", "sentence2": f"hyp {i}",
             "label": i % 2} for i in range(6)]
    _write_jsonl(d / "train.jsonl", rows)
    _write_jsonl(d / "validation.jsonl", rows[:3])
    splits = load_task_data(task, data_dir=str(tmp_path / "glue"))
    assert len(splits["train"]) == 6
    assert len(splits["validation"]) == 3
    assert splits["train"][1]["label"] == 1
    assert splits["train"][2]["sentence1"] == "premise 2"


def test_tsv_flat_layout_and_dev_alias(tmp_path):
    task = TASKS["mrpc"]
    rows = [{"sentence1": f"a {i}", "sentence2": f"b {i}", "label": i % 2}
            for i in range(4)]
    keys = ["sentence1", "sentence2", "label"]
    _write_tsv(tmp_path / "train.tsv", rows, keys)
    _write_tsv(tmp_path / "dev.tsv", rows[:2], keys)  # GLUE names it dev
    splits = load_task_data(task, data_dir=str(tmp_path))
    assert len(splits["train"]) == 4
    assert len(splits["validation"]) == 2
    assert splits["validation"][0]["label"] == 0


def test_stsb_regression_labels_and_mnli_mismatched(tmp_path):
    task = TASKS["stsb"]
    d = tmp_path / "stsb"
    os.makedirs(d)
    rows = [{"sentence1": "x", "sentence2": "y", "label": 2.5}]
    _write_jsonl(d / "train.jsonl", rows)
    _write_jsonl(d / "validation.jsonl", rows)
    splits = load_task_data(task, data_dir=str(tmp_path))
    assert isinstance(splits["train"][0]["label"], float)

    m = TASKS["mnli"]
    dm = tmp_path / "mnli"
    os.makedirs(dm)
    mrows = [{"premise": "p", "hypothesis": "h", "label": 2}]
    _write_jsonl(dm / "train.jsonl", mrows)
    _write_jsonl(dm / "dev_matched.jsonl", mrows)
    _write_jsonl(dm / "dev_mismatched.jsonl", mrows * 2)
    ms = load_task_data(m, data_dir=str(tmp_path))
    assert len(ms["validation_mismatched"]) == 2


def test_missing_files_falls_back_to_synthetic(tmp_path):
    task = TASKS["rte"]
    splits = load_task_data(task, data_dir=str(tmp_path),
                            synthetic_sizes=(8, 4))
    assert len(splits["train"]) == 8  # synthetic fallback


def test_cli_eval_from_data_dir(tmp_path):
    """validate-baseline consumes --data-dir files end to end."""
    from transformer_quantization_tpu import cli

    d = tmp_path / "rte"
    os.makedirs(d)
    rng = np.random.RandomState(0)
    rows = [{"sentence1": f"w{rng.randint(100)} " * 3,
             "sentence2": f"v{rng.randint(100)} " * 2,
             "label": int(i % 2)} for i in range(8)]
    _write_jsonl(d / "train.jsonl", rows)
    _write_jsonl(d / "validation.jsonl", rows[:4])
    score = cli.main(["validate-baseline", "--task", "rte", "--tiny-model",
                      "--max-seq-length", "16", "--data-dir",
                      str(tmp_path), "--seed", "1000"])
    assert 0.0 <= score <= 1.0
