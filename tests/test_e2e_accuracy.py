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


def test_amp_qat_trains(tmp_path):
    """--amp (bf16 matmuls/activations, f32 master weights + range math +
    loss + optimizer — the reference's --amp autocast, TPU-native form)
    fits synthetic data in estimate-ranges-train mode."""
    score = cli.main(["train-quantized", "--task", "rte", "--synthetic-data",
                      "--tiny-model", "--max-seq-length", "32",
                      "--seed", "1000", "--num-epochs", "6",
                      "--batch-size", "16", "--learning-rate", "3e-4",
                      "--weight-quant-method", "current_minmax",
                      "--num-est-batches", "2",
                      "--est-ranges-batch-size", "8", "--amp"])
    assert score > 0.75, score


def test_amp_master_state_stays_f32():
    """One AMP QAT step: params/ranges/loss remain float32 leaves."""
    import jax
    import jax.numpy as jnp
    from transformer_quantization_tpu.models import bert as B
    from transformer_quantization_tpu.training import qat as QAT
    import optax

    from transformer_quantization_tpu.quant.manager import init_weight_qstate
    from transformer_quantization_tpu.quant.qconfig import QuantDefaults

    cfg = B.BertConfig(vocab_size=128, hidden_size=32,
                       num_hidden_layers=1, num_attention_heads=2,
                       intermediate_size=64, max_position_embeddings=64)
    params = B.init_bert_params(jax.random.PRNGKey(0), cfg)
    qcfg = B.declare_bert_sites(QuantDefaults(), cfg)
    qstate = init_weight_qstate(qcfg, B.bert_weight_site_tensors(params))

    def apply_fn(p, b, qcfg=None, qstate=None, mode=None, train=False,
                 dropout_rng=None, compute_dtype=None):
        return B.bert_apply(p, b, cfg, qcfg, qstate, mode, train=train,
                            dropout_rng=dropout_rng,
                            compute_dtype=compute_dtype)

    qat_cfg = QAT.QATConfig(compute_dtype="bfloat16")
    tx = optax.adamw(1e-4)
    step = QAT.make_qat_train_step(apply_fn, qcfg, qat_cfg, tx, donate=False)
    p, learnable, rest, opt = QAT.init_qat_state(qcfg, qat_cfg, params,
                                                 qstate, tx)
    rng = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(rng.randint(0, 128, (4, 16)), jnp.int32),
        "attention_mask": jnp.ones((4, 16), jnp.float32),
        "token_type_ids": jnp.zeros((4, 16), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 2, (4,)), jnp.int32),
    }
    out = step(p, learnable, rest, opt, batch, jax.random.PRNGKey(0))
    new_params, loss = out[0], out[-1]
    assert loss.dtype == jnp.float32 and np.isfinite(float(loss))
    for leaf in jax.tree.leaves(new_params):
        assert leaf.dtype == jnp.float32, leaf.dtype


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


def test_qat_pipeline_parallel_finetune(tmp_path):
    """QAT fine-tune THROUGH the GPipe pipeline (dp=4 x pp=2 on the
    virtual mesh) reaches the same quality as single-device QAT — the
    pipeline's gradients genuinely train, not just compile."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
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
                      "--est-ranges-batch-size", "8",
                      "--pp-stages", "2", "--pp-microbatches", "2"])
    assert score >= fp32 - 0.1, (fp32, score)


def test_qat_int8_forward_finetune(tmp_path):
    """Learn-ranges QAT on the int8-MXU forward (--int8-qat-forward)
    trains as well as the float fake-quant forward: same workflow as
    test_qat_learn_ranges_finetune, scored against the fp32 start."""
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
                      "--int8-qat-forward",
                      "--hidden-dropout", "0.0", "--attn-dropout", "0.0",
                      "--range-learning-rate", "1e-5",
                      "--num-est-batches", "2",
                      "--est-ranges-batch-size", "8"])
    assert score >= fp32 - 0.1, (fp32, score)
