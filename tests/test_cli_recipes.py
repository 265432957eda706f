"""CLI recipe coverage: the reference README's flag combinations that
aren't exercised by the other e2e tests (README.md:148-200)."""

import pytest

from transformer_quantization_tpu import cli

BASE = ["--task", "rte", "--synthetic-data", "--num-val-samples", "16",
        "--eval-batch-size", "8", "--tiny-model", "--num-est-batches", "1"]


def _run(*extra):
    return cli.main(["validate-quantized", *BASE, *extra])


def test_w8a8_reference_recipe():
    """README.md:150-156: MSE/golden weights, current-minmax acts,
    1 est batch of size 1, no padding in range estimation."""
    s = _run("--qmethod", "symmetric_uniform",
             "--qmethod-act", "asymmetric_uniform",
             "--weight-quant-method", "MSE",
             "--weight-opt-method", "golden_section",
             "--act-quant-method", "current_minmax",
             "--est-ranges-batch-size", "1", "--est-ranges-no-pad")
    assert 0.0 <= s <= 1.0


def test_cross_entropy_layer():
    """--cross-entropy-layer installs the CE estimator on the logits site
    (utils/utils.py:53-64)."""
    s = _run("--cross-entropy-layer", "classifier.out",
             "--act-quant-method", "current_minmax")
    assert 0.0 <= s <= 1.0


def test_mse_logits_quant_setup():
    s = _run("--quant-setup", "MSE_logits")
    assert 0.0 <= s <= 1.0


def test_peg_shared_permutation():
    """README.md:168-173 + --per-groups-permute-shared-h
    (main.py:539-557)."""
    s = _run("--quant-dict", "{'y': 'ngp4', 'h': 'ngp4', 'x': 'ngp4'}",
             "--per-groups-permute-shared-h")
    assert 0.0 <= s <= 1.0


def test_w2_embeddings_et():
    """README.md:200: 2-bit embeddings via {'Et': 2} switch the word-emb
    estimator to MSE/golden-section."""
    s = _run("--quant-dict", "{'Et': 2}")
    assert 0.0 <= s <= 1.0


def test_mixed_precision_16bit_sites():
    s = _run("--quant-dict", "{'y': 16, 'h': 16, 'x': 16, 's': 16}")
    assert 0.0 <= s <= 1.0


def test_adaround_small():
    """W4 AdaRound on two layers (README.md:176-183, tiny budget)."""
    s = _run("--n-bits", "4", "--adaround", "L0.attn.q",
             "--adaround", "L0.ffn.inter",
             "--adaround-iters", "30", "--adaround-num-samples", "16",
             "--adaround-init", "mse", "--batch-size", "8")
    assert 0.0 <= s <= 1.0


def test_dynamic_per_token():
    s = _run("--per-token", "--dynamic")
    assert 0.0 <= s <= 1.0


def test_no_act_quant_weight_only():
    s = _run("--no-act-quant")
    assert 0.0 <= s <= 1.0


def test_percentile_ranges():
    s = _run("--act-quant-method", "running_minmax", "--percentile", "99.9",
             "--num-est-batches", "2")
    assert 0.0 <= s <= 1.0


def test_per_token_forces_dynamic(caplog):
    """--per-token without --dynamic forces dynamic mode
    (transformer_click_options.py:441-443)."""
    import logging

    with caplog.at_level(logging.INFO, logger="tq_tpu"):
        s = _run("--per-token")
    assert 0.0 <= s <= 1.0
    assert any("forces --dynamic" in r.message for r in caplog.records)


def test_adaround_multi_eval_protocol(caplog):
    """validate-quantized --adaround runs the multi-eval protocol
    (main.py:666-730): FP-acts score + batch sizes {1,4,16}, report max."""
    import logging

    with caplog.at_level(logging.INFO):
        s = _run("--adaround", "L0.attn.q", "--adaround-iters", "10",
                 "--adaround-num-samples", "8", "--batch-size", "8")
    assert 0.0 <= s <= 1.0
    msgs = [r.getMessage() for r in caplog.records]
    assert any("Score (FP32 acts)" in m for m in msgs)
    for bs in (1, 4, 16):
        assert any(f"Score (bs={bs})" in m for m in msgs)


def test_train_progress_options(tmp_path):
    """Mid-train eval/save cadence + TB train logging + residual
    histograms (reference transformer_click_options.py:288-400)."""
    import os

    out = str(tmp_path / "out")
    tb = str(tmp_path / "tb")
    s = cli.main([
        "train-quantized", "--task", "rte", "--synthetic-data",
        "--tiny-model", "--num-train-samples", "32",
        "--num-val-samples", "8", "--batch-size", "8",
        "--eval-batch-size", "8", "--num-epochs", "1",
        "--num-est-batches", "1", "--log-every", "2",
        "--eval-every", "2", "--save-every", "3",
        "--weight-quant-method", "current_minmax",
        "--output-dir", out, "--tb-logging-dir", tb,
        "--tb-train-histograms"])
    assert 0.0 <= s <= 1.0
    assert os.path.isdir(os.path.join(out, "checkpoint_rte_step3"))
    tb_task = os.path.join(tb, "rte")
    assert os.path.isdir(tb_task) and os.listdir(tb_task)


def test_engine_eval_matches_generic():
    """--engine evaluates through the full-handoff int8 engine; the GLUE
    score must match the generic quantized path."""
    common = ["--qmethod", "symmetric_uniform",
              "--weight-quant-method", "current_minmax",
              "--act-quant-method", "current_minmax"]
    s_generic = _run(*common)
    s_engine = _run(*common, "--engine", "auto")
    assert s_engine == s_generic


def test_engine_eval_roberta():
    s = cli.main(["validate-quantized", "--task", "rte", "--synthetic-data",
                  "--num-val-samples", "16", "--eval-batch-size", "8",
                  "--tiny-model", "--num-est-batches", "1",
                  "--model-name", "roberta_base",
                  "--weight-quant-method", "current_minmax",
                  "--engine", "auto"])
    assert 0.0 <= s <= 1.0


def test_engine_runs_16bit_context(caplog):
    """'c': 16 (main.py:463-465) rides the engine: the context site
    leaves the payload protocol and travels as a float value edge into
    the attn_out matmul — no fallback."""
    import logging

    with caplog.at_level(logging.INFO, logger="tq_tpu"):
        s = _run("--quant-dict", "{'c': 16}", "--engine", "auto",
                 "--weight-quant-method", "current_minmax")
    assert 0.0 <= s <= 1.0
    assert not any("engine unavailable" in r.message
                   for r in caplog.records)


def test_engine_runs_16bit_layer_key(caplog):
    """{'L': 16} (every act site in every layer at 16 bits,
    main.py:489-491) rides the engine: q/k/v and all inter-layer edges
    travel as fake-quantized float value edges — no fallback."""
    import logging

    with caplog.at_level(logging.INFO, logger="tq_tpu"):
        s = _run("--quant-dict", "{'L': 16}", "--engine", "auto",
                 "--weight-quant-method", "current_minmax")
    assert 0.0 <= s <= 1.0
    assert not any("engine unavailable" in r.message
                   for r in caplog.records)


def test_engine_falls_back_when_incompatible(caplog):
    """A disabled q-projection output site breaks the attention payload
    protocol entirely; the CLI must fall back to the generic path."""
    import logging

    with caplog.at_level(logging.INFO, logger="tq_tpu"):
        s = _run("--quant-dict", "{'L': 'fp32'}", "--engine", "auto",
                 "--weight-quant-method", "current_minmax")
    assert 0.0 <= s <= 1.0
    assert any("engine unavailable" in r.message for r in caplog.records)


@pytest.mark.parametrize("qd", ["{'s': 16, 'p': 16}",
                                "{'s': 'fp32', 'p': 'fp32'}"],
                         ids=["sp16", "sp_off"])
def test_engine_runs_16bit_scores_probs(caplog, qd):
    """The 's'/'p' 16-bit and 'fp32' quant_dict overrides
    (main.py:461-462) ride the engine: scores-16 only widens the phase-2
    grid (bit-exact); probs-16/off runs f32-dot phase 3."""
    import logging

    with caplog.at_level(logging.INFO, logger="tq_tpu"):
        s_eng = _run("--quant-dict", qd, "--engine", "auto",
                     "--weight-quant-method", "current_minmax",
                     "--seed", "1000")
    assert not any("engine unavailable" in r.message
                   for r in caplog.records)
    assert any("engine active" in r.message for r in caplog.records)
    s_gen = _run("--quant-dict", qd,
                 "--weight-quant-method", "current_minmax",
                 "--seed", "1000")
    assert s_eng == pytest.approx(s_gen, abs=0.13), (s_eng, s_gen)


@pytest.mark.parametrize("qd", ["{'y': 16, 'h': 16, 'x': 16}",
                                "{'y': 'ngp4', 'h': 'ngp4', 'x': 'ngp4'}"],
                         ids=["mixed", "peg"])
def test_engine_runs_accuracy_recipes(caplog, qd):
    """The mixed W8A{8,16} and PEG quant_dicts (README.md:159-173) ride
    the engine — no fallback — and score like the generic path."""
    import logging

    with caplog.at_level(logging.INFO, logger="tq_tpu"):
        s_eng = _run("--quant-dict", qd, "--engine", "auto",
                     "--weight-quant-method", "current_minmax",
                     "--seed", "1000")
    assert not any("engine unavailable" in r.message
                   for r in caplog.records)
    assert any("engine active" in r.message for r in caplog.records)
    s_gen = _run("--quant-dict", qd,
                 "--weight-quant-method", "current_minmax",
                 "--seed", "1000")
    assert s_eng == pytest.approx(s_gen, abs=0.13), (s_eng, s_gen)


def test_dynamic_per_token_int8_engine_matches_simulation():
    """--dynamic --per-token with --engine xla executes the real int8 path
    (packed weights, per-token epilogue scales) and must score exactly like
    the fake-quant simulation on the same data."""
    sim = _run("--per-token", "--dynamic", "--seed", "1000")
    eng = _run("--per-token", "--dynamic", "--engine", "xla",
               "--seed", "1000")
    assert eng == pytest.approx(sim, abs=1e-9), (sim, eng)


def test_dynamic_per_tensor_int8_engine():
    s = _run("--dynamic", "--engine", "xla")
    assert 0.0 <= s <= 1.0


def test_dynamic_int8_engine_mobilebert():
    """Family-generic dynamic int path: MobileBERT (NoNorm, bottlenecks)
    through --dynamic --engine xla matches its own simulation score."""
    extra = ["--model-name", "mobilebert_uncased", "--seed", "1000"]
    sim = _run("--dynamic", *extra)
    eng = _run("--dynamic", "--engine", "xla", *extra)
    assert eng == pytest.approx(sim, abs=1e-9), (sim, eng)


def test_w4a8_packed_int4_engine_matches_simulation():
    """--n-bits 4 --engine now packs 2x int4/byte end-to-end from the CLI;
    the packed path must score exactly like the W4A8 simulation."""
    sim = _run("--n-bits", "4", "--seed", "1000")
    eng = _run("--n-bits", "4", "--engine", "xla", "--seed", "1000")
    assert eng == pytest.approx(sim, abs=1e-9), (sim, eng)


def test_w4a32_weight_only_engine_matches_simulation():
    """W4A32 (the paper's AdaRound eval setting, acts FP32): --engine runs
    weight-only real-int execution (packed int4 dequantized on load) and
    must score exactly like the simulation."""
    sim = _run("--n-bits", "4", "--no-act-quant", "--seed", "1000")
    eng = _run("--n-bits", "4", "--no-act-quant", "--engine", "xla",
               "--seed", "1000")
    assert eng == pytest.approx(sim, abs=1e-9), (sim, eng)


def test_stsb_regression_clamp_and_combined_metric():
    """STS-B: regression head (num_labels=1), [0,5] logits clamp,
    pearson/spearman combined_score (quantized_bert.py:599-600)."""
    s = cli.main(["validate-quantized", "--task", "stsb",
                  "--synthetic-data", "--num-val-samples", "16",
                  "--eval-batch-size", "8", "--tiny-model",
                  "--num-est-batches", "1"])
    assert -1.0 <= s <= 1.0  # correlation-valued


def test_mnli_dual_eval(caplog):
    """MNLI evaluates matched AND mismatched; final = mean of both
    (main.py:748-784). (--num-val-samples short-circuits to one split,
    so run the full tiny synthetic val sets.)"""
    import logging
    with caplog.at_level(logging.INFO, logger="tq_tpu"):
        s = cli.main(["validate-quantized", "--task", "mnli",
                      "--synthetic-data", "--eval-batch-size", "16",
                      "--tiny-model", "--num-est-batches", "1"])
    assert 0.0 <= s <= 1.0
    msgs = " ".join(r.message for r in caplog.records)
    assert "validation_mismatched" in msgs


def test_multi_task_macro_average():
    """--task repeatable: per-task scores + macro-average
    (main.py:193-209)."""
    s = cli.main(["validate-quantized", "--task", "rte", "--task", "wnli",
                  "--synthetic-data", "--num-val-samples", "16",
                  "--eval-batch-size", "8", "--tiny-model",
                  "--num-est-batches", "1"])
    assert 0.0 <= s <= 1.0


def test_named_recipe_presets():
    """--recipe applies the reference README's documented settings to
    defaults only; explicit flags win."""
    from transformer_quantization_tpu.cli import apply_recipe, build_parser

    p = build_parser()
    a = p.parse_args(["validate-quantized", "--recipe", "w4-adaround"])
    apply_recipe(a)
    assert a.n_bits == 4 and a.no_act_quant is True
    assert a.adaround == ["all"] and a.adaround_iters == 10000
    assert a.weight_opt_method == "grid"

    # explicit flag beats the recipe
    a = p.parse_args(["validate-quantized", "--recipe", "w4-adaround",
                      "--adaround-iters", "50"])
    apply_recipe(a)
    assert a.adaround_iters == 50 and a.n_bits == 4

    a = p.parse_args(["train-quantized", "--recipe", "qat-w4a8"])
    apply_recipe(a)
    assert a.learn_ranges is True and a.n_bits == 4 and a.n_bits_act == 8
    assert a.warmup_steps == 186 and a.pad_to_max_length is True

    a = p.parse_args(["validate-quantized", "--recipe", "w8a8-peg"])
    apply_recipe(a)
    assert "ngp6" in a.quant_dict and a.per_groups_permute_shared_h is True

    # the README's STS-B variant of the mixed recipe (README.md:165-166):
    # pooler/classifier 16-bit + MSE estimation of the regression output
    a = p.parse_args(["validate-quantized", "--recipe", "w8a8-mixed",
                      "--task", "stsb"])
    apply_recipe(a)
    assert "'P': 16" in a.quant_dict and "'C': 16" in a.quant_dict
    assert a.quant_setup == "MSE_logits"
    # ... but not for other tasks, and explicit quant_dict wins
    a = p.parse_args(["validate-quantized", "--recipe", "w8a8-mixed",
                      "--task", "rte"])
    apply_recipe(a)
    assert "'P'" not in a.quant_dict and a.quant_setup == "all"
    a = p.parse_args(["validate-quantized", "--recipe", "w8a8-mixed",
                      "--task", "stsb", "--quant-dict", "{'y': 16}"])
    apply_recipe(a)
    assert a.quant_dict == "{'y': 16}" and a.quant_setup == "MSE_logits"


def test_recipe_end_to_end_w8a8():
    score = _run("--recipe", "w8a8", "--seed", "1000")
    assert 0.0 <= score <= 1.0
