"""Command-line driver.

Reproduces the reference's four commands and flag surface
(reference: main.py:864-918, utils/{quant,transformer}_click_options.py):

    python -m transformer_quantization_tpu.cli train-baseline    [opts]
    python -m transformer_quantization_tpu.cli train-quantized   [opts]
    python -m transformer_quantization_tpu.cli validate-baseline [opts]
    python -m transformer_quantization_tpu.cli validate-quantized [opts]

Differences by design:
- ``--quant-dict`` is parsed with ``ast.literal_eval`` instead of ``eval``
  (the reference evals arbitrary strings, transformer_click_options.py:436).
- Zero-egress environment: ``--synthetic-data`` (or automatic fallback)
  provides deterministic offline GLUE-shaped data; ``--model-path`` loads a
  local HF checkpoint directory when present, else the model initializes
  from config with random weights.

Outputs match the reference's artifacts: ``config.out``, per-task
``eval_results_<task>.txt``, ``final_score.txt``, and the macro-average
incl./excl. WNLI (main.py:193-209, :736-784).
"""

from __future__ import annotations

import argparse
import ast
import functools
import json
import logging
import os
from typing import Dict, Optional

import numpy as np

logger = logging.getLogger("tq_tpu")
logging.basicConfig(
    level=os.environ.get("LOGLEVEL", "INFO"),
    format="%(asctime)s - %(name)s - %(levelname)s - %(message)s")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="transformer_quantization_tpu")
    sub = p.add_subparsers(dest="command", required=True)

    def add_common(sp):
        g = sp.add_argument_group("base")
        g.add_argument("--seed", type=int, default=1000)
        g.add_argument("--output-dir", default=None)
        g.add_argument("--profile-dir", default=None,
                       help="write a jax.profiler trace of the run here")
        g.add_argument("--tb-logging-dir", default=None,
                       help="TensorBoard events: per-site ranges + scores")
        g = sp.add_argument_group("data")
        g.add_argument("--task", action="append", default=None,
                       help="GLUE task (repeatable) or 'all'")
        g.add_argument("--max-seq-length", type=int, default=128)
        g.add_argument("--pad-to-max-length", dest="pad_to_max_length",
                       action="store_true", default=True)
        g.add_argument("--no-pad-to-max-length", dest="pad_to_max_length",
                       action="store_false")
        g.add_argument("--num-train-samples", type=int, default=None)
        g.add_argument("--num-val-samples", type=int, default=None)
        g.add_argument("--synthetic-data", action="store_true",
                       help="use deterministic offline synthetic data")
        g.add_argument("--data-dir", default=None)
        g = sp.add_argument_group("model")
        g.add_argument("--model-name", default="bert_base_uncased",
                       choices=["bert_base_uncased", "bert_large_uncased",
                                "bert_base_cased", "roberta_base",
                                "distilroberta_base", "mobilebert_uncased",
                                "distilbert_base_uncased", "albert_base_v2",
                                "albert_large_v2", "squeezebert_uncased"])
        g.add_argument("--model-path", default=None,
                       help="local HF checkpoint directory, or (with "
                            "--from-hub) a hub repo id")
        g.add_argument("--from-hub", action="store_true",
                       help="resolve a non-directory --model-path as a "
                            "HuggingFace hub repo id (network fetch; the "
                            "reference's by-name model zoo, "
                            "utils/hf_models.py)")
        g.add_argument("--quant-model-path", default=None,
                       help="framework checkpoint dir (params + calibrated "
                            "quant state); the reference declares this flag "
                            "but never consumes it — here it loads/resumes")
        g.add_argument("--tiny-model", action="store_true",
                       help="debug: 2-layer hidden-64 model")
        g.add_argument("--attn-dropout", type=float, default=None)
        g.add_argument("--hidden-dropout", type=float, default=None)
        g = sp.add_argument_group("training")
        g.add_argument("--learning-rate", type=float, default=5e-5)
        g.add_argument("--batch-size", type=int, default=32)
        g.add_argument("--num-epochs", type=int, default=3)
        g.add_argument("--weight-decay", type=float, default=0.0)
        g.add_argument("--ffn-weight-decay", type=float, default=0.0,
                       help="extra decoupled weight decay on FFN kernels "
                            "(reference --ffn-weight-decay — declared "
                            "there but never consumed; implemented here)")
        g.add_argument("--max-grad-norm", type=float, default=1.0)
        g.add_argument("--warmup-ratio", type=float, default=0.0)
        g.add_argument("--warmup-steps", type=int, default=None,
                       help="absolute LR warmup steps (overrides "
                            "--warmup-ratio; reference --warmup-steps)")
        g.add_argument("--lr-scheduler-type", default="linear",
                       choices=["linear", "cosine", "constant"])
        g.add_argument("--gradient-accumulation-steps", type=int, default=1)
        g.add_argument("--max-steps", type=int, default=None,
                       help="stop after N optimizer steps (HF max_steps); "
                            "the LR schedule still spans num_epochs, so an "
                            "interrupted run resumes exactly")
        g.add_argument("--eval-batch-size", type=int, default=32)
        g.add_argument("--remat", action="store_true",
                       help="rematerialize encoder layers in the backward "
                            "pass (jax.checkpoint): ~1/3 extra FLOPs for "
                            "O(layers) less activation memory, letting "
                            "batch sizes grow past HBM limits")
        g.add_argument("--scan-layers", action="store_true",
                       help="compile the encoder stack as one lax.scan "
                            "iteration (depth-independent compile time; "
                            "identical numerics; auto-disabled when "
                            "per-layer overrides differ)")
        g.add_argument("--amp", action="store_true",
                       help="mixed-precision training: bf16 matmuls/"
                            "activations, f32 master weights, range math, "
                            "statistics, loss, and optimizer (the "
                            "reference's --amp fp16 autocast, "
                            "transformer_click_options.py training group; "
                            "bf16 needs no loss scaling)")
        g = sp.add_argument_group("progress")
        # the reference's progress option group
        # (transformer_click_options.py:288-400)
        g.add_argument("--eval-every", "--eval-steps", dest="eval_every",
                       type=int, default=None,
                       help="mid-train eval on the validation set every N "
                            "optimizer steps (reference --eval-steps)")
        g.add_argument("--eval-strategy", default=None,
                       choices=["no", "steps", "epoch"],
                       help="evaluation frequency level (reference "
                            "--eval-strategy): 'steps' uses --eval-every, "
                            "'epoch' evaluates at each epoch end")
        g.add_argument("--eval-during-training", action="store_true",
                       help="evaluate at each logging step (reference "
                            "--eval-during-training: sets the eval cadence "
                            "to --log-every)")
        g.add_argument("--load-best-model-at-end", action="store_true",
                       help="track the best mid-train eval (at "
                            "--eval-every cadence) and restore it after "
                            "training (HF Trainer semantics)")
        g.add_argument("--metric-for-best-model", default=None)
        g.add_argument("--smaller-is-better", action="store_true",
                       help="best-model metric is minimized (HF "
                            "--greater-is-better inverse)")
        g.add_argument("--save-total-limit", type=int, default=None,
                       help="keep only the N most recent step checkpoints")
        g.add_argument("--run-name", default=None,
                       help="label recorded in config.out")
        g.add_argument("--resume", action="store_true",
                       help="resume an interrupted training run from the "
                            "full train state (model + ranges + optimizer "
                            "+ RNG + step) saved at --save-every cadence "
                            "under --output-dir; data order replays "
                            "deterministically")
        g.add_argument("--save-every", "--save-steps", dest="save_every",
                       type=int, default=None,
                       help="mid-train checkpoint every N optimizer steps "
                            "into --output-dir (reference --save-steps)")
        g.add_argument("--log-every", "--logging-steps", dest="log_every",
                       type=int, default=50,
                       help="loss log/TB-scalar interval in steps "
                            "(reference --logging-steps; the first step is "
                            "always logged, reference --logging-first-step)")
        g.add_argument("--tqdm", action="store_true", default=True,
                       help="progress bar over training batches (reference "
                            "--tqdm/--no-tqdm; falls back to log lines when "
                            "tqdm or a tty is unavailable)")
        g.add_argument("--no-tqdm", dest="tqdm", action="store_false")
        g.add_argument("--tb-train-histograms", action="store_true",
                       help="per-layer residual histograms (per-tensor + "
                            "per-token) before and after training, like "
                            "the reference's tb_utils forward hooks")
        g.add_argument("--pp-stages", type=int, default=1,
                       help="GPipe pipeline-parallel stages for the QAT "
                            "train step: the encoder's layer stack shards "
                            "over a 'pp' mesh axis, activations hop stages "
                            "via ppermute; remaining devices become dp "
                            "(parallel/pipeline.py; needs --learn-ranges "
                            "or fixed ranges — pipeline state is "
                            "read-only)")
        g.add_argument("--pp-microbatches", type=int, default=2,
                       help="microbatches per batch in the GPipe schedule "
                            "(bubble fraction = (S-1)/(S-1+M))")
        g.add_argument("--export-dir", default=None,
                       help="after eval, export the calibrated real-int "
                            "forward as a portable StableHLO artifact with "
                            "a symbolic batch dimension (jax.export; "
                            "serve via serving/server.py --export-dir)")
        g.add_argument("--export-seq-buckets", nargs="+", type=int,
                       default=None,
                       help="sequence buckets to export (default: "
                            "--max-seq-length only)")
        g.add_argument("--export-batch-buckets", nargs="+", type=int,
                       default=None,
                       help="ALSO export the megakernel engine at these "
                            "concrete batch sizes x every seq bucket "
                            "(engine programs are platform-tied; the "
                            "symbolic-batch generic artifact remains the "
                            "portable fallback). Requires an "
                            "engine-compatible quant config.")
        g.add_argument("--tb", action="store_true",
                       help="enable the TensorBoard writer at "
                            "<output-dir>/tb when --tb-logging-dir is not "
                            "given (reference --tb)")
        # drop-in script compatibility: reference flags whose behavior is
        # always-on here (--overwrite-output, --save-model: saving into
        # --output-dir always overwrites; --logging-first-step: step 1 is
        # always logged; --greater-is-better: the default — use
        # --smaller-is-better to flip) or that the reference itself
        # declares but never consumes (--gamma, --margin, --save-attn,
        # transformer_click_options.py). Accepted so reference command
        # lines run unchanged; they change nothing.
        for flag in ("--overwrite-output", "--save-model",
                     "--logging-first-step", "--greater-is-better",
                     "--save-attn",
                     # --line-by-line/--overwrite-cache/--use-fast-
                     # tokenizer: HF dataset/tokenizer cache knobs with no
                     # equivalent here (files are read directly; the
                     # native WordPiece tokenizer is always "fast");
                     # --tb-graph: no torch-style graph object exists
                     # under jit — use --profile-dir (PARITY.md C34)
                     "--line-by-line", "--overwrite-cache",
                     "--use-fast-tokenizer", "--tb-graph"):
            g.add_argument(flag, action="store_true", help=argparse.SUPPRESS)
        for flag in ("--gamma", "--margin"):
            g.add_argument(flag, type=float, default=None,
                           help=argparse.SUPPRESS)
        # --amp-opt-level: apex O-levels; --amp here is bf16 autocast
        # (O1-ish). --cache-dir: HF hub cache, forwarded to --from-hub
        # downloads. --num-workers: the input pipeline is a synchronous
        # numpy feeder (tokenization is native C++); accepted for script
        # compatibility.
        g.add_argument("--amp-opt-level", default=None,
                       help=argparse.SUPPRESS)
        g.add_argument("--cache-dir", default=None,
                       help="HF hub cache directory for --from-hub "
                            "(reference --cache-dir)")
        g.add_argument("--num-workers", type=int, default=0,
                       help=argparse.SUPPRESS)

    def add_quant(sp):
        g = sp.add_argument_group("quantization")
        g.add_argument("--recipe", default=None,
                       choices=["w8a8", "w8a8-mixed", "w8a8-peg",
                                "w4-adaround", "qat-w4a8"],
                       help="apply one of the reference README's documented "
                            "experiment settings (README.md:145-200) to "
                            "every option you left at its default; "
                            "explicit flags take precedence")
        g.add_argument("--qmethod", default="symmetric_uniform",
                       choices=["symmetric_uniform", "asymmetric_uniform"])
        g.add_argument("--qmethod-act", default="asymmetric_uniform",
                       choices=["symmetric_uniform", "asymmetric_uniform"])
        g.add_argument("--n-bits", type=int, default=8)
        g.add_argument("--n-bits-act", type=int, default=8)
        g.add_argument("--per-channel", action="store_true")
        g.add_argument("--percentile", type=float, default=None)
        g.add_argument("--quant-setup", default="all",
                       choices=["all", "FP_logits", "MSE_logits"])
        g.add_argument("--weight-quant-method", default="MSE",
                       choices=["current_minmax", "allminmax",
                                "running_minmax", "MSE", "cross_entropy"])
        g.add_argument("--weight-opt-method", default="golden_section",
                       choices=["grid", "golden_section"])
        g.add_argument("--num-candidates", type=int, default=100)
        g.add_argument("--act-quant-method", default="current_minmax",
                       choices=["current_minmax", "allminmax",
                                "running_minmax", "MSE", "cross_entropy"])
        g.add_argument("--act-opt-method", default="golden_section",
                       choices=["grid", "golden_section"])
        g.add_argument("--act-momentum", type=float, default=0.9)
        g.add_argument("--act-num-candidates", type=int, default=100,
                       help="grid size for MSE act-range search")
        g.add_argument("--no-weight-quant", action="store_true")
        g.add_argument("--no-act-quant", action="store_true")
        g.add_argument("--num-est-batches", type=int, default=1)
        g.add_argument("--est-ranges-batch-size", type=int, default=1)
        g.add_argument("--est-ranges-pad", dest="est_ranges_pad",
                       action="store_true", default=None)
        g.add_argument("--est-ranges-no-pad", dest="est_ranges_pad",
                       action="store_false",
                       help="trim calibration batches to their longest real "
                            "sequence so PAD tokens never enter range "
                            "estimation; default inherits --pad-to-max-length")
        g.add_argument("--cross-entropy-layer", default=None)
        g.add_argument("--quant-dict", default=None,
                       help="python-literal dict, e.g. \"{'y': 16, 'Et': 2}\"")
        g.add_argument("--dynamic", action="store_true")
        g.add_argument("--engine", default="off",
                       choices=["off", "auto", "pallas", "xla"],
                       help="evaluate through the full-handoff int8 "
                            "inference engine (ops/engine.py) when the "
                            "quant config fits; 'auto' picks the Pallas "
                            "kernels on TPU, the XLA path elsewhere")
        g.add_argument("--double", action="store_true",
                       help="run quantizer math in float64")
        g.add_argument("--per-token", action="store_true")
        g.add_argument("--per-embd", action="store_true")
        g.add_argument("--per-groups", type=int, default=None)
        g.add_argument("--per-groups-permute", action="store_true")
        g.add_argument("--per-groups-permute-shared-h", action="store_true")
        g = sp.add_argument_group("qat")
        g.add_argument("--learn-ranges", action="store_true")
        g.add_argument("--int8-qat-forward", nargs="?", const="on",
                       default="auto", choices=["auto", "on", "off"],
                       help="run eligible fake-quant matmuls on the int8 "
                            "MXU during QAT (training/int8_qat.py): values "
                            "exactly the fake-quant composition's, STE/LSQ "
                            "gradients unchanged; needs full-precision "
                            "activations (no --amp). 'auto' (default) "
                            "enables it only where it measured faster — "
                            "learn-ranges QAT (v5e B=32 S=128, dropout-0: "
                            "49.0 -> 44.6 ms/step); fixed-ranges QAT "
                            "measured 5%% SLOWER on int8 (39.6 -> 41.7 — "
                            "the float fake-quant matmuls fuse well and "
                            "the pack/unpack doesn't pay), estimate "
                            "phases neutral, so 'auto' keeps those on "
                            "the float forward. 'on' forces it "
                            "everywhere (bare --int8-qat-forward = 'on', "
                            "round-3/4 behavior)")
        g.add_argument("--range-learning-rate", type=float, default=None,
                       help="separate lr for learned ranges (default: the "
                            "weight lr, like the reference)")
        g.add_argument("--fix-weight-ranges", action="store_true")
        g.add_argument("--fix-act-ranges", action="store_true")
        g = sp.add_argument_group("adaround")
        g.add_argument("--adaround", action="append", default=None,
                       help="layer name or 'all' (repeatable)")
        g.add_argument("--adaround-num-samples", type=int, default=1024)
        g.add_argument("--adaround-init", default="range_estimator",
                       choices=["range_estimator", "mse", "mse_out",
                                "mse_out_asym"])
        g.add_argument("--adaround-mode", default="learned_hard_sigmoid",
                       choices=["learned_sigmoid", "learned_hard_sigmoid",
                                "sigmoid_temp_decay"])
        g.add_argument("--adaround-asym", action="store_true", default=True)
        g.add_argument("--no-adaround-asym", dest="adaround_asym",
                       action="store_false")
        g.add_argument("--adaround-include-act-func", action="store_true",
                       default=True)
        g.add_argument("--no-adaround-include-act-func",
                       dest="adaround_include_act_func", action="store_false")
        g.add_argument("--adaround-lr", type=float, default=1e-3)
        g.add_argument("--adaround-iters", type=int, default=1000)
        g.add_argument("--adaround-weight", type=float, default=0.01)
        g.add_argument("--adaround-annealing", default="20,2")
        g.add_argument("--adaround-decay-type", default="cosine",
                       choices=["linear", "cosine", "sigmoid", "power",
                                "exp", "log"])
        g.add_argument("--adaround-decay-shape", type=float, default=1.0)
        g.add_argument("--adaround-decay-start", type=float, default=0.0)
        g.add_argument("--adaround-warmup", type=float, default=0.2)
        g.add_argument("--adaround-act-quant-mode", "--adaround-act-quant",
                       dest="adaround_act_quant_mode",
                       default="post_adaround",
                       choices=["no_act_quant", "post_adaround"])

    for cmd in ("train-baseline", "validate-baseline"):
        sp = sub.add_parser(cmd)
        add_common(sp)
    for cmd in ("train-quantized", "validate-quantized"):
        sp = sub.add_parser(cmd)
        add_common(sp)
        add_quant(sp)
    return p


def make_quant_defaults(args):
    from transformer_quantization_tpu.quant.qconfig import QuantDefaults
    from transformer_quantization_tpu.quant.quantizers import QMethod
    from transformer_quantization_tpu.quant.ranges import OptMethod, RangeMethod

    return QuantDefaults(
        method=QMethod[args.qmethod],
        act_method=QMethod[args.qmethod_act],
        n_bits=args.n_bits,
        n_bits_act=args.n_bits_act,
        per_channel_weights=args.per_channel,
        percentile=args.percentile,
        weight_range_method=RangeMethod[args.weight_quant_method],
        weight_range_opt=OptMethod[args.weight_opt_method],
        weight_num_candidates=args.num_candidates,
        act_range_method=RangeMethod[args.act_quant_method],
        act_range_opt=OptMethod[args.act_opt_method],
        act_momentum=args.act_momentum,
        act_num_candidates=args.act_num_candidates,
    )


def parse_quant_dict(s: Optional[str]) -> Dict:
    if not s:
        return {}
    d = ast.literal_eval(s)
    if not isinstance(d, dict):
        raise ValueError(f"--quant-dict must be a dict literal, got {s!r}")
    return d


def _load_model(args, num_labels: int = 2):
    import dataclasses

    from transformer_quantization_tpu.models.registry import build_model

    model_path = args.model_path
    if model_path and not os.path.isdir(model_path):
        # by-name hub resolution (reference utils/hf_models.py:52-75),
        # explicit opt-in — primary environments are zero-egress
        from transformer_quantization_tpu.models.hf_loader import (
            resolve_model_dir,
        )

        model_path = resolve_model_dir(
            model_path, allow_hub=bool(getattr(args, "from_hub", False)),
            cache_dir=getattr(args, "cache_dir", None))
        logger.info("resolved hub checkpoint %s -> %s", args.model_path,
                    model_path)
        args.model_path = model_path
    fam, cfg, params = build_model(
        args.model_name, seed=args.seed,
        tiny=getattr(args, "tiny_model", False), num_labels=num_labels,
        model_path=model_path)
    if args.model_path and os.path.exists(
            os.path.join(args.model_path, "config.json")):
        logger.info("Loaded checkpoint from %s", args.model_path)
    else:
        logger.info("No local checkpoint; initialized %s from config",
                    args.model_name)
    if args.hidden_dropout is not None:
        cfg = dataclasses.replace(cfg, hidden_dropout_prob=args.hidden_dropout)
    if args.attn_dropout is not None:
        cfg = dataclasses.replace(
            cfg, attention_probs_dropout_prob=args.attn_dropout)
    return fam, cfg, params


def run_task(args, task, do_train: bool, quantized: bool) -> float:
    import dataclasses as dc

    import jax

    from transformer_quantization_tpu.quant import adaround as AR
    from transformer_quantization_tpu.quant.qconfig import QuantMode, Phase
    from transformer_quantization_tpu.training import adaround_driver as AD
    from transformer_quantization_tpu.training import qat as QAT
    from transformer_quantization_tpu.training import trainer as T
    from transformer_quantization_tpu.training.calibration import (
        prepare_quantized_model,
    )
    from transformer_quantization_tpu.utils import data as D
    from transformer_quantization_tpu.utils import glue as G
    from transformer_quantization_tpu.utils.profiling import PhaseTimer

    timer = PhaseTimer()
    fam, cfg, params = _load_model(args, num_labels=task.num_labels)
    cfg = dc.replace(cfg, num_labels=task.num_labels)
    if not args.model_path:
        params[fam.head_key] = fam.init_head(
            jax.random.PRNGKey(args.seed + 1), cfg)

    if getattr(args, "double", False):
        jax.config.update("jax_enable_x64", True)
        import jax.numpy as jnp

        # run the whole model (and hence all quantizer math) in float64,
        # like the reference's model.double() (main.py --double)
        params = jax.tree.map(
            lambda x: x.astype(jnp.float64)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)

    splits = G.load_task_data(task, data_dir=args.data_dir,
                              synthetic=args.synthetic_data, seed=args.seed)
    tok = D.load_tokenizer(args.model_path, cfg.vocab_size)
    train_arr = D.encode_examples(tok, task, splits["train"],
                                  args.max_seq_length)
    val_arr = D.encode_examples(tok, task, splits["validation"],
                                args.max_seq_length)
    if args.num_train_samples:
        train_arr = {k: v[:args.num_train_samples]
                     for k, v in train_arr.items()}

    apply_fn = functools.partial(fam.apply, cfg=cfg)
    if getattr(args, "scan_layers", False):
        # eval/calibration forwards benefit from the depth-independent
        # compile too; contexts scan can't serve (capture, int payload
        # plans, per-layer overrides) auto-fall back to the loop
        apply_fn = functools.partial(apply_fn, scan_layers=True)
    pp_mesh = None
    if getattr(args, "pp_stages", 1) > 1:
        from transformer_quantization_tpu.parallel.mesh import make_mesh

        n_dev = len(jax.devices())
        if n_dev % args.pp_stages:
            raise SystemExit(f"--pp-stages {args.pp_stages} does not "
                             f"divide the {n_dev} available devices")
        pp_mesh = make_mesh(dp=n_dev // args.pp_stages, pp=args.pp_stages)
        logger.info("pipeline mesh: dp=%d x pp=%d, %d microbatches",
                    n_dev // args.pp_stages, args.pp_stages,
                    args.pp_microbatches)
    weight_quant = act_quant = False
    qcfg = qstate = None
    eval_mode = T.FP32_MODE

    if quantized:
        weight_quant = not args.no_weight_quant
        act_quant = not args.no_act_quant
        quant_dict = parse_quant_dict(args.quant_dict)
        defaults = make_quant_defaults(args)
        qcfg = fam.declare_sites(defaults, cfg,
                                 quant_setup=args.quant_setup,
                                 quant_dict=quant_dict)
        qcfg = fam.apply_peg(
            qcfg, cfg.num_hidden_layers, per_token=args.per_token,
            per_embd=args.per_embd, per_groups=args.per_groups,
            permute=args.per_groups_permute
            or args.per_groups_permute_shared_h)
        qcfg = fam.apply_quant_dict(qcfg, quant_dict,
                                    cfg.num_hidden_layers)

        est_batches = list(D.batch_iterator(
            train_arr, args.est_ranges_batch_size, drop_last=True))
        est_pad = (args.est_ranges_pad if args.est_ranges_pad is not None
                   else args.pad_to_max_length)
        for i, b in enumerate(est_batches):
            b.pop("example_mask", None)
            b.pop("labels", None)
            if not est_pad:
                est_batches[i] = D.trim_to_real_length(b)
        from transformer_quantization_tpu.utils import checkpoint as CK
        from transformer_quantization_tpu.quant.qconfig import (
            Phase as _Phase, QuantMode as _QM)

        if CK.is_checkpoint(args.quant_model_path):
            # resume a calibrated quant state (reference's --quant-model-path
            # is declared but dead, transformer_click_options.py:143-147)
            ck = CK.load_checkpoint(args.quant_model_path)
            params = ck["params"]
            qstate = ck.get("qstate", {})
            eval_mode = _QM(weight_quant=weight_quant, act_quant=act_quant,
                            weight_phase=_Phase.fix,
                            act_phase=(_Phase.estimate if args.dynamic
                                       else _Phase.fix))
            logger.info("Loaded quantized checkpoint from %s",
                        args.quant_model_path)
        else:
            shared = (fam.shared_perm_groups(cfg.num_hidden_layers)
                      if args.per_groups_permute_shared_h
                      and fam.shared_perm_groups else None)
            with timer.phase("calibration"):
                qstate, eval_mode = prepare_quantized_model(
                    apply_fn, params, qcfg,
                    est_batches[:max(args.num_est_batches, 1)],
                    weight_tensors=fam.weight_site_tensors(params),
                    num_batches=args.num_est_batches, act_quant=act_quant,
                    weight_quant=weight_quant, dynamic=args.dynamic,
                    cross_entropy_layer=args.cross_entropy_layer,
                    permute_batches=est_batches[:10], shared_groups=shared)

        # AdaRound (validate path only, like main.py:566-589)
        ar_cfg = None
        if not do_train and weight_quant and args.adaround:
            ann = tuple(float(x) for x in args.adaround_annealing.split(","))
            ar_cfg = AR.AdaRoundConfig(
                layers=tuple(args.adaround),
                num_samples=args.adaround_num_samples,
                init=AR.AdaRoundInitMode[args.adaround_init],
                round_mode=__import__(
                    "transformer_quantization_tpu.quant.quantizers",
                    fromlist=["AdaRoundMode"]).AdaRoundMode[
                        args.adaround_mode],
                asym=args.adaround_asym,
                include_act_func=args.adaround_include_act_func,
                lr=args.adaround_lr, iters=args.adaround_iters,
                weight=args.adaround_weight, annealing=ann,
                decay_type=AR.AdaRoundTempDecayType[args.adaround_decay_type],
                decay_shape=args.adaround_decay_shape,
                decay_start=args.adaround_decay_start,
                warmup=args.adaround_warmup,
                act_quant_mode=AR.AdaRoundActQuantMode[
                    args.adaround_act_quant_mode],
                batch_size=args.batch_size)
            data_batches = list(D.batch_iterator(train_arr, args.batch_size,
                                                 drop_last=True))
            with timer.phase("adaround"):
                qstate = AD.apply_adaround_to_model(
                    apply_fn, params, qcfg, qstate,
                    fam.adaround_specs(params, cfg), data_batches, ar_cfg,
                    batch_size=args.batch_size,
                    act_quant=act_quant and ar_cfg.act_quant_mode
                    == AR.AdaRoundActQuantMode.post_adaround,
                    range_est_batches=est_batches,
                    num_est_batches=args.num_est_batches,
                    cross_entropy_layer=args.cross_entropy_layer,
                    seed=args.seed)

    tb_writer = None
    tb_dir = args.tb_logging_dir
    if tb_dir is None and getattr(args, "tb", False):
        # reference --tb without an explicit dir: default under output-dir
        tb_dir = os.path.join(args.output_dir or ".", "tb")
    if tb_dir:
        from transformer_quantization_tpu.utils.telemetry import TBWriter

        tb_writer = TBWriter(os.path.join(tb_dir, task.name))

    if do_train:
        # evaluation frequency levels (reference --eval-strategy /
        # --eval-during-training, transformer_click_options.py:288-312)
        eval_every = args.eval_every
        if args.eval_during_training and eval_every is None:
            eval_every = args.log_every
        if args.eval_strategy == "no":
            eval_every = None
        eval_at_epoch_end = args.eval_strategy == "epoch"
        tcfg = T.TrainConfig(learning_rate=args.learning_rate,
                             num_epochs=args.num_epochs,
                             batch_size=args.batch_size,
                             weight_decay=args.weight_decay,
                             max_grad_norm=args.max_grad_norm,
                             warmup_ratio=args.warmup_ratio, seed=args.seed,
                             grad_accum_steps=(
                                 args.gradient_accumulation_steps),
                             log_every=args.log_every,
                             eval_every=eval_every,
                             eval_at_epoch_end=eval_at_epoch_end,
                             progress_bar=args.tqdm,
                             save_every=args.save_every,
                             eval_batch_size=args.eval_batch_size,
                             max_steps=args.max_steps,
                             warmup_steps=args.warmup_steps,
                             lr_scheduler_type=args.lr_scheduler_type,
                             ffn_weight_decay=args.ffn_weight_decay,
                             load_best_model_at_end=(
                                 args.load_best_model_at_end),
                             metric_for_best_model=args.metric_for_best_model,
                             greater_is_better=not args.smaller_is_better)
        amp_dtype = "bfloat16" if args.amp else None
        qat_cfg = QAT.QATConfig(compute_dtype=amp_dtype, remat=args.remat,
                                scan_layers=args.scan_layers,
                                pp_mesh=pp_mesh,
                                pp_microbatches=args.pp_microbatches)
        if quantized:
            qat_cfg = QAT.QATConfig(
                learn_ranges=args.learn_ranges,
                fix_weight_ranges=args.fix_weight_ranges,
                fix_act_ranges=args.fix_act_ranges,
                learning_rate=args.learning_rate,
                range_learning_rate=args.range_learning_rate,
                compute_dtype=amp_dtype, remat=args.remat,
                scan_layers=args.scan_layers,
                pp_mesh=pp_mesh,
                pp_microbatches=args.pp_microbatches)
            i8fwd = getattr(args, "int8_qat_forward", "auto") or "auto"
            if i8fwd == "off":
                want_i8 = False
            elif i8fwd == "on":
                want_i8 = True
            else:
                # 'auto': only the phase where it measured a win
                # (learn-ranges; see --help for the qat_bench table)
                want_i8 = bool(args.learn_ranges)
            if want_i8:
                import inspect

                if amp_dtype is not None:
                    (logger.warning if i8fwd == "on" else logger.info)(
                        "--int8-qat-forward needs full-precision "
                        "activations (bf16 rounds them off-grid); "
                        "IGNORED with --amp")
                elif "int8_qat_sites" not in inspect.signature(
                        fam.apply).parameters:
                    logger.info("--int8-qat-forward: family %s does not "
                                "plumb int8_qat_sites yet; using the "
                                "float fake-quant forward", fam.name)
                else:
                    sites = QAT.int8_forward_sites(qcfg, qstate)
                    n_real = sum(1 for s in sites
                                 if not s.startswith("L."))
                    if not n_real:
                        logger.warning("--int8-qat-forward: no eligible "
                                       "matmul sites in this config; "
                                       "using the float forward")
                    else:
                        qat_cfg = dc.replace(qat_cfg, int8_sites=sites)
                        logger.info("int8-MXU QAT forward active for %d "
                                    "matmul sites", n_real)
                        if (cfg.hidden_dropout_prob or 0) > 0:
                            logger.warning(
                                "training hidden dropout %.2f > 0 "
                                "disables the int8 forward at train time "
                                "(off-grid inputs); pass "
                                "--hidden-dropout 0.0 like the reference "
                                "QAT recipe to keep it",
                                cfg.hidden_dropout_prob)

        save_fn = None
        if args.output_dir and args.save_every:
            from transformer_quantization_tpu.utils import checkpoint as CK

            # seed with checkpoints already on disk (a resumed run must
            # keep pruning the prior process's checkpoints too)
            import re as _re

            _pat = _re.compile(
                _re.escape(f"checkpoint_{task.name}_step") + r"(\d+)$")
            saved_steps = sorted(
                int(m.group(1)) for d in os.listdir(args.output_dir)
                if (m := _pat.match(d))
            ) if os.path.isdir(args.output_dir) else []

            def save_fn(p, qs, step):
                CK.save_checkpoint(
                    os.path.join(args.output_dir,
                                 f"checkpoint_{task.name}_step{step}"),
                    params=p, family=fam.name, cfg=cfg,
                    qstate=qs if quantized else None,
                    extra={"command": args.command, "step": step})
                saved_steps.append(step)
                # HF --save-total-limit: prune oldest step checkpoints
                while (args.save_total_limit
                       and len(saved_steps) > args.save_total_limit):
                    import shutil
                    old = saved_steps.pop(0)
                    shutil.rmtree(
                        os.path.join(args.output_dir,
                                     f"checkpoint_{task.name}_step{old}"),
                        ignore_errors=True)

        def _residual_hists(step):
            if not (args.tb_train_histograms and tb_writer is not None):
                return
            from transformer_quantization_tpu.utils.telemetry import (
                write_residual_histograms,
            )

            hb = next(iter(D.batch_iterator(val_arr, args.eval_batch_size)))
            hb.pop("labels", None)
            hb.pop("example_mask", None)
            write_residual_histograms(
                apply_fn, params, qcfg, qstate, hb, tb_writer, step=step,
                mode=eval_mode if quantized else T.FP32_MODE)

        if quantized:
            _residual_hists(0)
        train_state_path = None
        if args.output_dir and args.save_every:
            train_state_path = os.path.join(args.output_dir,
                                            f"train_state_{task.name}")
        with timer.phase("train"):
            params, qstate = T.train(apply_fn, params, task, train_arr, tcfg,
                                     qcfg=qcfg, qstate=qstate,
                                     qat_cfg=qat_cfg, log_fn=logger.info,
                                     eval_arrays=val_arr,
                                     tb_writer=tb_writer, save_fn=save_fn,
                                     train_state_path=train_state_path,
                                     resume=args.resume)
        if quantized:
            # fix ranges after training for final eval (main.py:659-663)
            eval_mode = QuantMode(weight_quant=weight_quant,
                                  act_quant=act_quant,
                                  weight_phase=Phase.fix, act_phase=Phase.fix)
            _residual_hists(1)

    if args.output_dir:
        # persist the model (+ calibrated quant state) like Trainer.save_model
        # + state_dict_adaround.pth (main.py:586-588, :654-656)
        from transformer_quantization_tpu.utils import checkpoint as CK

        CK.save_checkpoint(
            os.path.join(args.output_dir, f"checkpoint_{task.name}"),
            params=params, family=fam.name, cfg=cfg,
            qstate=qstate if quantized else None,
            extra={"command": args.command, "seed": args.seed})

    # evaluation (incl. MNLI matched+mismatched, main.py:748-784)
    eval_splits = [("validation", val_arr)]
    if task.name == "mnli" and "validation_mismatched" in splits:
        mm = D.encode_examples(tok, task, splits["validation_mismatched"],
                               args.max_seq_length)
        eval_splits.append(("validation_mismatched", mm))

    full_q = QuantMode()

    def make_engine_apply(qs, mode):
        """Engine forward for this qstate+mode, or None (simulation).

        Rebuilt per qstate: the plan bakes site scales, and e.g. the
        AdaRound multi-eval re-estimates act ranges per setting. The
        megakernel engine bakes the full-quant fixed-range mode; every
        other mode (dynamic, weight-only/FP-acts, family without a
        megakernel) routes to the generic int path, whose site gates
        respect ``mode`` internally."""
        if not quantized or getattr(args, "engine", "off") == "off":
            return None
        import jax as _jax

        backend = ("xla" if args.engine == "xla"
                   or (args.engine == "auto"
                       and _jax.default_backend() == "cpu")
                   else "pallas")

        def generic_int_apply(why):
            # the generic int path handles everything the megakernel plan
            # can't: dynamic (incl. per-token) ranges re-estimated inside
            # the forward (axis scales fold into the matmul epilogue,
            # ops/layers.py _int8_fast_path), and weight-only modes
            # (--no-act-quant; packed weights dequantize on load)
            logger.info("generic int path active for eval (%s, backend=%s)",
                        why, backend)
            # packed weights are only consumed when the mode quantizes
            # weights, so FP-weight modes skip the packing work. Built
            # HERE, outside the jitted eval step: post-omnistaging, jnp
            # ops stage into an active trace even on concrete operands,
            # so packing lazily inside the apply would cache tracers and
            # leak them into the next call.
            ip = (fam.build_int_params(params, qcfg, qs, args.n_bits <= 4)
                  if mode.weight_quant else None)

            def int_apply(p, batch, qcfg=None, qstate=None,
                          mode=None, **kw):
                return fam.apply(p, batch, cfg, qcfg, qstate, mode,
                                 int_params=ip,
                                 use_pallas=backend == "pallas", **kw)

            return int_apply

        if args.dynamic:
            return generic_int_apply("dynamic ranges")
        if mode != full_q:
            return generic_int_apply("non-default quant mode")
        if fam.build_engine is None:
            return generic_int_apply("no megakernel engine for family")

        from transformer_quantization_tpu.ops.engine import EngineIncompatible

        try:
            e_static, e_plan, e_int = fam.build_engine(
                params, cfg, qcfg, qs, use_int4=args.n_bits <= 4)
        except EngineIncompatible as e:
            return generic_int_apply(f"megakernel engine unavailable: {e}")
        interp = backend == "pallas" and _jax.default_backend() == "cpu"
        logger.info("int8 engine active for eval (backend=%s)", backend)

        def engine_apply(params, batch, qcfg=None, qstate=None,
                         mode=None, **kw):
            out = fam.engine_apply(params, batch, cfg, qcfg, qstate,
                                   e_static, e_plan, e_int,
                                   backend=backend, interpret=interp)
            return out, qstate

        return engine_apply

    def eval_mean(qs, mode):
        split_scores, res = [], {}
        engine_fwd = make_engine_apply(qs, mode)
        pp_fwd = None
        if engine_fwd is not None and pp_mesh is not None:
            logger.info("--pp-stages ignored for eval: the int8 engine "
                        "path is single-chip and takes precedence")
        if (engine_fwd is None and pp_mesh is not None
                and mode.act_phase in (Phase.fix, Phase.learn)
                and mode.weight_phase in (Phase.fix, Phase.learn)
                and args.eval_batch_size % args.pp_microbatches == 0):
            # stage-parallel eval: the same GPipe program the train step
            # uses (evaluate pads every batch to eval_batch_size, so the
            # microbatch split always divides)
            pp_fwd = functools.partial(
                apply_fn, pp_mesh=pp_mesh,
                pp_microbatches=args.pp_microbatches)
        for split_name, arr in eval_splits:
            fwd = (engine_fwd if engine_fwd is not None
                   else (pp_fwd if pp_fwd is not None else apply_fn))
            with timer.phase("eval"):
                m = T.evaluate(fwd, params, qs, task, arr, qcfg=qcfg,
                               mode=mode, batch_size=args.eval_batch_size,
                               num_val_samples=args.num_val_samples)
            res[split_name] = m
            split_scores.append(m.get(task.final_metric,
                                      m.get("combined_score")))
            logger.info("Eval results %s/%s: %s", task.name, split_name, m)
            if args.num_val_samples is not None:
                break
        return float(np.mean(split_scores)), res

    if quantized and ar_cfg is not None and not args.dynamic:
        # AdaRound multi-eval protocol (main.py:666-730): FP-acts score,
        # then act ranges re-estimated at batch sizes {1, 4, 16}; report max
        est_pad = (args.est_ranges_pad if args.est_ranges_pad is not None
                   else args.pad_to_max_length)
        final, details = AD.adaround_multi_eval(
            apply_fn, params, qcfg, qstate, eval_fn=eval_mean,
            est_arrays=train_arr, act_quant_mode=ar_cfg.act_quant_mode,
            weight_quant=weight_quant, act_quant=act_quant,
            num_est_batches=args.num_est_batches, est_pad=est_pad,
            cross_entropy_layer=args.cross_entropy_layer,
            log_fn=logger.info)
        results = details["payload"]
        qstate = details["best_qstate"]
    else:
        final, results = eval_mean(qstate, eval_mode)
    logger.info("Phase timings:\n%s", timer.report())

    if getattr(args, "export_dir", None):
        # AOT deployment artifact: the calibrated real-int forward (or the
        # FP32 baseline) as portable StableHLO with a symbolic batch dim
        # (serving/export.py)
        from transformer_quantization_tpu.serving import export as EX

        ip = (fam.build_int_params(params, qcfg, qstate, args.n_bits <= 4)
              if quantized else None)
        ex_mode = eval_mode

        def export_fwd(ids, mask, tt):
            b = {"input_ids": ids, "attention_mask": mask,
                 "token_type_ids": tt}
            out, _ = fam.apply(params, b, cfg, qcfg, qstate, ex_mode,
                               int_params=ip)
            return out["logits"]

        buckets = (args.export_seq_buckets
                   if args.export_seq_buckets else [args.max_seq_length])
        # engine-path programs at concrete (batch, seq) buckets: symbolic
        # batch dims can't drive Pallas grids, so the megakernel engine
        # exports per bucket; the server already buckets shapes
        engine_fwd = None
        bbuckets = getattr(args, "export_batch_buckets", None) or ()
        if bbuckets and quantized and fam.build_engine is not None:
            from transformer_quantization_tpu.ops.engine import (
                EngineIncompatible,
            )

            try:
                import jax.numpy as jnp

                e_static, e_plan, e_int = fam.build_engine(
                    params, cfg, qcfg, qstate)
                e_backend = ("xla" if jax.default_backend() == "cpu"
                             else "pallas")

                def engine_fwd(ids, mask, tt):
                    b = {"input_ids": ids, "attention_mask": mask,
                         "token_type_ids": tt}
                    return fam.engine_apply(
                        params, b, cfg, qcfg, qstate, e_static, e_plan,
                        e_int, backend=e_backend,
                        engine_dtype=jnp.bfloat16)["logits"]
            except EngineIncompatible as e:
                logger.info("engine bucket export skipped: %s", e)
        man = EX.save_export(
            os.path.join(args.export_dir, task.name), export_fwd,
            seq_buckets=[int(s) for s in buckets],
            engine_fwd=engine_fwd,
            engine_batch_buckets=[int(b) for b in bbuckets],
            meta={"family": fam.name, "task": task.name,
                  "num_labels": cfg.num_labels,
                  "n_bits": args.n_bits if quantized else None,
                  "quantized": quantized,
                  "vocab_size": cfg.vocab_size,
                  "dynamic": bool(getattr(args, "dynamic", False))})
        logger.info("exported AOT artifact: %s (platforms %s%s)",
                    os.path.join(args.export_dir, task.name),
                    man["platforms"],
                    (f"; engine buckets {man['engine_batch_buckets']} "
                     f"on {man['engine_platforms']}")
                    if engine_fwd is not None else "")

    if tb_writer is not None:
        if quantized and qstate:
            tb_writer.write_range_summary(qcfg, qstate)
        tb_writer.scalar(f"eval/{task.final_metric}", final)
        tb_writer.close()

    if args.output_dir:
        os.makedirs(args.output_dir, exist_ok=True)
        for split_name, m in results.items():
            suffix = ("mnli-mm" if split_name == "validation_mismatched"
                      else task.name)
            with open(os.path.join(args.output_dir,
                                   f"eval_results_{suffix}.txt"), "w") as f:
                for k, v in m.items():
                    f.write(f"{k} = {v}\n")
    return final


def _log_results(task_scores: Dict[str, float]):
    """Macro-average incl./excl. WNLI (main.py:193-209)."""
    for t, s in task_scores.items():
        logger.info("GLUE task %s: %.2f", t, 100.0 * s)
    vals = list(task_scores.values())
    logger.info("GLUE macro-avg (incl. WNLI): %.2f",
                100.0 * float(np.mean(vals)))
    no_wnli = [s for t, s in task_scores.items() if t != "wnli"]
    if no_wnli and "wnli" in task_scores:
        logger.info("GLUE macro-avg (excl. WNLI): %.2f",
                    100.0 * float(np.mean(no_wnli)))


# The reference README's documented experiment settings as one flag
# (reference README.md:145-200; each recipe = that section's command
# line). A recipe only fills options the user left at their defaults, so
# explicit flags always win.
_W8A8 = dict(n_bits=8, n_bits_act=8, qmethod="symmetric_uniform",
             qmethod_act="asymmetric_uniform", weight_quant_method="MSE",
             weight_opt_method="golden_section",
             act_quant_method="current_minmax",
             est_ranges_batch_size=1, num_est_batches=1,
             quant_setup="all", est_ranges_pad=False)
RECIPES = {
    # README §B.1 standard W8A8 per-tensor PTQ
    "w8a8": dict(_W8A8),
    # §B.2 mixed precision W8A{8,16} (STS-B adds P/C/MSE_logits itself)
    "w8a8-mixed": dict(_W8A8, quant_dict="{'y': 16, 'h': 16, 'x': 16}"),
    # §B.3 PEG, 6 permuted groups with shared-h permutation
    "w8a8-peg": dict(_W8A8,
                     quant_dict="{'y': 'ngp6', 'h': 'ngp6', 'x': 'ngp6'}",
                     per_groups_permute_shared_h=True),
    # §B.4 W4A32 AdaRound
    "w4-adaround": dict(n_bits=4, no_act_quant=True,
                        qmethod="symmetric_uniform",
                        qmethod_act="asymmetric_uniform",
                        weight_quant_method="MSE", weight_opt_method="grid",
                        num_candidates=100, quant_setup="all",
                        adaround=["all"], adaround_num_samples=1024,
                        adaround_init="range_estimator",
                        adaround_mode="learned_hard_sigmoid",
                        adaround_iters=10000,
                        adaround_act_quant_mode="no_act_quant",
                        est_ranges_pad=False),
    # §C QAT base run (W4A8, learnable ranges)
    "qat-w4a8": dict(learn_ranges=True, batch_size=8, learning_rate=5e-5,
                     num_epochs=6, warmup_steps=186, weight_decay=0.0,
                     attn_dropout=0.0, hidden_dropout=0.0,
                     max_seq_length=128, n_bits=4, n_bits_act=8,
                     qmethod="symmetric_uniform",
                     qmethod_act="asymmetric_uniform",
                     weight_quant_method="MSE",
                     weight_opt_method="golden_section",
                     act_quant_method="current_minmax",
                     est_ranges_batch_size=16, num_est_batches=1,
                     quant_setup="all", pad_to_max_length=True),
}


def apply_recipe(args) -> None:
    """Overlay a named recipe onto options the user left at defaults."""
    recipe = RECIPES[args.recipe]
    defaults = vars(build_parser().parse_args([args.command]))
    if args.recipe == "w8a8-mixed" and any(
            t.lower().replace("-", "") == "stsb"
            for t in (getattr(args, "task", None) or [])):
        # the README's STS-B variant (README.md:165-166): pooler +
        # classifier sites 16-bit and MSE estimation of the regression
        # output; applied only to options the user left at defaults
        recipe = dict(recipe,
                      quant_dict="{'y': 16, 'h': 16, 'x': 16, "
                                 "'P': 16, 'C': 16}",
                      quant_setup="MSE_logits")
    for k, v in recipe.items():
        if k not in vars(args):
            continue  # e.g. adaround options on a train command
        if vars(args)[k] == defaults.get(k):
            setattr(args, k, v)
    logger.info("applied recipe %r (explicit flags take precedence)",
                args.recipe)


def main(argv=None):
    # TQ_PLATFORM=cpu|tpu pins the jax platform even when the hosting
    # environment pre-imports jax with a different default (then the
    # JAX_PLATFORMS env var is read too early to have any effect); the
    # config update is safe any time before first backend use
    plat = os.environ.get("TQ_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    args = build_parser().parse_args(argv)
    if getattr(args, "recipe", None):
        apply_recipe(args)
    from transformer_quantization_tpu.utils import glue as G
    from transformer_quantization_tpu.utils.misc import seed_all

    seed_all(args.seed)
    do_train = args.command.startswith("train")
    quantized = args.command.endswith("quantized")
    if getattr(args, "per_token", False) and not args.dynamic:
        # static per-position ranges are meaningless; per-token implies
        # dynamic quantization (transformer_click_options.py:441-443)
        logger.info("--per-token forces --dynamic")
        args.dynamic = True
    tasks = G.resolve_tasks(args.task or ["rte"])

    if args.output_dir:
        os.makedirs(args.output_dir, exist_ok=True)
        with open(os.path.join(args.output_dir, "config.out"), "w") as f:
            f.write(json.dumps(vars(args), indent=2, default=str) + "\n")

    from transformer_quantization_tpu.utils.profiling import trace

    task_scores = {}
    with trace(getattr(args, "profile_dir", None)):
        for task in tasks:
            logger.info("%s task %s",
                        "Training" if do_train else "Validating", task.name)
            task_scores[task.name] = run_task(args, task, do_train, quantized)
            logger.info("Final score %s -> %.2f", task.name,
                        100.0 * task_scores[task.name])

    _log_results(task_scores)
    final = float(np.mean(list(task_scores.values())))
    if args.output_dir:
        with open(os.path.join(args.output_dir, "final_score.txt"), "w") as f:
            f.write(f"{final}\n")
    print(json.dumps({"final_score": final,
                      "tasks": {k: round(v, 4)
                                for k, v in task_scores.items()}}))
    return final


if __name__ == "__main__":
    main()
