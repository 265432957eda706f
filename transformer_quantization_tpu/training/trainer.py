"""Jitted train/eval loops (the reference's HF-Trainer role).

The reference drives everything through ``transformers.Trainer``
(reference: main.py:136-190, :650-663); here training and evaluation are
explicit jitted steps over fixed-shape batches — one compiled program per
phase, streamed from a host-side numpy pipeline (SURVEY.md §2.6 'Eval loop'
row). Works for the FP32 baseline (qcfg=None), PTQ eval, and QAT.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from transformer_quantization_tpu.quant.qconfig import (
    QuantModelConfig,
    QuantMode,
)
from transformer_quantization_tpu.training import qat as QAT
from transformer_quantization_tpu.utils.data import batch_iterator
from transformer_quantization_tpu.utils.glue import GlueTask, compute_metrics

FP32_MODE = QuantMode(weight_quant=False, act_quant=False)


@dataclasses.dataclass
class TrainConfig:
    learning_rate: float = 5e-5
    num_epochs: int = 3
    batch_size: int = 32
    weight_decay: float = 0.0
    max_grad_norm: float = 1.0
    warmup_ratio: float = 0.0
    seed: int = 1000
    log_every: int = 50
    # gradient accumulation (HF Trainer's gradient_accumulation_steps,
    # transformer_click_options.py training group) via optax.MultiSteps
    grad_accum_steps: int = 1
    # progress cadence (reference transformer_click_options.py:288-400:
    # --eval_steps / --save_steps / TB train-logging intervals)
    eval_every: Optional[int] = None   # mid-train eval every N steps
    eval_at_epoch_end: bool = False    # reference --eval-strategy epoch
    save_every: Optional[int] = None   # checkpoint every N steps
    eval_batch_size: int = 32
    # tqdm progress bar over training batches (reference --tqdm/--no-tqdm);
    # silently falls back to log lines when tqdm is unavailable or stderr
    # is not a terminal (CI logs stay clean)
    progress_bar: bool = False
    # stop after N optimizer steps (HF TrainingArguments max_steps); the
    # LR schedule still spans the full num_epochs horizon, so an
    # interrupted-then-resumed run matches an uninterrupted one exactly
    max_steps: Optional[int] = None
    # reference training-group parity (transformer_click_options.py:187-285)
    warmup_steps: Optional[int] = None  # absolute; overrides warmup_ratio
    lr_scheduler_type: str = "linear"   # linear | cosine | constant
    ffn_weight_decay: float = 0.0  # extra decoupled decay on FFN kernels
    # HF Trainer best-model tracking (--load-best-model-at-end family):
    # evaluated at the eval_every cadence; restores the best step's
    # params+ranges at the end of training
    load_best_model_at_end: bool = False
    metric_for_best_model: Optional[str] = None  # None -> task final metric
    greater_is_better: bool = True


def make_eval_step(apply_fn: Callable, qcfg: Optional[QuantModelConfig],
                   mode: QuantMode):
    """Jitted eval step returning logits (and updated qstate for --dynamic,
    where act ranges re-estimate per eval batch)."""

    @jax.jit
    def step(params, qstate, batch):
        model_batch = {k: v for k, v in batch.items()
                       if k not in ("labels", "example_mask")}
        out, new_qstate = apply_fn(params, model_batch, qcfg=qcfg,
                                   qstate=qstate, mode=mode)
        return out["logits"], new_qstate

    return step


def evaluate(apply_fn: Callable, params, qstate, task: GlueTask,
             arrays: Dict[str, np.ndarray], *, qcfg=None,
             mode: QuantMode = FP32_MODE, batch_size: int = 32,
             num_val_samples: Optional[int] = None) -> Dict[str, float]:
    """Full-split evaluation -> task metrics (main.py:748-784 without the
    HF Trainer)."""
    if num_val_samples is not None:
        arrays = {k: v[:num_val_samples] for k, v in arrays.items()}
    step = make_eval_step(apply_fn, qcfg, mode)
    logits, labels = [], []
    for batch in batch_iterator(arrays, batch_size, pad_final=True):
        em = batch.pop("example_mask")
        lg, qstate = step(params, qstate, batch)
        keep = em > 0
        logits.append(np.asarray(lg)[keep])
        labels.append(np.asarray(batch["labels"])[keep])
    return compute_metrics(task, np.concatenate(logits),
                           np.concatenate(labels))


def make_optimizer(tcfg: TrainConfig, steps_total: int
                   ) -> optax.GradientTransformation:
    """AdamW + warmup + decay schedule (HF Trainer args the reference
    exposes: --lr-scheduler-type, --warmup-steps, main.py:92-133).

    ``ffn_weight_decay`` adds extra decoupled decay on FFN kernels only
    (reference --ffn-weight-decay; declared there but never consumed —
    implemented for real here via a path mask)."""
    warmup = (tcfg.warmup_steps if tcfg.warmup_steps is not None
              else int(tcfg.warmup_ratio * steps_total))
    rest = max(steps_total - warmup, 1)
    if tcfg.lr_scheduler_type == "cosine":
        decay = optax.cosine_decay_schedule(tcfg.learning_rate, rest)
    elif tcfg.lr_scheduler_type == "constant":
        decay = optax.constant_schedule(tcfg.learning_rate)
    else:  # linear (HF default)
        decay = optax.linear_schedule(tcfg.learning_rate, 0.0, rest)
    if warmup > 0:
        warm = optax.linear_schedule(0.0, tcfg.learning_rate, warmup)
        lr = optax.join_schedules([warm, decay], [warmup])
    else:
        lr = decay

    def adamw(extra_wd=0.0):
        return optax.adamw(lr, weight_decay=tcfg.weight_decay + extra_wd)

    if tcfg.ffn_weight_decay:
        def labels(tree):
            from jax.tree_util import tree_map_with_path

            def lab(path, _):
                # FFN *kernels* only: biases and the ffn.ln scale/bias
                # must not be decayed (decaying LayerNorm params degrades
                # training); every family names matmul weights "kernel"
                keys = [str(getattr(k, "key", k)) for k in path]
                is_kernel = bool(keys) and keys[-1] == "kernel"
                return ("ffn" if is_kernel and any("ffn" in k for k in keys)
                        else "other")

            return tree_map_with_path(lab, tree)

        inner = optax.multi_transform(
            {"ffn": adamw(tcfg.ffn_weight_decay), "other": adamw()}, labels)
    else:
        inner = adamw()
    tx = optax.chain(optax.clip_by_global_norm(tcfg.max_grad_norm), inner)
    if tcfg.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, tcfg.grad_accum_steps)
    return tx


def save_train_state(path: str, params, learnable, rest, opt_state, rng,
                     step_i: int, best: Optional[Dict] = None) -> None:
    """Full mid-train state: model + ranges + optimizer + RNG + position
    (+ best-model tracking, so --load-best-model-at-end survives --resume).

    The optimizer pytree (optax NamedTuples) is stored as ordered leaves
    and re-hung on a freshly-initialized state's treedef at load time —
    robust to any optax structure without pickling."""
    from transformer_quantization_tpu.utils import checkpoint as CK

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tree = {"params": params, "learnable": learnable, "rest": rest}
    extra = {}
    if best is not None and best.get("state") is not None:
        bp, bl, br = best["state"]
        tree["best"] = {"params": bp, "learnable": bl, "rest": br}
        extra["__best_score__"] = np.asarray(best["score"])
    CK.save_tree(path + ".model.npz", tree)
    opt_leaves = {f"leaf_{i}": np.asarray(x)
                  for i, x in enumerate(jax.tree.leaves(opt_state))}
    np.savez(path + ".opt.npz", __step__=np.asarray(step_i),
             __rng__=np.asarray(rng), **extra, **opt_leaves)


def load_train_state(path: str, opt_template) -> Tuple:
    """Inverse of :func:`save_train_state`; ``opt_template`` is a freshly
    built ``tx.init(...)`` state providing the treedef."""
    from transformer_quantization_tpu.utils import checkpoint as CK

    model = CK.load_tree(path + ".model.npz")
    best = {"score": None, "state": None}
    with np.load(path + ".opt.npz") as z:
        step_i = int(z["__step__"])
        rng = jax.numpy.asarray(z["__rng__"])
        if "__best_score__" in z.files and "best" in model:
            b = model["best"]
            best = {"score": float(z["__best_score__"]),
                    "state": (b["params"], b.get("learnable") or {},
                              b.get("rest") or {})}
        n = len([k for k in z.files if k.startswith("leaf_")])
        leaves = [jax.numpy.asarray(z[f"leaf_{i}"]) for i in range(n)]
    opt_state = jax.tree.unflatten(jax.tree.structure(opt_template), leaves)
    return (model["params"], model.get("learnable") or {},
            model.get("rest") or {}, opt_state, rng, step_i, best)


def has_train_state(path: str) -> bool:
    return os.path.exists(path + ".opt.npz")


def train(apply_fn: Callable, params, task: GlueTask,
          train_arrays: Dict[str, np.ndarray], tcfg: TrainConfig, *,
          qcfg: Optional[QuantModelConfig] = None, qstate: Optional[Dict] = None,
          qat_cfg: Optional[QAT.QATConfig] = None,
          eval_arrays: Optional[Dict[str, np.ndarray]] = None,
          log_fn: Callable = print, tb_writer=None,
          save_fn: Optional[Callable] = None,
          train_state_path: Optional[str] = None,
          resume: bool = False) -> Tuple:
    """Train loop. Baseline mode (qcfg=None) or QAT (qcfg+qstate+qat_cfg).

    Returns ``(params, qstate)`` with QAT ranges merged & ready to fix.

    Mid-train observability (the reference's progress option group,
    transformer_click_options.py:288-400 + TB writer injection
    main.py:599-648): ``tcfg.eval_every`` evaluates ``eval_arrays`` with
    current (frozen) ranges every N steps; ``tcfg.save_every`` calls
    ``save_fn(params, qstate, step)``; ``tb_writer`` receives
    ``train/loss`` scalars at ``log_every`` and ``eval/<metric>`` at the
    eval cadence.
    """
    n = len(train_arrays["input_ids"])
    steps_per_epoch = max(n // tcfg.batch_size, 1)
    total = steps_per_epoch * tcfg.num_epochs
    # the LR schedule advances once per *optimizer* update
    tx = make_optimizer(tcfg, max(total // tcfg.grad_accum_steps, 1))
    qat_cfg = qat_cfg or QAT.QATConfig()
    qstate = qstate or {}

    step_fn = QAT.make_qat_train_step(apply_fn, qcfg or
                                      QuantModelConfig(()), qat_cfg, tx)
    params, learnable, rest, opt_state = QAT.init_qat_state(
        qcfg or QuantModelConfig(()), qat_cfg, params, qstate, tx)

    start_step = 0
    rng = jax.random.PRNGKey(tcfg.seed)
    best = {"score": None, "state": None}
    if resume and train_state_path and has_train_state(train_state_path):
        params, learnable, rest, opt_state, rng, start_step, best = \
            load_train_state(train_state_path, opt_state)
        log_fn(f"resumed train state from {train_state_path} "
               f"at step {start_step}")

    quantized = qcfg is not None and len(qcfg.sites) > 0
    mid_eval_mode = (QuantMode() if quantized else FP32_MODE)

    def current_qstate():
        return QAT.merge_learnable_ranges(learnable, rest)

    if tcfg.load_best_model_at_end and not (
            (tcfg.eval_every or tcfg.eval_at_epoch_end)
            and eval_arrays is not None):
        log_fn("WARNING: --load-best-model-at-end needs an eval cadence "
               "(--eval-every / --eval-strategy epoch) and an eval split "
               "to ever record a best model; it will be a no-op")

    def _track_best(m, step_i):
        if not tcfg.load_best_model_at_end:
            return
        key = tcfg.metric_for_best_model or task.final_metric
        score = m.get(key, m.get("combined_score"))
        if score is None:
            return
        better = (best["score"] is None
                  or (score > best["score"]) == tcfg.greater_is_better
                  and score != best["score"])
        if better:
            best["score"] = score
            # deep-copy: the train step donates its inputs, so live
            # references to past params would be invalidated buffers
            best["state"] = jax.tree.map(jnp.copy, (params, learnable, rest))
            log_fn(f"[step {step_i}] new best {key}={score:.4f}")

    def run_mid_eval(step_i):
        if eval_arrays is None:
            return
        m = evaluate(apply_fn, params, current_qstate(), task,
                     eval_arrays, qcfg=qcfg, mode=mid_eval_mode,
                     batch_size=tcfg.eval_batch_size)
        log_fn(f"[step {step_i}] eval: {m}")
        _track_best(m, step_i)
        if tb_writer is not None:
            for k, v in m.items():
                tb_writer.scalar(f"eval/{k}", float(v), step_i)

    def maybe_tqdm(it, epoch):
        if not tcfg.progress_bar:
            return it
        try:
            import sys as _sys

            from tqdm import tqdm as _tqdm

            if not _sys.stderr.isatty():
                return it
            return _tqdm(it, total=steps_per_epoch, leave=False,
                         desc=f"epoch {epoch}")
        except ImportError:
            return it

    # cadences (max_steps/eval_every/save_every) are in *optimizer* steps
    # (HF Trainer semantics); step_i counts micro-batches, so with
    # gradient accumulation each cadence stretches by accum
    accum = max(tcfg.grad_accum_steps, 1)
    max_micro = tcfg.max_steps * accum if tcfg.max_steps else None
    data_rng = np.random.RandomState(tcfg.seed)
    step_i = 0
    for epoch in range(tcfg.num_epochs):
        for batch in maybe_tqdm(batch_iterator(train_arrays, tcfg.batch_size,
                                               shuffle=True, rng=data_rng,
                                               drop_last=True), epoch):
            if step_i < start_step:
                # resumed run: replay the (deterministic) shuffle order
                # without stepping, so data order matches the original run
                step_i += 1
                continue
            # checked BEFORE executing so a run resumed at exactly
            # max_steps does not take one extra optimizer step
            if max_micro is not None and step_i >= max_micro:
                return _finish(params, learnable, rest, best, log_fn)
            batch.pop("example_mask")
            params, learnable, rest, opt_state, rng, loss = step_fn(
                params, learnable, rest, opt_state, batch, rng)
            step_i += 1
            if step_i % tcfg.log_every == 0 or step_i == 1:
                log_fn(f"epoch {epoch} step {step_i}/{total} "
                       f"loss {float(loss):.4f}")
                if tb_writer is not None:
                    tb_writer.scalar("train/loss", float(loss), step_i)
            if (tcfg.eval_every and eval_arrays is not None
                    and step_i % (tcfg.eval_every * accum) == 0):
                run_mid_eval(step_i)
            if tcfg.save_every and step_i % (tcfg.save_every * accum) == 0:
                if save_fn is not None:
                    save_fn(params, current_qstate(), step_i)
                if train_state_path:
                    save_train_state(train_state_path, params, learnable,
                                     rest, opt_state, rng, step_i, best)
            if max_micro is not None and step_i >= max_micro:
                return _finish(params, learnable, rest, best, log_fn)
        if tcfg.eval_at_epoch_end and step_i > start_step:
            run_mid_eval(step_i)
    return _finish(params, learnable, rest, best, log_fn)


def _finish(params, learnable, rest, best, log_fn):
    if best["state"] is not None:
        log_fn(f"restoring best checkpoint (score {best['score']:.4f})")
        params, learnable, rest = best["state"]
    return params, QAT.merge_learnable_ranges(learnable, rest)
