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
    save_every: Optional[int] = None   # checkpoint every N steps
    eval_batch_size: int = 32
    # stop after N optimizer steps (HF TrainingArguments max_steps); the
    # LR schedule still spans the full num_epochs horizon, so an
    # interrupted-then-resumed run matches an uninterrupted one exactly
    max_steps: Optional[int] = None


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
    """AdamW + linear warmup->linear decay (HF Trainer defaults the
    reference relies on, main.py:92-133)."""
    warmup = int(tcfg.warmup_ratio * steps_total)
    lr = optax.join_schedules(
        [optax.linear_schedule(0.0, tcfg.learning_rate, max(warmup, 1)),
         optax.linear_schedule(tcfg.learning_rate, 0.0,
                               max(steps_total - warmup, 1))],
        [max(warmup, 1)])
    tx = optax.chain(
        optax.clip_by_global_norm(tcfg.max_grad_norm),
        optax.adamw(lr, weight_decay=tcfg.weight_decay))
    if tcfg.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, tcfg.grad_accum_steps)
    return tx


def save_train_state(path: str, params, learnable, rest, opt_state, rng,
                     step_i: int) -> None:
    """Full mid-train state: model + ranges + optimizer + RNG + position.

    The optimizer pytree (optax NamedTuples) is stored as ordered leaves
    and re-hung on a freshly-initialized state's treedef at load time —
    robust to any optax structure without pickling."""
    from transformer_quantization_tpu.utils import checkpoint as CK

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    CK.save_tree(path + ".model.npz",
                 {"params": params, "learnable": learnable, "rest": rest})
    opt_leaves = {f"leaf_{i}": np.asarray(x)
                  for i, x in enumerate(jax.tree.leaves(opt_state))}
    np.savez(path + ".opt.npz", __step__=np.asarray(step_i),
             __rng__=np.asarray(rng), **opt_leaves)


def load_train_state(path: str, opt_template) -> Tuple:
    """Inverse of :func:`save_train_state`; ``opt_template`` is a freshly
    built ``tx.init(...)`` state providing the treedef."""
    from transformer_quantization_tpu.utils import checkpoint as CK

    model = CK.load_tree(path + ".model.npz")
    with np.load(path + ".opt.npz") as z:
        step_i = int(z["__step__"])
        rng = jax.numpy.asarray(z["__rng__"])
        n = len([k for k in z.files if k.startswith("leaf_")])
        leaves = [jax.numpy.asarray(z[f"leaf_{i}"]) for i in range(n)]
    opt_state = jax.tree.unflatten(jax.tree.structure(opt_template), leaves)
    return (model["params"], model.get("learnable") or {},
            model.get("rest") or {}, opt_state, rng, step_i)


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
    if resume and train_state_path and has_train_state(train_state_path):
        params, learnable, rest, opt_state, rng, start_step = \
            load_train_state(train_state_path, opt_state)
        log_fn(f"resumed train state from {train_state_path} "
               f"at step {start_step}")

    quantized = qcfg is not None and len(qcfg.sites) > 0
    mid_eval_mode = (QuantMode() if quantized else FP32_MODE)

    def current_qstate():
        return QAT.merge_learnable_ranges(learnable, rest)

    data_rng = np.random.RandomState(tcfg.seed)
    step_i = 0
    for epoch in range(tcfg.num_epochs):
        for batch in batch_iterator(train_arrays, tcfg.batch_size,
                                    shuffle=True, rng=data_rng,
                                    drop_last=True):
            if step_i < start_step:
                # resumed run: replay the (deterministic) shuffle order
                # without stepping, so data order matches the original run
                step_i += 1
                continue
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
                    and step_i % tcfg.eval_every == 0):
                m = evaluate(apply_fn, params, current_qstate(), task,
                             eval_arrays, qcfg=qcfg, mode=mid_eval_mode,
                             batch_size=tcfg.eval_batch_size)
                log_fn(f"[step {step_i}] eval: {m}")
                if tb_writer is not None:
                    for k, v in m.items():
                        tb_writer.scalar(f"eval/{k}", float(v), step_i)
            if tcfg.save_every and step_i % tcfg.save_every == 0:
                if save_fn is not None:
                    save_fn(params, current_qstate(), step_i)
                if train_state_path:
                    save_train_state(train_state_path, params, learnable,
                                     rest, opt_state, rng, step_i)
            if tcfg.max_steps and step_i >= tcfg.max_steps:
                qstate = QAT.merge_learnable_ranges(learnable, rest)
                return params, qstate
    qstate = QAT.merge_learnable_ranges(learnable, rest)
    return params, qstate
