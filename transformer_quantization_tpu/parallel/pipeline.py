"""GPipe-style pipeline parallelism over a ``pp`` mesh axis.

No reference counterpart (SURVEY.md §2.6 — the reference is single-process,
single-device). This is the TPU-native formulation: the encoder's layers are
stacked ``[L, ...]`` and sharded over ``pp`` so each stage holds ``L/S``
contiguous layers, and a *partial-manual* :func:`jax.shard_map` program runs
the classic GPipe schedule — at tick ``t`` stage ``s`` processes microbatch
``t - s``, and activations hop stage→stage over ICI via
:func:`jax.lax.ppermute`. Everything is differentiable (``ppermute``
transposes to the reverse shift), so the same program serves eval and the
QAT train step; ``dp``/``tp``/``sp`` remain *automatic* axes — GSPMD keeps
sharding the batch and weights inside each stage, composing pipeline with
data/tensor parallelism without any manual cross-talk.

Semantics notes:

- Quantization state is **read-only** inside the pipeline (weight/act phases
  must be ``fix`` or ``learn``): per-layer site states ride the stacked
  ``[L, ...]`` inputs exactly like scan-over-layers, and estimate-phase
  range updates — which would see pipeline-bubble garbage — are gated off
  (:func:`can_pipeline`).
- During fill/drain ticks every stage still executes (SPMD programs cannot
  idle); the wasted compute equals GPipe's bubble fraction
  ``(S-1)/(n_micro+S-1)``. Bubble outputs never reach real data: batch rows
  are independent in a transformer encoder and the collected outputs are
  masked to the last stage's real writes before the replicating ``psum``.
- Dropout draws per (layer, microbatch) via ``fold_in(key, microbatch)`` —
  a different (equally valid) pattern from the single-device step.
"""

from __future__ import annotations

import copy
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from transformer_quantization_tpu.quant.qconfig import Phase, QuantModelConfig


def can_pipeline(ctx, cfg, n_stages: int, n_micro: int,
                 batch_size: int) -> Optional[str]:
    """None when the encoder stack can run as a GPipe pipeline, else the
    human-readable reason it cannot (callers raise: an explicit pipeline
    request that silently falls back would hide a 1/S throughput loss)."""
    from transformer_quantization_tpu.models.bert import can_scan_encoder

    if ctx.mode is not None:
        if ctx.mode.act_quant and ctx.mode.act_phase not in (Phase.fix,
                                                             Phase.learn):
            return ("activation ranges update inside the forward "
                    f"(act_phase={ctx.mode.act_phase.name}); pipeline "
                    "stages would estimate on bubble garbage — calibrate "
                    "first (fix) or learn ranges")
        if ctx.mode.weight_quant and ctx.mode.weight_phase not in (
                Phase.fix, Phase.learn):
            return ("weight ranges re-estimate inside the forward "
                    f"(weight_phase={ctx.mode.weight_phase.name}); the "
                    "pipeline treats quant state as read-only")
    if cfg.num_hidden_layers % n_stages != 0:
        return (f"num_hidden_layers={cfg.num_hidden_layers} not divisible "
                f"by pp={n_stages}")
    if batch_size % n_micro != 0:
        return f"batch={batch_size} not divisible by microbatches={n_micro}"
    if not can_scan_encoder(ctx, cfg):
        return ("layers are not interchangeable (per-layer site configs/"
                "state shapes differ, or an identity-needing feature like "
                "int payload plans / capture / host-MSE is active)")
    return None


def _stack_micro_rngs(rngs_list, n_micro: int):
    """Per-(layer, microbatch) keys, pre-folded OUTSIDE the manual region
    (key-type agnostic): leaves become ``[L, n_micro, ...key]``."""
    def _expand(k):
        return jnp.stack([jax.random.fold_in(k, m) for m in range(n_micro)])

    per_layer = [jax.tree.map(_expand, r) for r in rngs_list]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)


def _pick_micro_rng(rng_i, micro_idx):
    return jax.tree.map(
        lambda a: jax.lax.dynamic_index_in_dim(a, micro_idx, 0,
                                               keepdims=False), rng_i)


def _gpipe_schedule(S: int, n_micro: int, h_g, mask_g, run_stage):
    """The GPipe schedule body (called INSIDE the manual 'pp' region).

    At tick ``t`` stage ``s`` runs ``run_stage(x, mask, microbatch=t-s)``;
    activations hop stage->stage via ppermute; the last stage's outputs
    are collected and replicated to every stage with one psum.
    """
    stage = jax.lax.axis_index("pp")
    mb = h_g.shape[0] // n_micro
    hm = h_g.reshape((n_micro, mb) + h_g.shape[1:])
    mm = mask_g.reshape((n_micro, mb) + mask_g.shape[1:])

    def tick(carry, t):
        buf, outs = carry
        x_in = jax.lax.dynamic_index_in_dim(
            hm, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False)
        x = jnp.where(stage == 0, x_in, buf)
        # stage s works on microbatch t - s during the steady state
        idx_s = jnp.clip(t - stage, 0, n_micro - 1)
        m = jax.lax.dynamic_index_in_dim(mm, idx_s, 0, keepdims=False)
        y = run_stage(x, m, idx_s)
        w_idx = jnp.clip(t - (S - 1), 0, n_micro - 1)
        write = jnp.logical_and(stage == S - 1, t >= S - 1)
        outs = jnp.where(
            write, jax.lax.dynamic_update_index_in_dim(outs, y, w_idx, 0),
            outs)
        buf = jax.lax.ppermute(y, "pp", [(i, (i + 1) % S) for i in range(S)])
        return (buf, outs), None

    # initial carries vary per stage once the schedule starts; mark them
    # varying over 'pp' up front so scan's carry types close
    buf0 = jax.lax.pcast(jnp.zeros_like(hm[0]), ("pp",), to="varying")
    outs0 = jax.lax.pcast(jnp.zeros_like(hm), ("pp",), to="varying")
    (_, outs), _ = jax.lax.scan(tick, (buf0, outs0),
                                jnp.arange(n_micro + S - 1))
    # only the last stage holds real outputs; replicate them to every
    # stage (the head runs redundantly on all of them -- tiny compute).
    # psum in f32: XLA CPU's AllReducePromotion pass crashes outright on
    # a bf16 all-reduce fed by this where-mask (hlo_instruction.cc
    # "Invalid binary instruction opcode copy"), and f32 accumulation is
    # the safer summation dtype everywhere else too
    outs = jnp.where(stage == S - 1, outs, jnp.zeros_like(outs))
    if outs.dtype != jnp.float32:
        outs = jax.lax.psum(outs.astype(jnp.float32),
                            "pp").astype(h_g.dtype)
    else:
        outs = jax.lax.psum(outs, "pp")
    return outs.reshape(h_g.shape)


def pipeline_layer_stack(mesh: Mesh, ctx, n_layers: int,
                         layer_params: List, h, mask_bias,
                         rngs_list: Optional[List],
                         layer_fn: Callable, *, n_micro: int,
                         remat: bool = False):
    """Run an encoder stack as a GPipe pipeline over ``mesh``'s ``pp`` axis.

    ``layer_fn(sub_ctx, p_i, h, mask, rng_i) -> h`` evaluates ONE layer
    under generic ``L.``-prefixed site names (the scan-over-layers
    contract, models/bert.py scan_layer_stack) and must take the attention
    mask explicitly — the pipeline slices it per microbatch. ``rngs_list``
    is a list (length L) of per-layer pytrees whose leaves are SINGLE PRNG
    keys; the pipeline pre-folds each per microbatch
    (``fold_in(key, microbatch)``) outside the manual region and hands
    ``layer_fn`` the same pytree shape back. Quant state is read-only
    (gate with :func:`can_pipeline` first); the caller's ``ctx.qstate`` is
    returned unchanged.
    """
    from transformer_quantization_tpu.models.bert import _split_layer_site

    S = mesh.shape["pp"]
    L = n_layers
    assert L % S == 0, (L, S)

    scan_cfg = QuantModelConfig(tuple(
        (f"L.{s[1]}", c) for name, c in ctx.cfg.items()
        if (s := _split_layer_site(name)) and s[0] == 0))
    suffixes = sorted({s[1] for n in ctx.qstate
                       if (s := _split_layer_site(n))})
    stacked_state = {
        suf: jax.tree.map(lambda *xs: jnp.stack(xs),
                          *[ctx.qstate[f"L{i}.{suf}"] for i in range(L)])
        for suf in suffixes
    }
    stacked_params = jax.tree.map(lambda *xs: jnp.stack(xs), *layer_params)
    has_rngs = rngs_list is not None
    stacked_rngs = (_stack_micro_rngs(rngs_list, n_micro) if has_rngs
                    else jnp.zeros((L, 1), jnp.int32))  # unused placeholder
    has_mask = mask_bias is not None
    mask_in = mask_bias if has_mask else jnp.zeros((h.shape[0],), h.dtype)

    def pp_fn(p_loc, qs_loc, rng_loc, h_g, mask_g):
        # manual over 'pp' only: p/qs/rng are this stage's [L/S, ...]
        # slices; h/mask stay logically global — GSPMD keeps handling
        # their dp/sp sharding automatically inside the stage compute
        def run_stage(x, m, micro_idx):
            def body(hc, xs):
                p_i, qs_i, rng_i = xs
                sub = copy.copy(ctx)
                sub.cfg = scan_cfg
                sub.qstate = {f"L.{suf}": st for suf, st in qs_i.items()}
                r = _pick_micro_rng(rng_i, micro_idx) if has_rngs else None
                y = layer_fn(sub, p_i, hc, m if has_mask else None, r)
                return y, None
            # GPipe keeps every microbatch's activations live for the
            # backward pass; remat recomputes them per layer instead
            body_fn = jax.checkpoint(body) if remat else body
            y, _ = jax.lax.scan(body_fn, x, (p_loc, qs_loc, rng_loc))
            return y

        return _gpipe_schedule(S, n_micro, h_g, mask_g, run_stage)

    sharded = jax.shard_map(
        pp_fn, mesh=mesh, axis_names={"pp"},
        in_specs=(P("pp"), P("pp"), P("pp"), P(), P()),
        out_specs=P())
    return sharded(stacked_params, stacked_state, stacked_rngs, h, mask_in)


def pipeline_shared_stack(mesh: Mesh, ctx, n_layers: int, shared_params,
                          h, mask_bias, rngs_list: Optional[List],
                          layer_fn: Callable, *, n_micro: int,
                          remat: bool = False):
    """ALBERT-style pipeline: every stage holds the SAME shared layer
    params (replicated) and runs its ``L/S`` iterations of the schedule.

    Weight sharing means pipeline here splits *compute*, not parameter
    memory. ``layer_fn(sub_ctx, params, h, mask, rng_i) -> h`` runs one
    iteration under the family's own (shared) site names — no per-layer
    renaming; the shared quant state is read-only (fix/learn phases,
    :func:`can_pipeline` semantics apply). ``rngs_list`` is a list
    (length L) of pytrees of single keys, consumed ``L/S`` per stage in
    layer order.
    """
    S = mesh.shape["pp"]
    L = n_layers
    assert L % S == 0, (L, S)

    has_rngs = rngs_list is not None
    stacked_rngs = (_stack_micro_rngs(rngs_list, n_micro) if has_rngs
                    else jnp.zeros((L, 1), jnp.int32))
    has_mask = mask_bias is not None
    mask_in = mask_bias if has_mask else jnp.zeros((h.shape[0],), h.dtype)

    def pp_fn(p_shared, qs_shared, rng_loc, h_g, mask_g):
        def run_stage(x, m, micro_idx):
            def body(hc, rng_i):
                sub = copy.copy(ctx)
                sub.qstate = dict(qs_shared)
                r = _pick_micro_rng(rng_i, micro_idx) if has_rngs else None
                y = layer_fn(sub, p_shared, hc, m if has_mask else None, r)
                return y, None
            body_fn = jax.checkpoint(body) if remat else body
            y, _ = jax.lax.scan(body_fn, x, rng_loc)
            return y

        return _gpipe_schedule(S, n_micro, h_g, mask_g, run_stage)

    # shared quant state rides replicated (read-only); only the per-layer
    # rng stack shards over stages
    qstate_in = {k: v for k, v in ctx.qstate.items()}
    sharded = jax.shard_map(
        pp_fn, mesh=mesh, axis_names={"pp"},
        in_specs=(P(), P(), P("pp"), P(), P()),
        out_specs=P())
    return sharded(shared_params, qstate_in, stacked_rngs, h, mask_in)
