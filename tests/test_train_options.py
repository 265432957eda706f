"""Training-option parity (reference transformer_click_options.py training
group): LR scheduler types, absolute warmup, FFN-only extra weight decay,
best-model restore."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from transformer_quantization_tpu.training import trainer as T


def test_lr_scheduler_types_and_warmup_steps():
    for kind, at_end in [("linear", 0.0), ("cosine", 0.0),
                         ("constant", 1e-3)]:
        tcfg = T.TrainConfig(learning_rate=1e-3, lr_scheduler_type=kind,
                             warmup_steps=2)
        tx = T.make_optimizer(tcfg, steps_total=10)
        params = {"w": jnp.ones((3,))}
        state = tx.init(params)
        lrs = []
        for i in range(10):
            g = {"w": jnp.ones((3,))}
            upd, state = tx.update(g, state, params)
            lrs.append(float(jnp.abs(upd["w"][0])))
        # warmup: step sizes grow over the first 2 steps
        assert lrs[0] < lrs[1] <= max(lrs) + 1e-12
        if kind == "constant":
            np.testing.assert_allclose(lrs[-1], lrs[3], rtol=1e-5)
        else:
            assert lrs[-1] < lrs[3]  # decaying


def test_ffn_weight_decay_targets_ffn_kernels_only():
    params = {"params": {"layers": [{"ffn": {"inter": {"kernel":
                                             jnp.ones((2, 2))}},
                                     "attn": {"q": {"kernel":
                                              jnp.ones((2, 2))}}}]},
              "ranges": jnp.zeros((0,))}
    # zero grads isolate the decoupled decay term (adamw scales it by lr)
    tcfg = T.TrainConfig(learning_rate=1e-3, weight_decay=0.0,
                         ffn_weight_decay=0.1, max_grad_norm=1e9,
                         lr_scheduler_type="constant", warmup_steps=0)
    tx = T.make_optimizer(tcfg, steps_total=10)
    state = tx.init(params)
    grads = jax.tree.map(jnp.zeros_like, params)
    upd, _ = tx.update(grads, state, params)
    ffn_upd = upd["params"]["layers"][0]["ffn"]["inter"]["kernel"]
    attn_upd = upd["params"]["layers"][0]["attn"]["q"]["kernel"]
    assert float(jnp.abs(ffn_upd).sum()) > 0.0   # decayed
    assert float(jnp.abs(attn_upd).sum()) == 0.0  # untouched


def test_ffn_weight_decay_excludes_biases_and_layernorm():
    """Only FFN *kernels* get the extra decay — FFN biases and the ffn.ln
    scale/bias must be untouched (decaying LN params degrades training)."""
    params = {"params": {"layers": [{
        "ffn": {"inter": {"kernel": jnp.ones((2, 2)),
                          "bias": jnp.ones((2,))},
                "ln": {"scale": jnp.ones((2,)), "bias": jnp.ones((2,))}},
    }]}}
    tcfg = T.TrainConfig(learning_rate=1e-3, weight_decay=0.0,
                         ffn_weight_decay=0.1, max_grad_norm=1e9,
                         lr_scheduler_type="constant", warmup_steps=0)
    tx = T.make_optimizer(tcfg, steps_total=10)
    state = tx.init(params)
    grads = jax.tree.map(jnp.zeros_like, params)
    upd, _ = tx.update(grads, state, params)
    ffn = upd["params"]["layers"][0]["ffn"]
    assert float(jnp.abs(ffn["inter"]["kernel"]).sum()) > 0.0
    assert float(jnp.abs(ffn["inter"]["bias"]).sum()) == 0.0
    assert float(jnp.abs(ffn["ln"]["scale"]).sum()) == 0.0
    assert float(jnp.abs(ffn["ln"]["bias"]).sum()) == 0.0


def _tiny_train_setup():
    import functools

    from transformer_quantization_tpu.models import bert as B
    from transformer_quantization_tpu.utils.glue import TASKS

    cfg = B.BertConfig(vocab_size=32, hidden_size=16, num_hidden_layers=1,
                       num_attention_heads=2, intermediate_size=32,
                       max_position_embeddings=16, num_labels=2)
    params = B.init_bert_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    n = 32
    arrays = {
        "input_ids": rng.randint(0, 32, (n, 8)).astype(np.int32),
        "attention_mask": np.ones((n, 8), np.float32),
        "token_type_ids": np.zeros((n, 8), np.int32),
        "labels": rng.randint(0, 2, (n,)).astype(np.int32),
        "example_mask": np.ones((n,), np.int32),
    }
    return functools.partial(B.bert_apply, cfg=cfg), params, \
        TASKS["rte"], arrays


def test_cadences_are_in_optimizer_steps_under_grad_accum():
    """HF Trainer semantics: max_steps / save_every count OPTIMIZER steps.
    With grad_accum=2, save_every=1 fires at micro-steps 2,4 and
    max_steps=2 stops after exactly 4 micro-batches."""
    apply_fn, params, task, arrays = _tiny_train_setup()
    saved = []
    tcfg = T.TrainConfig(batch_size=4, num_epochs=4, learning_rate=1e-4,
                         seed=3, log_every=1000, grad_accum_steps=2,
                         save_every=1, max_steps=2)
    T.train(apply_fn, params, task, arrays, tcfg,
            log_fn=lambda *a: None,
            save_fn=lambda p, qs, step: saved.append(step))
    assert saved == [2, 4]


def test_best_model_state_survives_resume(tmp_path):
    """--load-best-model-at-end tracking rides the train-state checkpoint:
    a best recorded before the save must be restored after --resume."""
    import optax

    params = {"w": jnp.arange(3.0)}
    best_params = {"w": jnp.arange(3.0) * 2}
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    rng = jax.random.PRNGKey(0)
    path = str(tmp_path / "ts")
    best = {"score": 0.75, "state": (best_params, {"r": jnp.ones(2)}, {})}
    T.save_train_state(path, params, {}, {}, opt_state, rng, 5, best)
    out = T.load_train_state(path, tx.init(params))
    assert len(out) == 7
    got_best = out[-1]
    assert got_best["score"] == 0.75
    np.testing.assert_array_equal(np.asarray(got_best["state"][0]["w"]),
                                  np.arange(3.0) * 2)
    np.testing.assert_array_equal(
        np.asarray(got_best["state"][1]["r"]), np.ones(2))


def test_eval_strategy_epoch_runs_eval_at_epoch_end():
    apply_fn, params, task, arrays = _tiny_train_setup()
    logs = []
    tcfg = T.TrainConfig(batch_size=8, num_epochs=2, learning_rate=1e-4,
                         seed=3, log_every=1000, eval_at_epoch_end=True)
    T.train(apply_fn, params, task, arrays, tcfg, eval_arrays=arrays,
            log_fn=lambda m: logs.append(str(m)))
    assert sum("eval:" in m for m in logs) == 2  # once per epoch


def test_cli_reference_flag_aliases():
    """The reference's progress/adaround flag names parse as aliases."""
    from transformer_quantization_tpu.cli import build_parser

    p = build_parser()
    a = p.parse_args(["train-quantized", "--eval-steps", "7",
                      "--save-steps", "9", "--logging-steps", "3",
                      "--adaround-act-quant", "no_act_quant",
                      "--eval-strategy", "epoch", "--no-tqdm",
                      "--eval-during-training"])
    assert a.eval_every == 7
    assert a.save_every == 9
    assert a.log_every == 3
    assert a.adaround_act_quant_mode == "no_act_quant"
    assert a.eval_strategy == "epoch"
    assert a.tqdm is False
    assert a.eval_during_training is True


def test_cli_compat_flags_accepted(tmp_path):
    """Reference command lines run unchanged: always-on/declared-unused
    flags parse, and --tb defaults the TB dir under --output-dir."""
    from transformer_quantization_tpu.cli import build_parser

    p = build_parser()
    a = p.parse_args(["train-quantized", "--overwrite-output",
                      "--save-model", "--logging-first-step",
                      "--greater-is-better", "--save-attn",
                      "--gamma", "0.1", "--margin", "2.0", "--tb"])
    assert a.tb is True and a.gamma == 0.1
