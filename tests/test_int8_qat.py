"""int8-MXU QAT forward (training/int8_qat.py): value and gradient parity
with the fake-quant composition it replaces."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from transformer_quantization_tpu.training.int8_qat import (
    fakequant_qat_linear,
    int8_qat_linear,
)


def _setup(w_bits=8, w_per_channel=False, seed=0, n=12, k=16, b=5):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.normal(scale=1.2, size=(b, k)), jnp.float32)
    w = jnp.asarray(rng.normal(scale=0.5, size=(n, k)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    # calibrated-ish range params: some clipping on both sides
    x_delta = jnp.asarray(2.0 * 0.8 / 255.0, jnp.float32)
    x_zero = jnp.asarray(131.0, jnp.float32)
    if w_per_channel:
        w_delta = jnp.asarray(
            np.abs(rng.normal(0.4, 0.1, (n,))) / (2 ** (w_bits - 1) - 1),
            jnp.float32)
    else:
        w_delta = jnp.asarray(0.4 / (2 ** (w_bits - 1) - 1), jnp.float32)
    g = jnp.asarray(rng.normal(size=(b, n)), jnp.float32)
    return x, w, bias, x_delta, x_zero, w_delta, g


@pytest.mark.parametrize("w_bits", [8, 4])
@pytest.mark.parametrize("w_per_channel", [False, True])
def test_value_parity(w_bits, w_per_channel):
    x, w, bias, xd, xz, wd, _ = _setup(w_bits, w_per_channel)
    y_int = int8_qat_linear(x, w, bias, xd, xz, wd, w_bits, w_per_channel)
    y_ref = fakequant_qat_linear(x, w, bias, xd, xz, wd, w_bits,
                                 w_per_channel)
    # int32 accumulation is exact where the f32 GEMM rounds
    np.testing.assert_allclose(np.asarray(y_int), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("w_bits", [8, 4])
@pytest.mark.parametrize("w_per_channel", [False, True])
def test_gradient_parity(w_bits, w_per_channel):
    """STE + LSQ range gradients of the int8 forward == jax.grad of the
    fake-quant composition, for every differentiable input."""
    x, w, bias, xd, xz, wd, g = _setup(w_bits, w_per_channel)

    def loss_int(*a):
        return jnp.sum(int8_qat_linear(*a, w_bits, w_per_channel) * g)

    def loss_ref(*a):
        return jnp.sum(fakequant_qat_linear(*a, w_bits, w_per_channel) * g)

    gi = jax.grad(loss_int, argnums=(0, 1, 2, 3, 4, 5))(x, w, bias, xd, xz,
                                                        wd)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(x, w, bias, xd, xz,
                                                        wd)
    names = ["x", "w", "bias", "x_delta", "x_zero", "w_delta"]
    for name, a, b in zip(names, gi, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_one_qat_step_trains_ranges():
    """A two-layer int8-forward QAT step updates weights AND range params
    and decreases the loss — the learn-ranges protocol on the deployment
    arithmetic."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.normal(size=(16, 8)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(16, 4)), jnp.float32)
    params = {
        "w1": jnp.asarray(rng.normal(scale=0.5, size=(8, 8)), jnp.float32),
        "b1": jnp.zeros((8,)),
        "w2": jnp.asarray(rng.normal(scale=0.5, size=(4, 8)), jnp.float32),
        "b2": jnp.zeros((4,)),
        "xd1": jnp.asarray(0.03), "xz1": jnp.asarray(128.0),
        "wd1": jnp.asarray(0.01),
        "xd2": jnp.asarray(0.03), "xz2": jnp.asarray(128.0),
        "wd2": jnp.asarray(0.01),
    }

    def loss_fn(p):
        h = int8_qat_linear(x, p["w1"], p["b1"], p["xd1"], p["xz1"],
                            p["wd1"], 8, False)
        h = jax.nn.relu(h)
        y = int8_qat_linear(h, p["w2"], p["b2"], p["xd2"], p["xz2"],
                            p["wd2"], 8, False)
        return jnp.mean((y - tgt) ** 2)

    tx = optax.adam(5e-3)
    opt = tx.init(params)
    losses = []
    p = params
    for _ in range(30):
        l, gr = jax.value_and_grad(loss_fn)(p)
        losses.append(float(l))
        up, opt = tx.update(gr, opt, p)
        p = optax.apply_updates(p, up)
    assert losses[-1] < losses[0] * 0.9, losses[:3] + losses[-3:]
    # the range params actually moved (LSQ gradients are live)
    assert abs(float(p["xd1"] - params["xd1"])) > 0
    assert abs(float(p["wd2"] - params["wd2"])) > 0


# ---------------------------------------------------------------------------
# Integration: the real QAT train step on the int8 MXU forward
# ---------------------------------------------------------------------------


def _bert_setup():
    import functools

    from transformer_quantization_tpu.models import bert as B
    from transformer_quantization_tpu.training import qat as QAT
    import __graft_entry__ as G

    # dropout 0 like the reference QAT recipe (README.md:190): hidden
    # dropout between an act site and its consumer disables the int8 path
    cfg = B.BertConfig(vocab_size=128, hidden_size=64, num_hidden_layers=2,
                       num_attention_heads=4, intermediate_size=128,
                       max_position_embeddings=64, num_labels=2,
                       hidden_dropout_prob=0.0,
                       attention_probs_dropout_prob=0.0)
    params, qcfg, qstate = G._calibrated_bert(cfg, batch_size=2, seq=16)
    rng = np.random.RandomState(4)
    batch = {
        "input_ids": jnp.asarray(rng.randint(0, 128, (4, 16)), jnp.int32),
        "attention_mask": jnp.ones((4, 16), jnp.float32),
        "token_type_ids": jnp.zeros((4, 16), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 2, (4,)), jnp.int32),
    }
    apply_fn = functools.partial(B.bert_apply, cfg=cfg)
    return QAT, apply_fn, cfg, params, qcfg, qstate, batch


def test_int8_forward_sites_eligibility():
    QAT, apply_fn, cfg, params, qcfg, qstate, batch = _bert_setup()
    sites = QAT.int8_forward_sites(qcfg, qstate)
    # every encoder matmul is symmetric-signed int8 x per-tensor-asym act
    assert "L0.attn.q" in sites and "L1.ffn.dense" in sites
    assert "pooler.dense" in sites
    # scan-generic names included (all layers eligible)
    assert "L.attn.q" in sites


@pytest.mark.parametrize("learn", ["estimate", False, True],
                         ids=["estimate-ranges", "fixed-ranges",
                              "learn-ranges"])
def test_int8_qat_step_matches_float_step(learn, monkeypatch):
    """One full QAT train step with the int8-MXU forward stays close to
    the float fake-quant step, AND the int8 path is actually taken for
    every eligible matmul.

    Tolerances are boundary-flip bounds, not GEMM ulps: the int32
    accumulation is exact where the f32 GEMM rounds, and any activation
    whose exact value sits within an ulp of a fake-quant rounding
    boundary lands on a different 8-bit level, shifting downstream
    values by whole quantization steps — the same amplification the
    pipeline/scan parity tests document."""
    from transformer_quantization_tpu.training import int8_qat as IQ

    QAT, apply_fn, cfg, params, qcfg, qstate, batch = _bert_setup()
    tx = optax.adamw(1e-4)
    calls = {"n": 0}
    orig = IQ.int8_qat_linear

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(IQ, "int8_qat_linear", counting)

    outs = {}
    for use_int8 in (False, True):
        calls["n"] = 0
        sites = (QAT.int8_forward_sites(qcfg, qstate) if use_int8
                 else None)
        if learn == "estimate":
            # estimate_ranges_train: both ranges re-derived per step
            qat_cfg = QAT.QATConfig(int8_sites=sites)
        else:
            qat_cfg = QAT.QATConfig(learn_ranges=learn,
                                    fix_weight_ranges=True,
                                    fix_act_ranges=True, int8_sites=sites)
        step = QAT.make_qat_train_step(apply_fn, qcfg, qat_cfg, tx,
                                       donate=False)
        p, learnable, rest, opt = QAT.init_qat_state(
            qcfg, qat_cfg, jax.tree.map(jnp.copy, params),
            jax.tree.map(jnp.copy, dict(qstate)), tx)
        outs[use_int8] = step(p, learnable, rest, opt, batch,
                              jax.random.PRNGKey(0))
        if use_int8:
            # 2 layers x (q,k,v,attn_out,inter,dense) + pooler + classifier
            assert calls["n"] == 14, calls["n"]
        else:
            assert calls["n"] == 0
    loss_f, loss_i = float(outs[False][-1]), float(outs[True][-1])
    np.testing.assert_allclose(loss_i, loss_f, rtol=5e-4, atol=5e-4)
    lr = 1e-4
    for a, b in zip(jax.tree.leaves(outs[True][0]),
                    jax.tree.leaves(outs[False][0])):
        # one AdamW step: a boundary-flipped gradient moves a param by
        # at most ~2*lr relative to the float step
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2.5 * lr)
    for a, b in zip(jax.tree.leaves(outs[True][1]),
                    jax.tree.leaves(outs[False][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2.5 * lr)


def test_cli_int8_qat_forward_runs():
    from transformer_quantization_tpu import cli

    s = cli.main(["train-quantized", "--task", "rte", "--synthetic-data",
                  "--num-train-samples", "16", "--num-val-samples", "16",
                  "--batch-size", "8", "--eval-batch-size", "8",
                  "--num-epochs", "1", "--tiny-model",
                  "--learn-ranges", "--int8-qat-forward",
                  "--hidden-dropout", "0.0", "--attn-dropout", "0.0",
                  "--weight-quant-method", "current_minmax",
                  "--act-quant-method", "current_minmax"])
    assert 0.0 <= s <= 1.0


def test_cli_int8_qat_forward_roberta():
    """The int8-QAT forward plumbs through every family's apply; RoBERTa
    exercises the non-BERT path end-to-end from the CLI."""
    from transformer_quantization_tpu import cli

    s = cli.main(["train-quantized", "--task", "rte", "--synthetic-data",
                  "--num-train-samples", "16", "--num-val-samples", "16",
                  "--batch-size", "8", "--eval-batch-size", "8",
                  "--num-epochs", "1", "--tiny-model",
                  "--model-name", "roberta_base",
                  "--learn-ranges", "--int8-qat-forward",
                  "--hidden-dropout", "0.0", "--attn-dropout", "0.0",
                  "--weight-quant-method", "current_minmax",
                  "--act-quant-method", "current_minmax"])
    assert 0.0 <= s <= 1.0


def test_dropout_disables_int8_forward(monkeypatch):
    """Training with hidden dropout > 0 must NOT take the int8 path:
    dropout rescales survivors off the producer's grid, which the exact
    level reconstruction cannot represent (models/bert.py
    int8_sites_for_mode). Eval (no dropout) keeps it."""
    import dataclasses
    import functools

    from transformer_quantization_tpu.models import bert as B
    from transformer_quantization_tpu.training import int8_qat as IQ
    from transformer_quantization_tpu.training import qat as QAT
    import __graft_entry__ as G

    cfg = B.BertConfig(vocab_size=128, hidden_size=64, num_hidden_layers=2,
                       num_attention_heads=4, intermediate_size=128,
                       max_position_embeddings=64, num_labels=2,
                       hidden_dropout_prob=0.1)
    params, qcfg, qstate = G._calibrated_bert(cfg, batch_size=2, seq=16)
    sites = QAT.int8_forward_sites(qcfg, qstate)
    assert sites
    calls = {"n": 0}
    orig = IQ.int8_qat_linear

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(IQ, "int8_qat_linear", counting)
    rng = np.random.RandomState(0)
    batch = {"input_ids": jnp.asarray(rng.randint(0, 128, (2, 16)),
                                      jnp.int32),
             "attention_mask": jnp.ones((2, 16), jnp.float32)}
    mode = QAT.qat_mode(QAT.QATConfig(fix_weight_ranges=True,
                                      fix_act_ranges=True))
    # train=True with dropout: float path only
    B.bert_apply(params, batch, cfg, qcfg, qstate, mode, train=True,
                 dropout_rng=jax.random.PRNGKey(0),
                 int8_qat_sites=sites)
    assert calls["n"] == 0
    # eval (dropout inactive): int8 path active
    B.bert_apply(params, batch, cfg, qcfg, qstate, mode, train=False,
                 int8_qat_sites=sites)
    assert calls["n"] == 14
    # dropout 0 config trains on the int8 path
    cfg0 = dataclasses.replace(cfg, hidden_dropout_prob=0.0)
    calls["n"] = 0
    B.bert_apply(params, batch, cfg0, qcfg, qstate, mode, train=True,
                 dropout_rng=jax.random.PRNGKey(0),
                 int8_qat_sites=sites)
    assert calls["n"] == 14


def test_scan_layers_int8_forward_matches_loop(monkeypatch):
    """--scan-layers + int8_sites: the generic "L." site names resolve
    inside the scanned body for the matmuls with a static input site
    (attn_out/inter/dense + head), and the step matches the loop-form
    int8 step."""
    from transformer_quantization_tpu.training import int8_qat as IQ

    QAT, apply_fn, cfg, params, qcfg, qstate, batch = _bert_setup()
    tx = optax.adamw(1e-4)
    sites = QAT.int8_forward_sites(qcfg, qstate)
    calls = {"n": 0}
    orig = IQ.int8_qat_linear

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(IQ, "int8_qat_linear", counting)
    outs = {}
    for scan in (False, True):
        calls["n"] = 0
        qat_cfg = QAT.QATConfig(learn_ranges=True, int8_sites=sites,
                                scan_layers=scan)
        step = QAT.make_qat_train_step(apply_fn, qcfg, qat_cfg, tx,
                                       donate=False)
        p, learnable, rest, opt = QAT.init_qat_state(
            qcfg, qat_cfg, jax.tree.map(jnp.copy, params),
            jax.tree.map(jnp.copy, dict(qstate)), tx)
        outs[scan] = step(p, learnable, rest, opt, batch,
                          jax.random.PRNGKey(0))
        # loop: 12 encoder matmuls + pooler + classifier. scan: ONE
        # traced layer body — q/k/v consume the scan-CARRIED input-site
        # params (their input site has no static name: emb.ln.out at
        # layer 0, ffn.ln.out after; _scan_encoder threads the producing
        # site's qp through the carry), so all 6 layer matmuls + pooler
        # + classifier take the int8 path = 8 traced calls.
        assert calls["n"] == (8 if scan else 14), (scan, calls["n"])
    np.testing.assert_allclose(float(outs[True][-1]),
                               float(outs[False][-1]), rtol=1e-5,
                               atol=1e-6)
    for a, b in zip(jax.tree.leaves(outs[True][0]),
                    jax.tree.leaves(outs[False][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
