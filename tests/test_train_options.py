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
