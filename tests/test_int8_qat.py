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
