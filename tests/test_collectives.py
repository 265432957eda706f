"""Quantized collectives under shard_map on the virtual 8-device mesh."""

import jax
from jax import shard_map
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from transformer_quantization_tpu.parallel import collectives as C


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 virtual devices")
    return Mesh(np.array(jax.devices()[:4]), ("tp",))


def test_quantize_roundtrip_error_bound():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(0, 3.0, (16, 64)), jnp.float32)
    q, s = C.quantize_shard(x)
    back = C.dequantize_shard(q, s)
    err = np.abs(np.asarray(back - x))
    bound = np.asarray(s) / 2.0 + 1e-6
    assert np.all(err <= bound)


def test_all_gather_int8_close_to_exact(mesh):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.normal(0, 1.0, (8, 32)), jnp.float32)

    def f(xs):
        return C.all_gather_int8(xs, "tp", axis=-1)

    got = jax.jit(shard_map(f, mesh=mesh, in_specs=P(None, "tp"),
                            out_specs=P(None, None), check_vma=False))(x)
    assert got.shape == x.shape
    # error bounded by per-row shard absmax / 127 / 2
    err = float(jnp.max(jnp.abs(got - x)))
    assert err < float(jnp.max(jnp.abs(x))) / 127.0 + 1e-5


def test_row_parallel_matmul_int8(mesh):
    rng = np.random.RandomState(2)
    K, N, Bs = 64, 16, 8
    x = jnp.asarray(rng.normal(0, 1.0, (Bs, K)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.2, (N, K)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.1, (N,)), jnp.float32)
    exact = x @ w.T + b

    def f(xs, ws):
        return C.tp_row_parallel_matmul_int8_gather(xs, ws, "tp", bias=b)

    got = jax.jit(shard_map(f, mesh=mesh, in_specs=(P(None, "tp"),
                                                    P(None, "tp")),
                            out_specs=P(None, None), check_vma=False))(x, w)
    # relative error small vs int8-compressed partials
    rel = float(jnp.max(jnp.abs(got - exact)) / jnp.max(jnp.abs(exact)))
    assert rel < 0.02, rel


def test_psum_scatter_int8(mesh):
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.normal(0, 1.0, (8, 16)), jnp.float32)

    def f(xs):
        return C.psum_scatter_int8(xs, "tp", scatter_dimension=0)

    got = jax.jit(shard_map(f, mesh=mesh, in_specs=P(None, None),
                            out_specs=P("tp", None), check_vma=False))(x)
    # every shard holds the same x here, so the reduction is 4*x scattered
    exact = 4.0 * x
    rel = float(jnp.max(jnp.abs(got - exact)) / jnp.max(jnp.abs(exact)))
    assert got.shape == x.shape
    assert rel < 0.02, rel


def test_psum_scatter_int8_matches_lax_psum_scatter(mesh):
    """Ring RS vs jax.lax.psum_scatter on per-device-distinct data."""
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.normal(0, 1.0, (4, 8, 16)), jnp.float32)

    def f(xs):
        xs = xs[0]  # (8, 16) local, distinct per device
        ours = C.psum_scatter_int8(xs, "tp", scatter_dimension=0)
        exact = jax.lax.psum_scatter(xs, "tp", scatter_dimension=0,
                                     tiled=True)
        return ours[None], exact[None]

    ours, exact = jax.jit(shard_map(
        f, mesh=mesh, in_specs=P("tp", None, None),
        out_specs=(P("tp", None, None), P("tp", None, None)),
        check_vma=False))(x)
    assert ours.shape == exact.shape == (4, 2, 16)
    rel = float(jnp.max(jnp.abs(ours - exact)) / jnp.max(jnp.abs(exact)))
    # n-1 = 3 requantized hops; per-hop error ~absmax/254
    assert rel < 0.05, rel


def test_psum_scatter_int8_scatter_last_dim(mesh):
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.normal(0, 1.0, (4, 8, 16)), jnp.float32)

    def f(xs):
        xs = xs[0]
        ours = C.psum_scatter_int8(xs, "tp", scatter_dimension=-1)
        exact = jax.lax.psum_scatter(xs, "tp", scatter_dimension=1,
                                     tiled=True)
        return ours[None], exact[None]

    ours, exact = jax.jit(shard_map(
        f, mesh=mesh, in_specs=P("tp", None, None),
        out_specs=(P("tp", None, None), P("tp", None, None)),
        check_vma=False))(x)
    assert ours.shape == exact.shape == (4, 8, 4)
    rel = float(jnp.max(jnp.abs(ours - exact)) / jnp.max(jnp.abs(exact)))
    assert rel < 0.05, rel
