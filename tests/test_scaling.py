"""DP inference scaling harness on the virtual 8-device mesh.

Fixed-work mode on virtual CPU devices isolates GSPMD partitioning
overhead (total FLOPs are constant across mesh sizes); a DP forward has
no collectives, so efficiency must stay high. The same harness measures
real strong/weak scaling on hardware (parallel/scaling.py).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer_quantization_tpu.models import bert as B
from transformer_quantization_tpu.parallel import scaling as SC
from transformer_quantization_tpu.quant.qconfig import QuantMode

import __graft_entry__ as G


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = B.BertConfig(vocab_size=128, hidden_size=64, num_hidden_layers=2,
                       num_attention_heads=4, intermediate_size=128,
                       max_position_embeddings=64, num_labels=2)
    params, qcfg, qstate = G._calibrated_bert(cfg, batch_size=2, seq=16)
    int_params = B.build_bert_int_params(params, qcfg, qstate)

    def forward(params, batch):
        out, _ = B.bert_apply(params, batch, cfg, qcfg, qstate, QuantMode(),
                              int_params=int_params)
        return out["logits"]

    rng = np.random.RandomState(0)
    bsz = 64
    batch = {
        "input_ids": rng.randint(0, 128, (bsz, 16)).astype(np.int32),
        "attention_mask": np.ones((bsz, 16), np.float32),
        "token_type_ids": np.zeros((bsz, 16), np.int32),
    }
    return forward, params, batch


def test_dp_scaling_efficiency(setup):
    forward, params, batch = setup
    # wall-clock timing on a shared-core virtual mesh is load-sensitive
    # (CI runs the TPU bench on the same host); retry the whole table on
    # a transient dip rather than lowering the 0.8 bar
    for attempt in range(3):
        rows = SC.dp_scaling_table(forward, params, batch, ns=(1, 2, 4, 8),
                                   iters=3)
        assert set(rows) == {1, 2, 4, 8}
        for n, r in rows.items():
            assert r["global_batch"] == 64
            assert np.isfinite(r["seq_per_sec"])
        if min(r["speedup"] for r in rows.values()) >= 0.8:
            break
    # fixed-work on a shared-core virtual mesh: true strong efficiency
    # t1/(n*tn) cannot approach 1 (devices share cores); the partition-
    # overhead signal is the SPEEDUP staying near 1 on n>=2 rows
    assert min(r["speedup"] for n, r in rows.items() if n >= 2) >= 0.8, rows
    # and the strong-mode efficiency column must follow its definition
    for n, r in rows.items():
        np.testing.assert_allclose(r["efficiency"], r["speedup"] / n,
                                   rtol=1e-9)
    print("\n" + SC.format_scaling_table(rows))


def test_dp_sharded_matches_single_device(setup):
    forward, params, batch = setup
    from transformer_quantization_tpu.parallel.mesh import make_mesh

    single = jax.jit(forward)(params, {k: jnp.asarray(v)
                                       for k, v in batch.items()})
    mesh = make_mesh(dp=8, tp=1)
    sharded = SC.shard_for_dp(batch, mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    p = jax.device_put(params, NamedSharding(mesh, P()))
    out = jax.jit(forward)(p, sharded)
    np.testing.assert_allclose(np.asarray(out), np.asarray(single),
                               rtol=2e-4, atol=2e-4)


def test_dp_serving_engine(setup):
    """ServingEngine with a dp mesh: batches shard over devices, results
    match the single-device engine."""
    forward, params, batch = setup
    from transformer_quantization_tpu.parallel.mesh import make_mesh
    from transformer_quantization_tpu.serving.engine import (
        ServeConfig,
        ServingEngine,
    )

    mesh = make_mesh(dp=4, tp=1)
    from jax.sharding import NamedSharding, PartitionSpec as P

    p = jax.device_put(params, NamedSharding(mesh, P()))
    fwd = jax.jit(functools.partial(forward, p))
    cfg = ServeConfig(max_batch=8, seq_buckets=(16,),
                      batch_buckets=(1, 2, 4, 8), mesh=mesh)
    assert cfg is not None
    eng = ServingEngine(fwd, cfg)
    # dp=4 filters batch buckets to multiples of 4
    assert eng.cfg.batch_buckets == (4, 8)
    reqs = [batch["input_ids"][i][:16 - (i % 4)] for i in range(16)]
    with eng:
        m = eng.run_closed_loop(reqs, concurrency=8)
    assert m["requests"] == 16
    assert m["tokens_per_sec"] > 0


def test_tp_dp_serving_engine(setup):
    """ServingEngine over a dp=2 x tp=2 mesh with Megatron-style
    TP-sharded weights: GSPMD inserts the tp collectives inside the
    forward while the engine shards batch rows over dp; results match
    the single-device forward."""
    forward, params, batch = setup
    from transformer_quantization_tpu.parallel.mesh import (
        bert_param_pspecs,
        make_mesh,
    )
    from transformer_quantization_tpu.serving.engine import (
        ServeConfig,
        ServingEngine,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = B.BertConfig(vocab_size=128, hidden_size=64, num_hidden_layers=2,
                       num_attention_heads=4, intermediate_size=128,
                       max_position_embeddings=64, num_labels=2)
    mesh = make_mesh(dp=2, tp=2)
    p = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, bert_param_pspecs(cfg))
    fwd = jax.jit(functools.partial(forward, p))
    scfg = ServeConfig(max_batch=8, seq_buckets=(16,),
                       batch_buckets=(2, 4, 8), mesh=mesh)
    eng = ServingEngine(fwd, scfg)
    rng = np.random.RandomState(2)
    ids = rng.randint(1, 128, 16).astype(np.int32)
    with eng:
        logits = eng.submit_ids(ids).result(timeout=300)
    ref_batch = {"input_ids": jnp.asarray(ids)[None],
                 "attention_mask": jnp.ones((1, 16), jnp.float32),
                 "token_type_ids": jnp.zeros((1, 16), jnp.int32)}
    ref = jax.jit(forward)(params, ref_batch)
    np.testing.assert_allclose(logits, np.asarray(ref[0]),
                               rtol=2e-4, atol=2e-4)
