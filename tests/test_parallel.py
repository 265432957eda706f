"""Multi-chip sharding on the virtual 8-device CPU mesh (SURVEY.md §2.6):
parity of sharded vs single-device forward for every model family."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from transformer_quantization_tpu.models.registry import get_family
from transformer_quantization_tpu.parallel import mesh as MX
from transformer_quantization_tpu.quant.qconfig import QuantDefaults
from transformer_quantization_tpu.quant.quantizers import QMethod
from transformer_quantization_tpu.quant.ranges import RangeMethod
from transformer_quantization_tpu.training.calibration import (
    prepare_quantized_model,
)

TINY = {
    "bert": dict(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                 num_attention_heads=4, intermediate_size=64,
                 max_position_embeddings=64, num_labels=2),
    "roberta": dict(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                    num_attention_heads=4, intermediate_size=64,
                    max_position_embeddings=66, num_labels=2),
    "mobilebert": dict(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                       num_attention_heads=4, intermediate_size=32,
                       embedding_size=8, intra_bottleneck_size=16,
                       max_position_embeddings=64, num_labels=2),
}


@pytest.mark.parametrize("family", ["bert", "roberta", "mobilebert"])
def test_sharded_quantized_forward_matches_single_device(family):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    fam = get_family(family)
    cfg = fam.config_cls(**TINY[family])
    params = fam.init_params(jax.random.PRNGKey(0), cfg)
    d = QuantDefaults(method=QMethod.symmetric_uniform,
                      act_method=QMethod.asymmetric_uniform, n_bits=8,
                      weight_range_method=RangeMethod.current_minmax,
                      act_range_method=RangeMethod.current_minmax)
    qcfg = fam.declare_sites(d, cfg)
    rng = np.random.RandomState(0)
    batch = {"input_ids": jnp.asarray(rng.randint(2, 128, (8, 16)),
                                      jnp.int32),
             "attention_mask": jnp.ones((8, 16), jnp.float32)}
    apply_fn = functools.partial(fam.apply, cfg=cfg)
    qstate, mode = prepare_quantized_model(
        apply_fn, params, qcfg, [batch],
        weight_tensors=fam.weight_site_tensors(params))
    ref, _ = fam.apply(params, batch, cfg, qcfg, qstate, mode)

    mesh = MX.make_mesh(dp=2, tp=4)
    pspecs = MX.family_param_pspecs(family, cfg)
    sharded_params = MX.shard_params(params, mesh, pspecs=pspecs)
    sharded_batch = MX.shard_batch(batch, mesh)
    rep = NamedSharding(mesh, P())
    qstate_r = jax.tree.map(lambda x: jax.device_put(x, rep), qstate)

    @functools.partial(jax.jit, static_argnums=(3,))
    def fwd(p, b, qs, mode):
        out, _ = fam.apply(p, b, cfg, qcfg, qs, mode)
        return out["logits"]

    with jax.set_mesh(mesh):
        got = fwd(sharded_params, sharded_batch, qstate_r, mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref["logits"]),
                               rtol=2e-3, atol=1e-4)


@pytest.mark.parametrize("family", ["bert", "roberta"])
def test_sequence_parallel_forward_matches_single_device(family):
    """dp=2 x tp=2 x sp=2: the (B, T) inputs sharded over batch AND
    sequence (GSPMD gathers at the attention contraction; embeddings,
    LayerNorm, and FFN stay sequence-sharded) must be bit-comparable to
    the unsharded forward (SURVEY.md §5 long-context row: the sp seam)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    fam = get_family(family)
    cfg = fam.config_cls(**TINY[family])
    params = fam.init_params(jax.random.PRNGKey(0), cfg)
    d = QuantDefaults(method=QMethod.symmetric_uniform,
                      act_method=QMethod.asymmetric_uniform, n_bits=8,
                      weight_range_method=RangeMethod.current_minmax,
                      act_range_method=RangeMethod.current_minmax)
    qcfg = fam.declare_sites(d, cfg)
    rng = np.random.RandomState(0)
    batch = {"input_ids": jnp.asarray(rng.randint(2, 128, (4, 16)),
                                      jnp.int32),
             "attention_mask": jnp.ones((4, 16), jnp.float32)}
    apply_fn = functools.partial(fam.apply, cfg=cfg)
    qstate, mode = prepare_quantized_model(
        apply_fn, params, qcfg, [batch],
        weight_tensors=fam.weight_site_tensors(params))
    ref, _ = fam.apply(params, batch, cfg, qcfg, qstate, mode)

    mesh = MX.make_mesh(dp=2, tp=2, sp=2)
    pspecs = MX.family_param_pspecs(family, cfg)
    sharded_params = MX.shard_params(params, mesh, pspecs=pspecs)
    sharded_batch = MX.shard_batch(batch, mesh, seq_shard=True)
    rep = NamedSharding(mesh, P())
    qstate_r = jax.tree.map(lambda x: jax.device_put(x, rep), qstate)

    @functools.partial(jax.jit, static_argnums=(3,))
    def fwd(p, b, qs, mode):
        out, _ = fam.apply(p, b, cfg, qcfg, qs, mode)
        return out["logits"]

    with jax.set_mesh(mesh):
        got = fwd(sharded_params, sharded_batch, qstate_r, mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref["logits"]),
                               rtol=2e-3, atol=1e-4)
