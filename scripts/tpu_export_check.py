"""Export-on-TPU check (NOTES to-do #5): build a tiny calibrated
real-int model, save a multi-platform (cpu+tpu) StableHLO artifact,
deserialize it, and run one batch on the live device, comparing against
the direct forward. Exercises serving/export.py's jax.export path end to
end on real hardware (the CI tests only cover the CPU platform).

Run:  JAX_COMPILATION_CACHE_DIR=/root/repo/.jaxcache \
      python scripts/tpu_export_check.py
"""

import functools
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from transformer_quantization_tpu.models import bert as B
from transformer_quantization_tpu.quant.qconfig import QuantDefaults
from transformer_quantization_tpu.quant.quantizers import QMethod
from transformer_quantization_tpu.quant.ranges import RangeMethod
from transformer_quantization_tpu.serving import export as EX
from transformer_quantization_tpu.training.calibration import (
    prepare_quantized_model,
)


def main():
    print("devices:", jax.devices())
    cfg = B.BertConfig(vocab_size=128, hidden_size=64,
                       num_hidden_layers=2, num_attention_heads=2,
                       intermediate_size=128, max_position_embeddings=32,
                       num_labels=2)
    params = B.init_bert_params(jax.random.PRNGKey(0), cfg)
    d = QuantDefaults(method=QMethod.symmetric_uniform,
                      act_method=QMethod.asymmetric_uniform, n_bits=8,
                      weight_range_method=RangeMethod.current_minmax,
                      act_range_method=RangeMethod.current_minmax)
    qcfg = B.declare_bert_sites(d, cfg)
    rng = np.random.RandomState(0)
    cal = {"input_ids": jnp.asarray(rng.randint(0, 128, (4, 16)), jnp.int32),
           "attention_mask": jnp.ones((4, 16), jnp.float32)}
    qstate, mode = prepare_quantized_model(
        functools.partial(B.bert_apply, cfg=cfg), params, qcfg, [cal],
        weight_tensors=B.bert_weight_site_tensors(params))
    int_params = B.build_bert_int_params(params, qcfg, qstate)

    def fwd(ids, mask, tt):
        b = {"input_ids": ids, "attention_mask": mask,
             "token_type_ids": tt}
        out, _ = B.bert_apply(params, b, cfg, qcfg, qstate, mode,
                              int_params=int_params)
        return out["logits"]

    # engine-path export at a concrete (batch, seq) bucket: the Mosaic
    # megakernel custom calls ride the artifact (symbolic batch can't)
    static, plan, e_int = B.build_bert_engine(params, cfg, qcfg, qstate,
                                              int_params=int_params)
    on_cpu = jax.default_backend() == "cpu"

    def engine_fwd(ids, mask, tt):
        b = {"input_ids": ids, "attention_mask": mask,
             "token_type_ids": tt}
        return B.bert_engine_apply(
            params, b, cfg, qcfg, qstate, static, plan, e_int,
            backend="xla" if on_cpu else "pallas")["logits"]

    with tempfile.TemporaryDirectory() as td:
        EX.save_export(td, fwd, seq_buckets=[16],
                       engine_fwd=engine_fwd, engine_batch_buckets=[8],
                       meta={"family": "bert", "num_labels": 2,
                             "vocab_size": 128})
        model = EX.ExportedModel(td)
        assert model._engine_fns, "engine-bucket programs not loaded"
        batch = {"input_ids": rng.randint(0, 128, (8, 16)).astype(np.int32),
                 "attention_mask": np.ones((8, 16), np.float32),
                 "token_type_ids": np.zeros((8, 16), np.int32)}
        got = np.asarray(model(batch))  # (8, 16) -> engine bucket b8seq16
        eref = np.asarray(engine_fwd(jnp.asarray(batch["input_ids"]),
                                     jnp.asarray(batch["attention_mask"]),
                                     jnp.asarray(batch["token_type_ids"])))
        err_e = float(np.max(np.abs(got - eref)))
        print(f"engine-bucket artifact max_abs_err={err_e:.3e}")
        ref = np.asarray(fwd(jnp.asarray(batch["input_ids"]),
                             jnp.asarray(batch["attention_mask"]),
                             jnp.asarray(batch["token_type_ids"])))
        # oversized batch -> generic symbolic-batch program
        big = {k: np.concatenate([v, v]) for k, v in batch.items()}
        got_big = np.asarray(model(big))
        err = float(np.max(np.abs(got_big[:8] - ref)))
        print(f"platform={jax.devices()[0].platform} "
              f"generic max_abs_err={err:.3e}")
        ok = (np.allclose(got, eref, rtol=1e-5, atol=1e-5)
              and np.allclose(got_big[:8], ref, rtol=1e-5, atol=1e-5))
        print("EXPORT-ON-TPU:", "OK" if ok else "MISMATCH")
        return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
