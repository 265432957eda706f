"""Ablation: where does the quantized BERT forward spend its time?

Variants timed on the same model/batch:
  dense_f32      plain f32 model, no quant
  dense_bf16     plain bf16 model, no quant
  w_only_int8    int8 matmuls, NO activation quant sites
  w_only_fake    fake-quant weights only (simulation), no act sites
  full_int8      int8 matmuls + all act sites (f32)
  full_fake      full fake-quant simulation (reference semantics)
  act_only       act sites only, weights fp
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from transformer_quantization_tpu.models import bert as B
from transformer_quantization_tpu.quant.qconfig import QuantMode
import __graft_entry__ as G


def timed(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    cfg = B.BertConfig()
    params, qcfg, qstate = G._calibrated_bert(cfg, batch_size=2, seq=128)
    int_params = jax.jit(
        lambda p, qs: B.build_bert_int_params(p, qcfg, qs))(params, qstate)
    rng = np.random.RandomState(0)
    Bs, S = 32, 128
    batch = {
        "input_ids": jnp.asarray(rng.randint(0, cfg.vocab_size, (Bs, S)),
                                 jnp.int32),
        "attention_mask": jnp.ones((Bs, S), jnp.float32),
        "token_type_ids": jnp.zeros((Bs, S), jnp.int32),
    }
    fp = QuantMode(weight_quant=False, act_quant=False)
    w_only = QuantMode(weight_quant=True, act_quant=False)
    full = QuantMode()

    params_bf16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if isinstance(x, jax.Array) and x.dtype == jnp.float32 else x, params)

    def make(mode, ip=None, cdt=None, use_pallas=False, p=None):
        @jax.jit
        def step(pp, batch):
            out, _ = B.bert_apply(pp, batch, cfg, qcfg, qstate, mode,
                                  int_params=ip, compute_dtype=cdt,
                                  use_pallas=use_pallas)
            return out["logits"]
        return step, (p if p is not None else params)

    variants = {
        "dense_f32": make(fp),
        "dense_bf16": make(fp, p=params_bf16),
        "w_only_int8": make(w_only, ip=int_params),
        "w_only_fake": make(w_only),
        "act_only": make(QuantMode(weight_quant=False, act_quant=True)),
        "full_int8": make(full, ip=int_params),
        "full_fake": make(full),
        "full_int8_bf16": make(full, ip=int_params, cdt=jnp.bfloat16),
        "w_only_int8_bf16": make(w_only, ip=int_params, cdt=jnp.bfloat16),
    }
    for name, (step, p) in variants.items():
        t = timed(step, p, batch)
        print(f"{name:18s} {t*1e3:7.2f} ms  {Bs/t:8.1f} seq/s", flush=True)


if __name__ == "__main__":
    main()
