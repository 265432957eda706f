"""Model-level sweep of the attention megakernel's tiling knobs.

Times the full BERT-base engine step while overriding the attention
kernel's (group, batch_block) statics — model-level because isolated
kernel timings overstate memory costs (NOTES: XLA gives in-model kernel
payloads S(1) VMEM placement).

    timeout 2400 python -u scripts/attn_sweep.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from transformer_quantization_tpu.models import bert as B  # noqa: E402
from transformer_quantization_tpu.ops.pallas import engine_kernels as EK  # noqa: E402
import __graft_entry__ as G  # noqa: E402


def _sync(out):
    return float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])


def timed(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    batch, seq = 128, 128
    cfg = B.BertConfig()
    params, qcfg, qstate = G._calibrated_bert(cfg, batch_size=2, seq=seq)
    int_params = jax.jit(
        lambda p, qs: B.build_bert_int_params(p, qcfg, qs))(params, qstate)
    static, plan, _ = B.build_bert_engine(params, cfg, qcfg, qstate,
                                          int_params=int_params)
    rng = np.random.RandomState(0)
    b = {
        "input_ids": jnp.asarray(
            rng.randint(0, cfg.vocab_size, (batch, seq)), jnp.int32),
        "attention_mask": jnp.ones((batch, seq), jnp.float32),
        "token_type_ids": jnp.zeros((batch, seq), jnp.int32),
    }
    orig = EK.int8_layer_ln

    # round 4: the engine's layer route is int8_layer_ln and the default
    # dots mode is shifted-bf16 (group=1 auto); sweep its tiling knobs
    for g, bb in [(1, 4), (1, 2), (1, 8), (2, 4), (2, 8), (1, 16)]:
        def patched(*a, group=None, batch_block=None, **k):
            return orig(*a, group=g, batch_block=bb, **k)

        EK.int8_layer_ln = patched

        @jax.jit
        def step(params, plan, int_params, b):
            return B.bert_engine_apply(
                params, b, cfg, qcfg, qstate, static, plan, int_params,
                backend="pallas", engine_dtype=jnp.bfloat16)["logits"]

        try:
            t = timed(step, params, plan, int_params, b)
            print(f"group={g} bb={bb}: {t * 1e3:.2f} ms "
                  f"{batch / t:.1f} seq/s", flush=True)
        except Exception as e:
            print(f"group={g} bb={bb}: FAILED {type(e).__name__}: "
                  f"{str(e)[:140]}", flush=True)
    EK.int8_layer_ln = orig


if __name__ == "__main__":
    main()
