"""Model-level A/B of engine-kernel knobs on the real TPU.

Builds ONE calibrated BERT-base, then loop-times the engine forward
under each setting of a trace-time env knob. The kernel entry points are
module-level ``jax.jit`` functions whose trace caches key only on
avals/statics — NOT on the env knob — so ``jax.clear_caches()`` runs
between variants to force a fresh trace (and hence fresh
``CompilerParams``) per value; without it every variant after the first
reuses the first variant's executables and the A/B is void.

    JAX_COMPILATION_CACHE_DIR=/root/repo/.jaxcache \
        timeout 3000 python -u scripts/engine_ab.py TQ_DIMSEM '' parallel arbitrary
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bench import timed_loop  # noqa: E402
from transformer_quantization_tpu.models import bert as B  # noqa: E402
import __graft_entry__ as G  # noqa: E402

BATCH, SEQ = 128, 128


def main():
    knob = sys.argv[1] if len(sys.argv) > 1 else "TQ_DIMSEM"
    values = sys.argv[2:] or ["", "parallel"]

    cfg = B.BertConfig()
    params, qcfg, qstate = G._calibrated_bert(cfg, batch_size=2, seq=SEQ)
    int_params = jax.jit(
        lambda p, qs: B.build_bert_int_params(p, qcfg, qs))(params, qstate)
    static, plan, _ = B.build_bert_engine(params, cfg, qcfg, qstate,
                                          int_params=int_params)
    rng = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(
            rng.randint(0, cfg.vocab_size, (BATCH, SEQ)), jnp.int32),
        "attention_mask": jnp.ones((BATCH, SEQ), jnp.float32),
        "token_type_ids": jnp.zeros((BATCH, SEQ), jnp.int32),
    }

    for val in values:
        if val:
            os.environ[knob] = val
        else:
            os.environ.pop(knob, None)
        # drop cached jaxprs/executables of the module-level jitted
        # kernels so the knob (read at trace time) actually takes effect
        jax.clear_caches()

        @jax.jit
        def engine_step(params, plan, int_params, batch):
            return B.bert_engine_apply(
                params, batch, cfg, qcfg, qstate, static, plan, int_params,
                backend="pallas", engine_dtype=jnp.bfloat16)["logits"]

        t0 = time.perf_counter()
        t = timed_loop(engine_step, params, plan, int_params, batch,
                       iters=20)
        print(f"# {knob}={val or '(unset)'}: {t * 1e3:7.3f} ms  "
              f"{BATCH / t:7.1f} seq/s  (compile+run "
              f"{time.perf_counter() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
