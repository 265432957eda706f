"""Two-process multihost worker: cross-process DCN code path on CPU.

The reference is strictly single-process (SURVEY.md §2.6); our
`parallel/multihost.py` wraps `jax.distributed.initialize`, and THIS
script is the end-to-end exercise: N processes join a coordination
service on localhost, build one global dp mesh spanning both processes'
CPU devices (gloo collectives = the DCN stand-in), assemble a global
batch from per-process local rows, run the real-int8 eval forward, and
check logit parity against the same batch computed single-process. Also
closes an int8 ring all-gather (parallel/collectives.py) ACROSS
processes.

Spawned by tests/test_multihost_process.py and __graft_entry__'s
dryrun_multihost:

    python scripts/multihost_worker.py <coordinator> <num_procs> <pid>

Prints (process 0 only): MULTIHOST OK process_count=N ...
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    coordinator, nprocs, pid = (sys.argv[1], int(sys.argv[2]),
                                int(sys.argv[3]))
    from transformer_quantization_tpu.parallel import multihost as MH

    MH.initialize(coordinator_address=coordinator, num_processes=nprocs,
                  process_id=pid)
    assert jax.process_count() == nprocs, jax.process_count()
    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    assert n_global == nprocs * n_local, (n_global, n_local)

    from transformer_quantization_tpu.models import bert as B
    from transformer_quantization_tpu.quant.qconfig import QuantMode
    import __graft_entry__ as G

    cfg = B.BertConfig(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                       num_attention_heads=2, intermediate_size=64,
                       max_position_embeddings=32, num_labels=2)
    # deterministic seed -> both processes build IDENTICAL params/ranges
    params, qcfg, qstate = G._calibrated_bert(cfg, batch_size=2, seq=16)
    int_params = B.build_bert_int_params(params, qcfg, qstate)
    mode = QuantMode()

    rng = np.random.RandomState(7)
    gbsz, seq = 2 * n_global, 16
    full = {
        "input_ids": rng.randint(0, 128, (gbsz, seq)).astype(np.int32),
        "attention_mask": np.ones((gbsz, seq), np.float32),
        "token_type_ids": np.zeros((gbsz, seq), np.int32),
    }
    # each process contributes only ITS local rows
    rows = gbsz // nprocs
    local = {k: v[pid * rows:(pid + 1) * rows] for k, v in full.items()}

    mesh = MH.global_mesh(tp=1)
    gbatch = MH.host_local_batch_to_global(local, mesh)
    repl = NamedSharding(mesh, P())
    gparams = jax.device_put(params, repl)
    gint = jax.device_put(int_params, repl)

    @jax.jit
    def fwd(params, int_params, batch):
        out, _ = B.bert_apply(params, batch, cfg, qcfg, qstate, mode,
                              int_params=int_params)
        # replicate the output so every process can read all rows
        return jax.lax.with_sharding_constraint(out["logits"], repl)

    glogits = np.asarray(
        fwd(gparams, gint, gbatch).addressable_data(0))

    # single-process oracle: same full batch on one local device
    sbatch = {k: jnp.asarray(v) for k, v in full.items()}
    out, _ = B.bert_apply(params, sbatch, cfg, qcfg, qstate, mode,
                          int_params=int_params)
    slogits = np.asarray(out["logits"])
    err = float(np.max(np.abs(glogits - slogits)))
    assert err < 1e-4, f"cross-process logit mismatch {err}"

    # int8 ring all-gather across the dp axis (spans both processes)
    from jax.experimental.shard_map import shard_map
    from transformer_quantization_tpu.parallel import collectives as C

    vec = rng.randn(n_global, 64).astype(np.float32)
    gvec = MH.host_local_batch_to_global(
        {"x": vec[pid * n_local:(pid + 1) * n_local]}, mesh)["x"]

    gat = shard_map(
        lambda x: C.all_gather_int8(x, axis_name="dp", axis=0),
        mesh=mesh, in_specs=P("dp"), out_specs=P(),
        check_rep=False)(gvec)
    got = np.asarray(gat.addressable_data(0))
    # int8 quantization of the wire payload: per-shard absmax/127 error
    tol = np.abs(vec).max() / 127.0 + 1e-6
    assert got.shape == vec.shape, (got.shape, vec.shape)
    assert np.max(np.abs(got - vec)) <= tol

    if pid == 0:
        print(f"MULTIHOST OK process_count={jax.process_count()} "
              f"global_devices={n_global} local_devices={n_local} "
              f"logit_err={err:.2e} int8_allgather_err="
              f"{float(np.max(np.abs(got - vec))):.4f}",
              flush=True)


if __name__ == "__main__":
    main()
