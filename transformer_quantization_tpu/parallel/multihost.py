"""Multi-host runtime (SURVEY.md §2.6 'No distributed backend' row).

The reference is strictly single-process. TPU-native scale-out:
``jax.distributed.initialize`` joins the hosts of a pod slice (ICI within
a slice, DCN across slices); after that, ``jax.devices()`` is global and
the same ``Mesh`` code in ``parallel/mesh.py`` spans hosts — GSPMD routes
collectives over ICI/DCN automatically. Helpers here wrap process
bootstrap, global mesh construction, and per-host data sharding.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the multi-host runtime.

    On Cloud TPU the three arguments auto-detect from the metadata server;
    elsewhere pass them (or set JAX_COORDINATOR_ADDRESS etc.). Safe to call
    when single-process: it no-ops if no coordination info is available.
    """
    # NB: do NOT probe jax.process_count() here — it initializes the XLA
    # backend, after which jax.distributed.initialize refuses to run.
    # The distributed client handle says whether we already joined.
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized
    kw = {}
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kw["coordinator_address"] = (coordinator_address or
                                     os.environ["JAX_COORDINATOR_ADDRESS"])
    if num_processes or os.environ.get("JAX_NUM_PROCESSES"):
        kw["num_processes"] = int(num_processes or
                                  os.environ["JAX_NUM_PROCESSES"])
    if process_id is not None or os.environ.get("JAX_PROCESS_ID"):
        kw["process_id"] = int(process_id if process_id is not None
                               else os.environ["JAX_PROCESS_ID"])
    if not kw:
        return
    jax.distributed.initialize(**kw)


def global_mesh(dp: Optional[int] = None, tp: int = 1) -> Mesh:
    """dp x tp mesh over ALL devices of all hosts; dp defaults to fill.

    tp should divide the devices of one host so tensor-parallel collectives
    stay on ICI; dp then spans hosts over DCN (the bandwidth-tolerant
    axis — batch gradients / independent serving shards).
    """
    devs = np.asarray(jax.devices())
    if dp is None:
        assert len(devs) % tp == 0
        dp = len(devs) // tp
    return Mesh(devs[: dp * tp].reshape(dp, tp), ("dp", "tp"))


def host_local_batch_to_global(batch, mesh: Mesh):
    """Assemble a global DP-sharded batch from per-host local arrays.

    Each host contributes its local rows;
    ``jax.make_array_from_process_local_data`` stitches the global array
    without gathering to any single host.
    """
    sharding = NamedSharding(mesh, P("dp"))
    return {k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
            for k, v in batch.items()}
