"""Profiling helpers + multi-host mesh utilities (single-process forms)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer_quantization_tpu.parallel import multihost as MH
from transformer_quantization_tpu.utils.profiling import PhaseTimer, trace


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("calibrate"):
        jnp.ones(8).block_until_ready()
    with t.phase("calibrate"):
        pass
    with t.phase("eval"):
        pass
    totals = t.totals()
    assert set(totals) == {"calibrate", "eval"}
    assert totals["calibrate"] >= 0
    assert "calibrate" in t.report()


def test_trace_noop():
    with trace(None):
        jnp.ones(4).block_until_ready()


def test_trace_writes(tmp_path):
    d = str(tmp_path / "prof")
    with trace(d):
        jax.jit(lambda x: x * 2)(jnp.ones(16)).block_until_ready()
    import os

    found = any("plugins" in r or f for r, _, f in os.walk(d))
    assert found


def test_global_mesh_single_process():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = MH.global_mesh(tp=4)
    assert mesh.shape == {"dp": 2, "tp": 4}
    MH.initialize()  # no-op without coordination env


def test_host_local_batch_to_global():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = MH.global_mesh(tp=1)
    batch = {"input_ids": np.ones((8, 4), np.int32)}
    g = MH.host_local_batch_to_global(batch, mesh)
    assert g["input_ids"].shape == (8, 4)
