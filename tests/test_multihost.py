"""Multi-host runtime helpers (parallel/multihost.py) — single-process form:
initialize() must be a no-op, shard-bound slicing must tile exactly."""

import numpy as np

from vector_db_id_compression_tpu.parallel import multihost


def test_initialize_single_process_noop(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    multihost.initialize()  # must not raise / must not touch jax.distributed


def test_shard_bounds_cover_exactly():
    lo, hi = multihost.process_shard_bounds(100)
    assert (lo, hi) == (0, 100)  # single process owns everything
    arr = np.arange(10)
    np.testing.assert_array_equal(multihost.host_local_slice(arr), arr)


def test_global_lists_mesh():
    mesh = multihost.global_lists_mesh(4)
    assert mesh.axis_names == ("lists",)
    assert mesh.size == 4
