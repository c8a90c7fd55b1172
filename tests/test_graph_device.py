"""Device-resident graph search (search/graph_device.py): exact equality
with the host loop for every adjacency container."""

import numpy as np
import pytest

from vector_db_id_compression_tpu.search.graph_device import (
    search_graph_device,
)
from vector_db_id_compression_tpu.search.nsg import build_nsg, search_graph
from vector_db_id_compression_tpu.store.graph import (
    CompactBitGraph,
    EliasFanoGraph,
    RocBlockGraph,
    RocGraph,
)

N, D, NQ, K = 500, 10, 15, 5


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(13)
    xb = rng.normal(size=(N, D)).astype(np.float32)
    xq = rng.normal(size=(NQ, D)).astype(np.float32)
    graph, medoid = build_nsg(xb, R=10)
    D_h, I_h, _ = search_graph(graph, xb, xq, K, entry=medoid)
    return xb, xq, graph, medoid, D_h, I_h


@pytest.mark.parametrize("container", [None, CompactBitGraph, EliasFanoGraph,
                                       RocGraph,
                                       lambda g: RocBlockGraph(g, block=4)])
def test_device_matches_host(setup, container):
    xb, xq, graph, medoid, D_h, I_h = setup
    g = graph if container is None else container(graph)
    D_d, I_d = search_graph_device(g, xb, xq, K, entry=medoid)
    np.testing.assert_array_equal(I_h, I_d)
    np.testing.assert_allclose(D_h, D_d, rtol=1e-5)


def test_iter_cap_degrades_gracefully(setup):
    """A tiny max_iters must still return the entry-seeded pool, not crash."""
    xb, xq, graph, medoid, D_h, I_h = setup
    D_d, I_d = search_graph_device(graph, xb, xq, K, entry=medoid,
                                   max_iters=2)
    assert I_d.shape == I_h.shape
    assert (I_d[:, 0] >= 0).all()
