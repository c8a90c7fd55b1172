"""Graph-container artifacts (store/serialize.py save_graph/load_graph):
round-trip every container and assert identical neighbor sets + identical
search results + byte-stable files."""

import numpy as np
import pytest

from vector_db_id_compression_tpu.search.nsg import build_nsg, search_graph
from vector_db_id_compression_tpu.store.graph import (
    CompactBitGraph,
    EliasFanoGraph,
    Graph,
    RocBlockGraph,
    RocGraph,
)
from vector_db_id_compression_tpu.store.serialize import load_graph, save_graph

N, D, NQ, K = 400, 10, 10, 5


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(21)
    xb = rng.normal(size=(N, D)).astype(np.float32)
    xq = rng.normal(size=(NQ, D)).astype(np.float32)
    graph, medoid = build_nsg(xb, R=10)
    return xb, xq, graph, medoid


@pytest.mark.parametrize("factory", [lambda g: g, CompactBitGraph,
                                     EliasFanoGraph, RocGraph,
                                     lambda g: RocBlockGraph(g, block=8)])
def test_graph_round_trip(setup, factory, tmp_path):
    xb, xq, graph, medoid = setup
    g = factory(graph)
    path = tmp_path / "g.npz"
    save_graph(path, g)
    g2 = load_graph(path)
    assert type(g2) is type(g)
    assert (g2.N, g2.K) == (g.N, g.K)
    nodes = np.arange(N)
    nb1, c1 = g.get_neighbors_batch(nodes)
    nb2, c2 = g2.get_neighbors_batch(nodes)
    np.testing.assert_array_equal(c1, c2)
    for i in range(N):
        assert set(nb1[i, : c1[i]].tolist()) == set(nb2[i, : c2[i]].tolist())
    D1, I1, _ = search_graph(g, xb, xq, K, entry=medoid)
    D2, I2, _ = search_graph(g2, xb, xq, K, entry=medoid)
    np.testing.assert_array_equal(I1, I2)
    if not isinstance(g, Graph):
        assert g2.compressed_ids_size_in_bytes == g.compressed_ids_size_in_bytes


def test_graph_artifact_byte_stable(setup, tmp_path):
    _, _, graph, _ = setup
    g = RocGraph(graph)
    p1, p2 = tmp_path / "a.npz", tmp_path / "b.npz"
    save_graph(p1, g)
    save_graph(p2, g)
    assert p1.read_bytes() == p2.read_bytes()


def test_hnsw_round_trip(tmp_path):
    from vector_db_id_compression_tpu.search.hnsw import HNSW
    from vector_db_id_compression_tpu.store.serialize import (
        load_hnsw,
        save_hnsw,
    )

    rng = np.random.default_rng(31)
    xb = rng.normal(size=(300, 8)).astype(np.float32)
    xq = rng.normal(size=(10, 8)).astype(np.float32)
    h = HNSW(M=8, ef_construction=24).build(xb, batch=64)
    D1, I1 = h.search(xq, 5)
    p = tmp_path / "h.npz"
    save_hnsw(p, h)
    h2 = load_hnsw(p, xb)
    D2, I2 = h2.search(xq, 5)
    np.testing.assert_array_equal(I1, I2)
    np.testing.assert_allclose(D1, D2, rtol=1e-6)
