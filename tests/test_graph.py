"""Graph index: build quality, compressed-graph equality (bit-identical D/I,
the reference's test_altid.py oracle), neighbor-set parity, trace coverage."""

import numpy as np
import pytest

from vector_db_id_compression_tpu.search.nsg import (
    build_nsg,
    search_and_trace,
    search_graph,
)
from vector_db_id_compression_tpu.store.graph import (
    CompactBitGraph,
    EliasFanoGraph,
    Graph,
    RocBlockGraph,
    RocGraph,
)

def _roc_block8(g):
    return RocBlockGraph(g, block=8)


N, D_, NQ, K, R = 600, 12, 20, 5, 12


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    xb = rng.normal(size=(N, D_)).astype(np.float32)
    xq = rng.normal(size=(NQ, D_)).astype(np.float32)
    graph, medoid = build_nsg(xb, R)
    return xb, xq, graph, medoid


def test_graph_structure(setup):
    xb, xq, graph, medoid = setup
    assert graph.N == N and graph.K == R
    assert (graph.degrees >= 1).all()
    # every node reachable from medoid (connectivity fix)
    seen = {medoid}
    stack = [medoid]
    while stack:
        for v in graph.get_neighbors(stack.pop()):
            if int(v) not in seen:
                seen.add(int(v))
                stack.append(int(v))
    assert len(seen) == N


def test_search_recall(setup):
    xb, xq, graph, medoid = setup
    d2 = ((xq[:, None, :] - xb[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(d2, axis=1)[:, :K]
    D, I, _ = search_graph(graph, xb, xq, K, L=40, entry=medoid)
    recall = np.mean([len(set(I[q]) & set(gt[q])) / K for q in range(NQ)])
    assert recall > 0.85, f"graph search recall@{K}: {recall}"


@pytest.mark.parametrize("variant", [CompactBitGraph, EliasFanoGraph,
                                     RocGraph, _roc_block8])
def test_neighbor_set_parity(setup, variant):
    xb, xq, graph, medoid = setup
    comp = variant(graph)
    nodes = np.arange(0, N, 37)
    nbrs, counts = comp.get_neighbors_batch(nodes)
    for i, node in enumerate(nodes):
        expect = set(int(v) for v in graph.get_neighbors(int(node)))
        got = set(int(v) for v in nbrs[i, : counts[i]])
        assert got == expect, f"node {node}: {got} != {expect}"
        assert counts[i] == graph.degrees[node]


@pytest.mark.parametrize("variant", [CompactBitGraph, EliasFanoGraph,
                                     RocGraph, _roc_block8])
def test_compressed_search_bit_identical(setup, variant):
    """Same neighbor sets => bit-identical search results
    (reference test_altid.py:43-44)."""
    xb, xq, graph, medoid = setup
    D_ref, I_ref, _ = search_graph(graph, xb, xq, K, L=30, entry=medoid)
    comp = variant(graph)
    D_c, I_c, _ = search_graph(comp, xb, xq, K, L=30, entry=medoid)
    np.testing.assert_array_equal(I_c, I_ref)
    np.testing.assert_array_equal(D_c, D_ref)


def test_size_accounting(setup):
    xb, xq, graph, medoid = setup
    compact = CompactBitGraph(graph)
    ef = EliasFanoGraph(graph)
    roc = RocGraph(graph)
    raw = N * R * 4
    assert compact.compressed_ids_size_in_bytes == N * compact.stride
    assert 0 < roc.compressed_ids_size_in_bytes < raw
    assert 0 < ef.compressed_ids_size_in_bytes < raw
    # ROC beats compact (log2(deg!) bits back per node)
    assert roc.compressed_ids_size_in_bytes < compact.compressed_ids_size_in_bytes


def test_trace_contains_results(setup):
    """Reference TestSearchTraced oracle: the trace must contain every
    returned id (test_altid.py:47-62)."""
    xb, xq, graph, medoid = setup
    I, D, visited = search_and_trace(graph, xb, xq, K, L=30, entry=medoid)
    vset = set(int(v) for v in visited)
    for q in range(NQ):
        for v in I[q]:
            if v >= 0:
                assert int(v) in vset


def test_roc_block_amortizes_head(setup):
    """Chaining a block through one ANS state amortizes the 8-byte head +
    stack word rounding: the blocked container must be markedly smaller than
    per-node ROC, and block=1 must reproduce the per-node streams exactly."""
    xb, xq, graph, medoid = setup
    roc = RocGraph(graph)
    blk = RocBlockGraph(graph, block=8)
    per_node_head = 8 * N  # bytes of ANS heads alone in the per-node format
    assert (blk.compressed_ids_size_in_bytes
            < roc.compressed_ids_size_in_bytes - per_node_head // 2)

    one = RocBlockGraph(graph, block=1)
    st1, st0 = one._states, roc._states
    np.testing.assert_array_equal(np.asarray(st1.head), np.asarray(st0.head))
    np.testing.assert_array_equal(np.asarray(st1.stack_len),
                                  np.asarray(st0.stack_len))
    l = int(np.asarray(st0.stack_len).max())
    np.testing.assert_array_equal(np.asarray(st1.stack)[:, :l],
                                  np.asarray(st0.stack)[:, :l])
