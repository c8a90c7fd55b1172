"""REC / Pólya-urn analytic BPE (codecs/rec.py) — oracle: direct sequential
urn-probability product over an explicit mention sequence must equal the
exchangeable closed form."""

import math

import numpy as np

from vector_db_id_compression_tpu.codecs.rec import (
    Graph,
    PolyasUrnModel,
    degrees_from_edges,
    friend_to_edgelist_repr,
)

LN2 = math.log(2.0)


def urn_bits_direct(edges: np.ndarray, n: int, alpha: float) -> float:
    """-log2 P of the vertex-mention sequence, step by step."""
    deg = np.zeros(n)
    bits = 0.0
    t = 0
    for u, v in edges:
        for w in (u, v):
            p = (deg[w] + alpha) / (t + n * alpha)
            bits -= math.log(p) / LN2
            deg[w] += 1
            t += 1
    return bits


def test_sequence_bits_matches_direct_product():
    rng = np.random.default_rng(3)
    n, m = 12, 30
    edges = rng.integers(0, n, size=(m, 2))
    for alpha in (1.0, 0.5):
        model = PolyasUrnModel(n, m, alpha=alpha)
        deg = degrees_from_edges(edges, n)
        got = model.sequence_bits(deg)
        want = urn_bits_direct(edges, n, alpha)
        assert abs(got - want) < 1e-6 * max(1.0, want)


def test_sequence_bits_exchangeable():
    """Any permutation of the mention sequence gives the same probability."""
    rng = np.random.default_rng(4)
    n, m = 8, 20
    edges = rng.integers(0, n, size=(m, 2))
    b1 = urn_bits_direct(edges, n, 1.0)
    b2 = urn_bits_direct(edges[rng.permutation(m)], n, 1.0)
    assert abs(b1 - b2) < 1e-9 * max(1.0, b1)


def test_compute_bpe_interface():
    rng = np.random.default_rng(5)
    n, m = 100, 400
    edges = rng.integers(0, n, size=(m, 2))
    g = Graph(edge_array=edges, num_nodes=n, num_edges=m)
    model = PolyasUrnModel(n, m, undirected=False)
    total, bpe = model.compute_bpe(g)
    assert total == bpe * m
    # sanity: REC must beat raw 2*log2(n) bits per directed edge and stay
    # above 0 for a random (incompressible-degree) graph
    assert 0 < bpe < 2 * math.log2(n)
    # undirected saves exactly one more bit per edge
    _, bpe_u = PolyasUrnModel(n, m, undirected=True).compute_bpe(g)
    assert abs((bpe - bpe_u) - 1.0) < 1e-9


def test_friend_to_edgelist():
    adj = np.array([[1, 2, -1], [0, -1, -1], [-1, -1, -1]])
    edges = friend_to_edgelist_repr(adj)
    assert edges.tolist() == [[0, 1], [0, 2], [1, 0]]
