"""Random Edge Coding (REC) — analytic Pólya-urn bits-per-edge model.

Reference parity: ``graph_static_bench_invlists.py:102-109`` calls the
external ``rec`` package's ``PolyasUrnModel(num_nodes, num_edges,
undirected=False).compute_bpe(graph)`` to get the offline (static) entropy
rate of a graph under one-shot bits-back edge coding (Severo et al., "Random
Edge Coding", ICML 2023 — the companion method to the vector-ID paper's
Table 3). This module provides a self-contained, dependency-free equivalent.

The math. A graph with m edges is presented as a sequence of 2m vertex
mentions; the Pólya urn with bias α assigns the t-th mention (t = 0..2m-1)
to vertex v with probability (deg_t(v) + α) / (t + nα), where deg_t counts
prior mentions of v. The sequence probability is exchangeable — it depends
only on the final degree sequence:

    P(seq) = [ Π_v Γ(d_v + α)/Γ(α) ] · Γ(nα) / Γ(2m + nα)

Bits-back recovers the presentation order of the edge sequence —
log2(m!) bits for the m! edge orderings, plus m bits for the two
per-edge vertex orders when the graph is undirected — so

    BPE = [ -log2 P(seq) - log2 m! - m·1{undirected} ] / m.

(For graphs with duplicate edges the m! term overcounts by the multiset
permutation multiplicities; ANN adjacency lists are duplicate-free per node,
and the reference's REC invocation makes the same simplification.)

Everything is evaluated in log-gamma space, vectorized over the degree
histogram, so a billion-edge graph costs O(n) host work (or run
:func:`polya_urn_bits` under jit for device evaluation).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import numpy as np

LN2 = math.log(2.0)


def _gammaln(x: np.ndarray) -> np.ndarray:
    try:
        from scipy.special import gammaln
        return gammaln(x)
    except ImportError:  # pragma: no cover - scipy is present in this image
        return np.vectorize(math.lgamma)(np.asarray(x, dtype=np.float64))


def degrees_from_edges(edge_array: np.ndarray, num_nodes: int,
                       undirected: bool = False) -> np.ndarray:
    """Vertex-mention counts: every edge mentions both endpoints once."""
    edge_array = np.asarray(edge_array).reshape(-1, 2)
    deg = np.bincount(edge_array.reshape(-1), minlength=num_nodes)
    return deg.astype(np.int64)


@dataclass
class PolyasUrnModel:
    """Analytic PU model; same constructor shape as the external ``rec``
    package used by the reference (num_nodes, num_edges, undirected)."""

    num_nodes: int
    num_edges: int
    undirected: bool = False
    alpha: float = 1.0

    def sequence_bits(self, degrees: np.ndarray) -> float:
        """-log2 P(vertex-mention sequence) under the urn."""
        n, m, a = self.num_nodes, self.num_edges, self.alpha
        deg = np.asarray(degrees, dtype=np.float64)
        assert deg.sum() == 2 * m, "degree sum must be 2*num_edges"
        # Π_v Γ(d_v + α)/Γ(α): only vertices with d_v > 0 contribute
        nz = deg[deg > 0]
        log_num = _gammaln(nz + a).sum() - len(nz) * math.lgamma(a)
        log_den = math.lgamma(2 * m + n * a) - math.lgamma(n * a)
        return float((log_den - log_num) / LN2)

    def bits_back_savings(self) -> float:
        m = self.num_edges
        save = math.lgamma(m + 1) / LN2  # log2 m! edge orderings
        if self.undirected:
            save += m  # per-edge direction bit
        return save

    def compute_bpe(self, graph) -> tuple:
        """graph: object with ``edge_array`` [m, 2] (and optionally
        ``num_nodes``/``num_edges``). Returns (total_bits, bits_per_edge) —
        the reference consumes only the second element
        (graph_static_bench_invlists.py:109)."""
        edges = np.asarray(graph.edge_array).reshape(-1, 2)
        deg = degrees_from_edges(edges, self.num_nodes)
        total = self.sequence_bits(deg) - self.bits_back_savings()
        return total, total / max(self.num_edges, 1)


@dataclass
class Graph:
    """Edge-list graph container matching ``rec.definitions.Graph`` as used
    at graph_static_bench_invlists.py:97-101."""

    edge_array: np.ndarray
    num_nodes: int
    num_edges: int


def friend_to_edgelist_repr(graph_friends) -> np.ndarray:
    """Adjacency (list of friend arrays, -1 padded) → directed edge list
    [m, 2]; parity with graph_static_bench_invlists.py:22-25."""
    rows = []
    for v, friends in enumerate(graph_friends):
        f = np.asarray(friends)
        f = f[f >= 0]
        if len(f):
            rows.append(np.stack([np.full(len(f), v, dtype=np.int64),
                                  f.astype(np.int64)], axis=1))
    if not rows:
        return np.zeros((0, 2), dtype=np.int64)
    return np.concatenate(rows, axis=0)
