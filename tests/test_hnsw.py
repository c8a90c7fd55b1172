"""HNSW build/search (search/hnsw.py): recall vs brute force, level-0
adjacency validity, compressed-container substitution (the test_altid.py
same-neighbor-sets oracle applied to HNSW level 0)."""

import numpy as np
import pytest

from vector_db_id_compression_tpu.search.hnsw import HNSW, get_level0_links
from vector_db_id_compression_tpu.store.graph import (
    CompactBitGraph,
    EliasFanoGraph,
    RocGraph,
)

N, D, NQ, K = 600, 12, 25, 5


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(11)
    xb = rng.normal(size=(N, D)).astype(np.float32)
    xq = rng.normal(size=(NQ, D)).astype(np.float32)
    gt = np.argsort(((xb[None] - xq[:, None]) ** 2).sum(-1), axis=1)[:, :K]
    hnsw = HNSW(M=12, ef_construction=40).build(xb, batch=64)
    return xb, xq, gt, hnsw


def test_level0_structure(setup):
    xb, xq, gt, hnsw = setup
    adj0 = hnsw.layers[0]
    assert adj0.shape == (N, 24)
    deg = (adj0 >= 0).sum(axis=1)
    assert deg.min() >= 1                      # nobody isolated
    valid = adj0[adj0 >= 0]
    assert valid.max() < N
    # per-vertex helper matches the raw row
    row = get_level0_links(hnsw, 7)
    assert set(row.tolist()) == set(adj0[7][adj0[7] >= 0].tolist())


def test_search_recall(setup):
    xb, xq, gt, hnsw = setup
    D_, I = hnsw.search(xq, K, ef=48)
    recall = (I[:, :1] == gt[:, :1]).mean()
    assert recall >= 0.8, recall
    # distances ascending and consistent with returned ids
    d_check = ((xb[I[0]] - xq[0]) ** 2).sum(-1)
    np.testing.assert_allclose(D_[0], d_check, rtol=1e-4)


@pytest.mark.parametrize("container", [CompactBitGraph, EliasFanoGraph,
                                       RocGraph])
def test_compressed_level0_same_results(setup, container):
    """Identical (D, I) after swapping a compressed level-0 adjacency in —
    all containers return the same neighbor *sets* (test_altid.py:40-44)."""
    xb, xq, gt, hnsw = setup
    D_ref, I_ref = hnsw.search(xq, K, ef=48)
    g0 = container(hnsw.level0_graph())
    D_c, I_c = hnsw.search(xq, K, ef=48, graph0=g0)
    np.testing.assert_array_equal(I_ref, I_c)
    np.testing.assert_allclose(D_ref, D_c, rtol=1e-5)


def test_device_descent_matches_host(setup):
    """The one-dispatch upper-layer descent (graph_device.hnsw_descend_device)
    returns the same per-query level-0 entry points as the host greedy loop."""
    import jax.numpy as jnp

    from vector_db_id_compression_tpu.search.graph_device import (
        hnsw_descend_device,
    )

    xb, xq, gt, hnsw = setup
    got = hnsw_descend_device(hnsw, xq)

    # host oracle: the round-1 _greedy_descend loop per level, with the
    # queries passed explicitly (build-time distances run on host numpy)
    inserted = np.ones(len(xb), dtype=bool)
    cur = np.full(len(xq), hnsw.entry, dtype=np.int32)
    xb_dev = jnp.asarray(xb)
    for l in range(hnsw.max_level, 0, -1):
        cur = hnsw._greedy_descend(np.arange(len(xq)), xb_dev, cur, l,
                                   inserted, xq=xq)
    np.testing.assert_array_equal(got, cur)


def test_m_validation():
    with pytest.raises(ValueError):
        HNSW(M=1)
