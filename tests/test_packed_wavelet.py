"""Packed-bits and wavelet-tree codecs."""

import numpy as np
import jax.numpy as jnp

from vector_db_id_compression_tpu.codecs.packed_bits import (
    get_single,
    pack_lists,
    packed_width,
    unpack_all,
)
from vector_db_id_compression_tpu.codecs.wavelet_tree import (
    build_wavelet_tree,
    wt_levels,
    wt_select,
)


def test_packed_width():
    # reference loop: while((1 << bits) < ntotal + 1) bits++
    assert packed_width(0) == 0
    assert packed_width(1) == 1
    assert packed_width(2) == 2
    assert packed_width(3) == 2
    assert packed_width(4) == 3
    assert packed_width(10**6) == 20


def test_packed_roundtrip_and_random_access():
    rng = np.random.default_rng(0)
    ntotal = 5000
    lists = [
        rng.choice(ntotal, size=n, replace=False).astype(np.uint64)
        for n in (100, 1, 333, 17)
    ]
    width = packed_width(ntotal)
    pb = pack_lists(lists, width)
    dec = np.asarray(unpack_all(pb, 333))
    for b, v in enumerate(lists):
        np.testing.assert_array_equal(dec[b, : len(v)], v)
    # size accounting: (ls*bits+7)//8
    np.testing.assert_array_equal(
        pb.size_in_bytes_per_list,
        np.array([(len(v) * width + 7) // 8 for v in lists]),
    )
    # random access
    lanes = jnp.asarray([0, 2, 2, 3], jnp.int32)
    offs = jnp.asarray([57, 0, 332, 16], jnp.int32)
    got = np.asarray(get_single(pb, lanes, offs))
    exp = [lists[0][57], lists[2][0], lists[2][332], lists[3][16]]
    np.testing.assert_array_equal(got, np.asarray(exp, dtype=np.uint64))


def test_wavelet_tree_select():
    rng = np.random.default_rng(1)
    ntotal, sigma = 4096, 37
    symbols = rng.integers(0, sigma, size=ntotal).astype(np.uint32)
    wt = build_wavelet_tree(symbols, sigma)
    assert wt.levels == wt_levels(sigma) == 6
    # every (symbol, occurrence) pair round-trips to its position
    syms, offs, expect = [], [], []
    for c in range(sigma):
        positions = np.flatnonzero(symbols == c)
        for k in range(0, len(positions), 7):
            syms.append(c); offs.append(k); expect.append(positions[k])
    got = np.asarray(wt_select(wt, jnp.asarray(syms), jnp.asarray(offs)))
    np.testing.assert_array_equal(got, np.asarray(expect))


def test_wavelet_tree_degenerate_alphabets():
    symbols = np.zeros(100, dtype=np.uint32)
    wt = build_wavelet_tree(symbols, 1)
    got = np.asarray(wt_select(wt, jnp.zeros(5, jnp.int32), jnp.asarray([0, 9, 50, 98, 99])))
    np.testing.assert_array_equal(got, [0, 9, 50, 98, 99])

    symbols = np.array([1, 0, 1, 1, 0], dtype=np.uint32)
    wt = build_wavelet_tree(symbols, 2)
    got = np.asarray(wt_select(wt, jnp.asarray([1, 1, 1, 0, 0]), jnp.asarray([0, 1, 2, 0, 1])))
    np.testing.assert_array_equal(got, [0, 2, 3, 1, 4])


def test_wavelet_tree_ivf_shape():
    # the actual usage: list_nos[id] = cluster of vector id; select recovers
    # the id of the (offset+1)-th member of a cluster in ascending order
    rng = np.random.default_rng(2)
    ntotal, nlist = 10000, 64
    list_nos = rng.integers(0, nlist, size=ntotal).astype(np.uint32)
    wt = build_wavelet_tree(list_nos, nlist)
    for list_no in (0, 13, 63):
        members = np.flatnonzero(list_nos == list_no)
        offs = jnp.arange(len(members), dtype=jnp.int32)
        got = np.asarray(wt_select(wt, jnp.full(len(members), list_no), offs))
        np.testing.assert_array_equal(got, members)


def test_wt_path_tables_match_generic():
    """The precomputed-path select (wt_path_tables) must equal the two-sweep
    walk for every (symbol, occurrence), incl. 2-D query batches, empty
    symbols, and RRR-compressed planes."""
    from vector_db_id_compression_tpu.codecs.rrr import rrr_encode_planes
    from vector_db_id_compression_tpu.codecs.wavelet_tree import (
        wt_levels,
        wt_path_tables,
        wt_planes,
        wt_select_rrr,
    )

    rng = np.random.default_rng(7)
    for sigma, n in [(5, 6), (8, 100), (37, 500), (64, 2000)]:
        # leave some symbols empty
        active = rng.choice(sigma, size=max(sigma // 2, 1), replace=False)
        symbols = rng.choice(active, size=n).astype(np.uint32)
        counts = np.bincount(symbols, minlength=sigma)
        L = wt_levels(sigma)
        wt = build_wavelet_tree(symbols, sigma)
        tab = jnp.asarray(wt_path_tables(counts, L))
        qs, qo = [], []
        for s in range(sigma):
            for j in range(counts[s]):
                qs.append(s), qo.append(j)
        qs, qo = jnp.asarray(np.array(qs)), jnp.asarray(np.array(qo))
        a = np.asarray(wt_select(wt, qs, qo))
        b = np.asarray(wt_select(wt, qs, qo, tables=tab))
        np.testing.assert_array_equal(a, b)
        # 2-D query shape (the container's decode_lists path)
        q2s, q2o = qs.reshape(-1, 1), qo.reshape(-1, 1)
        b2 = np.asarray(wt_select(wt, q2s, q2o, tables=tab))
        np.testing.assert_array_equal(a, b2[:, 0])
        # RRR planes share the same tables (select-only walk)
        rrr = rrr_encode_planes(wt_planes(symbols, sigma))
        c = np.asarray(wt_select_rrr(rrr, qs, qo, tables=tab))
        np.testing.assert_array_equal(a, c)
