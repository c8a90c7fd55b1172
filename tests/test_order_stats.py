"""C19-parity order-statistics suite (reference
fenwick_tree_cpp/tests/test_fenwick_tree.cpp:16-183): the same insert/remove
sequences with duplicate multiplicities and inorder-traversal invariants,
plus randomized cross-checks of the encode-side (FenwickOrderStats) and
decode-side (InsertRank) duals against a sorted-list oracle."""

import numpy as np
import pytest

from vector_db_id_compression_tpu.core.order_stats import (
    FenwickOrderStats,
    InsertRank,
)


def test_insert_with_duplicates_char_sequence():
    """Mirror of test_FenwickTree_1 INSERT phase (test_fenwick_tree.cpp:16-78):
    symbols b,a,b,d,c,e,c,c with asserted (start, freq) and traversal."""
    t = InsertRank()
    seq = [
        ("b", 0, 1, ["b"]),
        ("a", 0, 1, ["a", "b"]),
        ("b", 1, 2, ["a", "b", "b"]),
        ("d", 3, 1, ["a", "b", "b", "d"]),
        ("c", 3, 1, ["a", "b", "b", "c", "d"]),
        ("e", 5, 1, ["a", "b", "b", "c", "d", "e"]),
        ("c", 3, 2, ["a", "b", "b", "c", "c", "d", "e"]),
        ("c", 3, 3, ["a", "b", "b", "c", "c", "c", "d", "e"]),
    ]
    for sym, start, freq, traversal in seq:
        s, got_start, got_freq = t.insert_then_forward_lookup(ord(sym))
        assert s == ord(sym)
        assert got_start == start, (sym, got_start, start)
        assert got_freq == freq, (sym, got_freq, freq)
        assert t.as_sorted() == [ord(c) for c in traversal]


def test_remove_with_duplicates_char_sequence():
    """Mirror of test_FenwickTree_1 REMOVE phase (test_fenwick_tree.cpp:80-135):
    removals by rank from the multiset a,b,b,c,c,c,d,e."""
    vals = [ord(c) for c in "abbcccde"]
    t = FenwickOrderStats.from_multiset(np.array(vals))
    seq = [
        (6, "d", 6, 1, "abbccce"),
        (1, "b", 1, 2, "abccce"),
        (3, "c", 2, 3, "abcce"),
        (4, "e", 4, 1, "abcc"),
        (0, "a", 0, 1, "bcc"),
        (1, "c", 1, 2, "bc"),
        (0, "b", 0, 1, "c"),
        (0, "c", 0, 1, ""),
    ]
    for k, sym, start, freq, traversal in seq:
        s, got_start, got_freq = t.reverse_lookup_then_remove(k)
        assert s == ord(sym), (k, chr(s), sym)
        assert got_start == start
        assert got_freq == freq
        assert t.inorder_traversal() == [ord(c) for c in traversal]
    assert len(t) == 0


def test_u64_sequence():
    """Mirror of test_FenwickTree_2 (test_fenwick_tree.cpp:138-183)."""
    t = InsertRank()
    for sym, start in [(83, 0), (77, 0), (15, 0), (86, 3), (93, 4)]:
        s, got_start, freq = t.insert_then_forward_lookup(sym)
        assert (s, got_start, freq) == (sym, start, 1)
    assert t.as_sorted() == [15, 77, 83, 86, 93]

    f = FenwickOrderStats.from_multiset(np.array([15, 77, 83, 86, 93],
                                                 dtype=np.uint64))
    s, start, freq = f.reverse_lookup_then_remove(3)
    assert (s, start, freq) == (86, 3, 1)
    assert f.inorder_traversal() == [15, 77, 83, 93]


def test_select_remove_out_of_range():
    f = FenwickOrderStats.from_multiset(np.array([1, 2, 3]))
    with pytest.raises(IndexError):
        f.select_remove(3)
    with pytest.raises(IndexError):
        f.reverse_lookup_then_remove(-1)


def test_randomized_duals_vs_oracle():
    """Encode/decode duals agree with a plain sorted-list oracle under random
    interleaved ops, including heavy duplicates."""
    rng = np.random.default_rng(0)
    for trial in range(5):
        vals = rng.integers(0, 20, size=60)  # many duplicates
        f = FenwickOrderStats.from_multiset(vals)
        oracle = sorted(int(v) for v in vals)
        order = []
        while len(f):
            k = int(rng.integers(0, len(f)))
            _, sym = f.select_remove(k)
            assert sym == oracle.pop(k)
            order.append(sym)
        # decode-side: inserting in any order reconstructs ranks consistent
        # with bisect_left on the growing multiset
        t = InsertRank()
        growing = []
        for sym in order:
            r = t.insert(sym)
            assert r == int(np.searchsorted(growing, sym, side="left"))
            growing.insert(r, sym)
        assert t.as_sorted() == sorted(int(v) for v in vals)


def test_rank_invariant_under_removals():
    """rank(i) stays the prefix count after arbitrary removals."""
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 50, size=40)
    f = FenwickOrderStats.from_multiset(vals)
    remaining = sorted(int(v) for v in vals)
    for _ in range(30):
        k = int(rng.integers(0, len(f)))
        f.select_remove(k)
        remaining.pop(k)
        for i in range(0, f._n + 1, 7):
            dom_prefix = f.domain[:i]
            want = sum(1 for v in remaining
                       if i > 0 and v <= int(dom_prefix[-1])) if i else 0
            assert f.rank(i) == want
