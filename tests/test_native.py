"""Native C++ host codec (native/): bit-exact equality against the Python
host oracle (core/rans.py + codecs/roc.py), round-trip, threading, and
overflow accounting."""

import numpy as np
import pytest

from vector_db_id_compression_tpu import native
from vector_db_id_compression_tpu.codecs.roc import (
    precision_for_max_id_safe,
    roc_decode,
    roc_encode,
)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no native toolchain")


def _rand_lists(rng, n_lists, max_len, id_bits):
    lists = []
    for _ in range(n_lists):
        n = int(rng.integers(1, max_len))
        ids = rng.choice(1 << id_bits, size=n, replace=False).astype(np.uint64)
        lists.append(ids)
    return lists


def test_encode_bit_exact_vs_python_oracle():
    rng = np.random.default_rng(0)
    lists = _rand_lists(rng, 12, 200, 14)
    prec = [precision_for_max_id_safe(int(l.max())) for l in lists]
    heads, stacks, lens, orders, mt = native.roc_encode_lists(lists, prec)
    for i, (ids, p) in enumerate(zip(lists, prec)):
        st, order = roc_encode(ids, p)
        assert heads[i] == st.head
        assert lens[i] == len(st.stack)
        np.testing.assert_array_equal(stacks[i, : lens[i]],
                                      np.array(st.stack, dtype=np.uint32))
        np.testing.assert_array_equal(orders[i], order)
        assert mt[i] == st.mt_draws


def test_decode_round_trip_and_python_parity():
    rng = np.random.default_rng(1)
    lists = _rand_lists(rng, 10, 300, 16)
    prec = [precision_for_max_id_safe(int(l.max())) for l in lists]
    heads, stacks, lens, orders, _ = native.roc_encode_lists(lists, prec)
    decoded = native.roc_decode_lists(heads, stacks, lens,
                                      [len(l) for l in lists], prec)
    for ids, dec, order in zip(lists, decoded, orders):
        # decode order == encode sampling order
        np.testing.assert_array_equal(dec, ids[order])
        # and vs python decoder
        st, _ = roc_encode(ids, precision_for_max_id_safe(int(ids.max())))
        np.testing.assert_array_equal(
            roc_decode(st, len(ids), precision_for_max_id_safe(int(ids.max()))),
            dec,
        )


def test_single_thread_matches_many():
    rng = np.random.default_rng(2)
    lists = _rand_lists(rng, 32, 100, 12)
    prec = [precision_for_max_id_safe(int(l.max())) for l in lists]
    a = native.roc_encode_lists(lists, prec, n_threads=1)
    b = native.roc_encode_lists(lists, prec, n_threads=8)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_mt_underflow_path():
    """Short lists with high precision drain the stack, forcing mt19937
    initial-bit draws — the fiddly bit-exactness path."""
    ids = np.array([3, 9], dtype=np.uint64)
    heads, stacks, lens, orders, mt = native.roc_encode_lists([ids], [4])
    st, order = roc_encode(ids, 4)
    assert st.mt_draws == mt[0]
    assert heads[0] == st.head
    decoded = native.roc_decode_lists(heads, stacks, lens, [2], [4])[0]
    np.testing.assert_array_equal(np.sort(decoded), ids)
