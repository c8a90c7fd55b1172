"""Pallas ROC encoder (ops/roc_encode_pallas.py), interpret mode on CPU:
bit-exact states + order vs the host oracle, and a full encode→decode
round-trip through the Pallas decoder."""

import numpy as np
import pytest

from vector_db_id_compression_tpu.codecs import roc_device as rd
from vector_db_id_compression_tpu.codecs.roc import (
    precision_for_max_id_safe,
    roc_encode,
)
from vector_db_id_compression_tpu.ops.roc_encode_pallas import (
    roc_encode_pallas,
)
from vector_db_id_compression_tpu.ops.roc_pallas import roc_decode_pallas


def _workload(seed, n_lists, max_len, id_bits):
    rng = np.random.default_rng(seed)
    lists, lengths = [], []
    for _ in range(n_lists):
        n = int(rng.integers(2, max_len))
        lists.append(np.sort(rng.choice(1 << id_bits, size=n,
                                        replace=False).astype(np.uint64)))
        lengths.append(n)
    n_max = max(lengths)
    ids = np.zeros((n_lists, n_max), dtype=np.uint64)
    for i, l in enumerate(lists):
        ids[i, : len(l)] = l
    prec = np.array([precision_for_max_id_safe(int(l[-1])) for l in lists],
                    np.int32)
    return lists, ids, np.array(lengths, np.int32), prec


@pytest.mark.parametrize("id_bits", [10, 14, 20])
def test_encode_bit_exact_vs_host(id_bits):
    lists, ids, lengths, prec = _workload(id_bits, 6, 60, id_bits)
    states, order, ok = roc_encode_pallas(ids, lengths, prec, interpret=True)
    assert ok
    heads = np.asarray(states.head)
    stacks = np.asarray(states.stack)
    lens = np.asarray(states.stack_len)
    mts = np.asarray(states.mt_ctr)
    order = np.asarray(order)
    for i, l in enumerate(lists):
        st, want_order = roc_encode(l, int(prec[i]))
        assert heads[i] == st.head, i
        assert lens[i] == len(st.stack), i
        np.testing.assert_array_equal(
            stacks[i, : lens[i]], np.array(st.stack, dtype=np.uint32))
        assert mts[i] == st.mt_draws, i
        # host roc_encode input is the raw (sorted here) list, so its order
        # permutation is directly comparable
        np.testing.assert_array_equal(order[i, : len(l)], want_order)


def test_encode_then_pallas_decode_round_trip():
    lists, ids, lengths, prec = _workload(99, 8, 80, 16)
    states, order, ok = roc_encode_pallas(ids, lengths, prec, interpret=True)
    assert ok
    n_max = ids.shape[1]
    pool = rd.default_pool(n_max)
    decoded, ok2 = roc_decode_pallas(states, lengths, prec, pool, n_max,
                                     interpret=True)
    assert ok2
    order = np.asarray(order)
    for i, l in enumerate(lists):
        n = len(l)
        # decode order == encode sampling order
        np.testing.assert_array_equal(decoded[i, :n].astype(np.uint64),
                                      l[order[i, :n]])


def test_mt_underflow_lane():
    """A tiny high-precision list forces mt draws during encode."""
    l = np.array([5, 11], dtype=np.uint64)
    ids = l[None, :]
    states, order, ok = roc_encode_pallas(
        ids, np.array([2], np.int32), np.array([4], np.int32), interpret=True)
    assert ok
    st, _ = roc_encode(l, 4)
    assert int(np.asarray(states.head)[0]) == st.head
    assert int(np.asarray(states.mt_ctr)[0]) == st.mt_draws


def test_8bit_digit_division_path(monkeypatch):
    """Lists longer than 2^15 must use 8-bit long-division digits (16-bit
    digits overflow i32). Force the dw=8 path on a small workload and assert
    bit-exactness against the host oracle."""
    import vector_db_id_compression_tpu.ops.roc_encode_pallas as rep

    monkeypatch.setattr(rep, "_digit_bits", lambda n_max: 8)
    rep._encode_call.clear_cache()
    try:
        lists, ids, lengths, prec = _workload(7, 4, 50, 12)
        states, order, ok = rep.roc_encode_pallas(ids, lengths, prec,
                                                  interpret=True)
        assert ok
        heads = np.asarray(states.head)
        lens = np.asarray(states.stack_len)
        stacks = np.asarray(states.stack)
        for i, l in enumerate(lists):
            st, _ = roc_encode(l, int(prec[i]))
            assert heads[i] == st.head, i
            assert lens[i] == len(st.stack), i
            np.testing.assert_array_equal(
                stacks[i, : lens[i]], np.array(st.stack, dtype=np.uint32))
    finally:
        rep._encode_call.clear_cache()
