"""Interleaved ROC (codecs/roc_interleaved.py): round-trip, order contract,
rate (per-lane rebasing must keep bits/id close to single-stream ROC)."""

import numpy as np
import pytest

from vector_db_id_compression_tpu.codecs.roc import (
    precision_for_max_id_safe,
    roc_encode,
)
from vector_db_id_compression_tpu.codecs.roc_interleaved import (
    interleaved_decode,
    interleaved_encode,
    partition_sizes,
)


def _distinct(rng, n, bits):
    return rng.choice(1 << bits, size=n, replace=False).astype(np.uint64)


def test_partition_sizes():
    s = partition_sizes(10, 4)
    assert s.tolist() == [3, 3, 2, 2] and s.sum() == 10


@pytest.mark.parametrize("S", [1, 2, 4, 8])
def test_round_trip_and_order(S):
    rng = np.random.default_rng(S)
    ids = _distinct(rng, 500, 16)
    env, order = interleaved_encode(ids, S)
    dec = interleaved_decode(env)
    # order contract: decoded position i holds ids[order[i]]
    np.testing.assert_array_equal(dec, ids[order])
    # multiset equality
    np.testing.assert_array_equal(np.sort(dec), np.sort(ids))


def test_rate_close_to_single_stream():
    """Per-chunk rebasing must cancel the multiset-splitting loss: total size
    within ~12% + fixed per-lane overhead of the single-stream codec."""
    rng = np.random.default_rng(9)
    n, S = 4096, 8
    ids = _distinct(rng, n, 20)
    env, _ = interleaved_encode(ids, S)
    st, _ = roc_encode(ids, precision_for_max_id_safe(int(ids.max())))
    single = st.size_bytes
    multi = env.size_bytes
    # allow per-lane constant overhead (~21B/lane envelope+head) + 12%
    assert multi <= single * 1.12 + 24 * S, (multi, single)


def test_s1_matches_single_stream_bits():
    """At S=1 with lo=0 the lane stream is the ordinary ROC stream."""
    rng = np.random.default_rng(10)
    ids = _distinct(rng, 300, 14)
    if ids.min() != 0:
        ids[np.argmin(ids)] = 0  # force lo == 0 so rebasing is a no-op
    env, _ = interleaved_encode(ids, 1)
    st, _ = roc_encode(ids, precision_for_max_id_safe(int(ids.max())))
    assert int(np.asarray(env.states.head)[0]) == st.head
    ln = int(np.asarray(env.states.stack_len)[0])
    assert ln == len(st.stack)
    np.testing.assert_array_equal(
        np.asarray(env.states.stack)[0, :ln],
        np.array(st.stack, dtype=np.uint32),
    )
