"""Host ROC codec: round-trip, rate, and bit-exactness vs the C++ reference."""

import subprocess

import numpy as np
import pytest

from vector_db_id_compression_tpu.codecs.roc import (
    precision_for_max_id,
    roc_decode,
    roc_encode,
)
from vector_db_id_compression_tpu.core.rans import RansState


def _random_distinct(rng, n, bits):
    # distinct ids with values < 2**bits
    vals = rng.choice(2**bits - 1, size=n, replace=False).astype(np.uint64) + 1
    return vals


@pytest.mark.parametrize("n,bits", [(1, 8), (7, 8), (100, 20), (1000, 20), (500, 40)])
def test_roundtrip_multiset_equality(n, bits):
    rng = np.random.default_rng(n * 1000 + bits)
    ids = _random_distinct(rng, n, bits)
    precision = precision_for_max_id(int(ids.max()))
    state, order = roc_encode(ids, precision)
    decoded = roc_decode(state.clone(), n, precision)
    # multiset equality (order deliberately not preserved)
    assert np.array_equal(np.sort(decoded), np.sort(ids))
    # decode order == encode sampling order (the code-reorder contract)
    assert np.array_equal(decoded, ids[order])


def test_rate_beats_packed_bits():
    # ~log2(n!) bits recovered vs fixed-width packing
    rng = np.random.default_rng(0)
    n, bits = 2000, 20
    ids = _random_distinct(rng, n, bits)
    precision = precision_for_max_id(int(ids.max()))
    state, _ = roc_encode(ids, precision)
    total_bits = 8 * state.size_bytes
    expected = n * precision - (np.sum(np.log2(np.arange(1, n + 1))))
    assert total_bits < n * precision  # better than packed bits
    assert total_bits < expected + 128  # within slack of the bits-back bound


def test_precision_for_max_id():
    assert precision_for_max_id(1) == 0
    assert precision_for_max_id(2) == 1
    assert precision_for_max_id(3) == 2
    assert precision_for_max_id(4) == 2  # power-of-two under-allocation
    assert precision_for_max_id(5) == 3
    assert precision_for_max_id(1 << 20) == 20


@pytest.mark.parametrize("seed,n,bits", [(0, 100, 20), (1, 997, 20), (2, 50, 12), (3, 3000, 22)])
def test_bit_exact_vs_reference(ref_codec_harness, seed, n, bits):
    rng = np.random.default_rng(seed)
    ids = _random_distinct(rng, n, bits)
    precision = precision_for_max_id(int(ids.max()))

    inp = f"{n}\n" + "\n".join(str(int(v)) for v in ids) + "\n"
    res = subprocess.run(
        [str(ref_codec_harness), str(precision)],
        input=inp, capture_output=True, text=True, check=True,
    )
    lines = res.stdout.split()
    assert lines[0] == "HEAD"
    ref_head = int(lines[1])
    assert lines[2] == "STACK"
    stack_len = int(lines[3])
    ref_stack = [int(x) for x in lines[4 : 4 + stack_len]]
    assert lines[4 + stack_len] == "DECODED"
    ref_decoded = np.array(
        [int(x) for x in lines[5 + stack_len : 5 + stack_len + n]], dtype=np.uint64
    )

    state, _ = roc_encode(ids, precision)
    assert state.head == ref_head
    assert state.stack == ref_stack
    decoded = roc_decode(state.clone(), n, precision)
    assert np.array_equal(decoded, ref_decoded)
