"""Elias-Fano: parameter formulas, round-trip select/sweep, size accounting."""

import numpy as np
import jax.numpy as jnp

from vector_db_id_compression_tpu.codecs.elias_fano import (
    batch_ef_lists,
    ef_decode_all,
    ef_encode_list,
    ef_low_width,
    ef_select,
)


def _rand_sorted(rng, n, universe):
    return np.sort(rng.choice(universe, size=n, replace=False).astype(np.uint64))


def test_low_width_formula():
    # reference elias_fano.hpp:28: msb(n/m) with integer division
    assert ef_low_width(1000, 100) == 3   # msb(10)
    assert ef_low_width(1000, 1000) == 0  # msb(1)
    assert ef_low_width(7, 8) == 0        # n//m == 0
    assert ef_low_width(10**6, 1000) == 9  # msb(1000)


def test_roundtrip_various_sizes():
    rng = np.random.default_rng(0)
    lists = [
        _rand_sorted(rng, 100, 10**6),
        _rand_sorted(rng, 1, 10**6),
        _rand_sorted(rng, 997, 5000),
        np.arange(50, dtype=np.uint64) * 7 + 3,
        _rand_sorted(rng, 512, 10**6),
    ]
    encoded = [ef_encode_list(v) for v in lists]
    batch = batch_ef_lists(encoded)
    n_max = max(len(v) for v in lists)
    decoded = np.asarray(ef_decode_all(batch, n_max))
    for b, v in enumerate(lists):
        np.testing.assert_array_equal(decoded[b, : len(v)], v)
        assert (decoded[b, len(v):] == 0).all()


def test_random_access_select():
    rng = np.random.default_rng(1)
    lists = [_rand_sorted(rng, 300, 10**6), _rand_sorted(rng, 10, 100)]
    batch = batch_ef_lists([ef_encode_list(v) for v in lists])
    lanes, ks, expect = [], [], []
    for b, v in enumerate(lists):
        for k in rng.choice(len(v), size=min(len(v), 20), replace=False):
            lanes.append(b); ks.append(int(k)); expect.append(int(v[k]))
    got = np.asarray(
        ef_select(batch, jnp.asarray(lanes, jnp.int32), jnp.asarray(ks, jnp.int32))
    )
    np.testing.assert_array_equal(got, np.asarray(expect, dtype=np.uint64))


def test_size_accounting_matches_reference_formula():
    rng = np.random.default_rng(2)
    v = _rand_sorted(rng, 1000, 10**6)
    e = ef_encode_list(v)
    universe = int(v[-1])
    l = ef_low_width(universe, 1000)
    # reference: high bits (m+1)+(n>>l)+1, low bits m*l (elias_fano.hpp:28-46)
    assert e.size_in_bits == ((1000 + 1) + (universe >> l) + 1) + 1000 * l
    # EF beats packed bits for dense-enough lists
    assert e.size_in_bits < 1000 * 20


def test_empty_list():
    e = ef_encode_list(np.array([], dtype=np.uint64))
    assert e.m == 0 and e.size_in_bits == 0
    batch = batch_ef_lists([e, ef_encode_list(np.array([5, 9], dtype=np.uint64))])
    decoded = np.asarray(ef_decode_all(batch, 2))
    np.testing.assert_array_equal(decoded[0], [0, 0])
    np.testing.assert_array_equal(decoded[1], [5, 9])
