"""Batched device ROC codec vs host oracle: bit-exact streams + round-trip."""

import numpy as np
import pytest

import jax.numpy as jnp

from vector_db_id_compression_tpu.codecs.roc import (
    precision_for_max_id,
    roc_decode,
    roc_encode,
)
from vector_db_id_compression_tpu.codecs import roc_device as rd


def _make_batch(rng, sizes, bits):
    ids = [
        np.sort(rng.choice(2**bits - 1, size=n, replace=False).astype(np.uint64) + 1)
        for n in sizes
    ]
    n_max = max(sizes)
    B = len(sizes)
    padded = np.zeros((B, n_max), dtype=np.uint64)
    prec = np.zeros(B, dtype=np.int32)
    for b, v in enumerate(ids):
        padded[b, : len(v)] = v
        prec[b] = precision_for_max_id(int(v.max()))
    return ids, padded, np.array(sizes, dtype=np.int32), prec


@pytest.mark.parametrize(
    "sizes,bits",
    [([64], 16), ([1, 5, 128, 37], 16), ([200, 200, 3, 199], 20), ([1000], 22)],
)
def test_device_encode_matches_host(sizes, bits):
    rng = np.random.default_rng(sum(sizes))
    ids, padded, lengths, prec = _make_batch(rng, sizes, bits)
    n_max = padded.shape[1]
    cap = rd.stack_capacity(n_max, int(prec.max()))
    pool = rd.default_pool(n_max)

    states, order = rd.roc_encode_batch(
        jnp.asarray(padded), jnp.asarray(lengths), jnp.asarray(prec), pool,
        rd.fresh_states(len(sizes), cap),
    )
    packed = rd.pack_states(states, lengths)
    assert not bool(np.asarray(states.err).any())

    for b, v in enumerate(ids):
        host_state, host_order = roc_encode(v, int(prec[b]))
        assert packed[b]["head"] == host_state.head, f"lane {b} head mismatch"
        assert packed[b]["stack"] == host_state.stack, f"lane {b} stack mismatch"
        # order refers to sorted ids; both encode from sorted input here
        np.testing.assert_array_equal(
            np.asarray(order)[b, : len(v)], host_order
        )


@pytest.mark.parametrize(
    "sizes,bits", [([64], 16), ([1, 5, 128, 37], 16), ([513, 2, 300], 20)]
)
def test_device_roundtrip_and_host_decode_parity(sizes, bits):
    rng = np.random.default_rng(len(sizes) * 7 + bits)
    ids, padded, lengths, prec = _make_batch(rng, sizes, bits)
    n_max = padded.shape[1]
    cap = rd.stack_capacity(n_max, int(prec.max()))
    pool = rd.default_pool(n_max)

    states, order = rd.roc_encode_batch(
        jnp.asarray(padded), jnp.asarray(lengths), jnp.asarray(prec), pool,
        rd.fresh_states(len(sizes), cap),
    )
    decoded, final = rd.roc_decode_batch(
        states, jnp.asarray(lengths), jnp.asarray(prec), pool, n_max
    )
    assert not bool(np.asarray(final.err).any())
    decoded = np.asarray(decoded)
    order = np.asarray(order)

    for b, v in enumerate(ids):
        n = len(v)
        # multiset equality
        np.testing.assert_array_equal(np.sort(decoded[b, :n]), v)
        # decode order == encode sampling order
        np.testing.assert_array_equal(decoded[b, :n], v[order[b, :n]])
        # device decode == host decode of the same stream
        host_state, _ = roc_encode(v, int(prec[b]))
        host_decoded = roc_decode(host_state.clone(), n, int(prec[b]))
        np.testing.assert_array_equal(decoded[b, :n], host_decoded)


def test_size_accounting():
    rng = np.random.default_rng(0)
    ids, padded, lengths, prec = _make_batch(rng, [400, 100], 20)
    cap = rd.stack_capacity(400, int(prec.max()))
    pool = rd.default_pool(400)
    states, _ = rd.roc_encode_batch(
        jnp.asarray(padded), jnp.asarray(lengths), jnp.asarray(prec), pool,
        rd.fresh_states(2, cap),
    )
    sizes = np.asarray(states.size_bytes)
    for b, v in enumerate(ids):
        host_state, _ = roc_encode(v, int(prec[b]))
        assert sizes[b] == host_state.size_bytes


def test_chained_round_trip():
    """S multisets per lane through ONE threaded ANS state
    (roc_encode_chained / roc_decode_chained): per-slot multiset equality,
    slot 0 decoded first, zero-length slots pass the state through, and the
    chained size is strictly below S independent streams (one head +
    word-rounding per lane instead of per slot)."""
    rng = np.random.default_rng(3)
    B, S, K = 5, 4, 24
    sorted_ids = np.zeros((B, S, K), dtype=np.uint64)
    lengths = np.zeros((B, S), dtype=np.int32)
    prec = np.ones((B, S), dtype=np.int32)
    orig = {}
    for b in range(B):
        for s in range(S):
            n = int(rng.integers(0, K + 1))
            if (b, s) == (2, 1):
                n = 0  # explicit empty slot mid-chain
            v = np.sort(rng.choice(1 << 14, size=n, replace=False)
                        ).astype(np.uint64)
            sorted_ids[b, s, :n] = v
            lengths[b, s] = n
            prec[b, s] = max(int(v.max()).bit_length(), 1) if n else 1
            orig[(b, s)] = v
    maxp = int(prec.max())
    n_slices = rd.n_slices_for(maxp)
    cap = rd.stack_capacity(S * K, maxp)
    pool = rd.default_pool(S * K)
    states = rd.roc_encode_chained(
        jnp.asarray(sorted_ids), jnp.asarray(lengths), jnp.asarray(prec),
        pool, rd.fresh_states(B, cap), n_slices)
    assert not bool(np.asarray(states.err).any())
    ids, final = rd.roc_decode_chained(
        states, jnp.asarray(lengths), jnp.asarray(prec), pool, K, n_slices)
    assert not bool(np.asarray(final.err).any())
    ids = np.asarray(ids)
    for b in range(B):
        for s in range(S):
            n = lengths[b, s]
            np.testing.assert_array_equal(np.sort(ids[b, s, :n]), orig[(b, s)])
    # head+rounding amortization vs S independent per-slot streams
    chained = int(np.asarray(states.size_bytes).sum())
    sep = 0
    for s in range(S):
        st_s, _ = rd.roc_encode_batch(
            jnp.asarray(sorted_ids[:, s]), jnp.asarray(lengths[:, s]),
            jnp.asarray(prec[:, s]), pool, rd.fresh_states(B, cap), n_slices)
        sep += int(np.asarray(st_s.size_bytes).sum())
    assert chained < sep
