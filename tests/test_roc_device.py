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
