"""Pallas ROC decode kernel (interpret mode on CPU): bit-exact vs the XLA
scan decoder, hence vs the C++ reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from vector_db_id_compression_tpu.codecs import roc_device as rd
from vector_db_id_compression_tpu.codecs.roc import precision_for_max_id_safe
from vector_db_id_compression_tpu.ops.roc_pallas import roc_decode_pallas


def _encode_batch(rng, sizes, bits):
    n_max = max(sizes)
    B = len(sizes)
    ids = np.zeros((B, n_max), dtype=np.uint64)
    prec = np.zeros(B, dtype=np.int32)
    for b, n in enumerate(sizes):
        v = np.sort(rng.choice(2**bits - 1, size=n, replace=False).astype(np.uint64) + 1)
        ids[b, :n] = v
        prec[b] = precision_for_max_id_safe(int(v.max()))
    lengths = np.array(sizes, dtype=np.int32)
    maxp = int(prec.max())
    cap = rd.stack_capacity(n_max, maxp)
    pool = rd.default_pool(n_max)
    states, _ = rd.roc_encode_batch(
        jnp.asarray(ids), jnp.asarray(lengths), jnp.asarray(prec), pool,
        rd.fresh_states(B, cap), rd.n_slices_for(maxp),
    )
    return ids, lengths, prec, states, pool, n_max, maxp


@pytest.mark.parametrize(
    "sizes,bits",
    [([64], 16), ([1, 5, 128, 37], 16), ([513, 2, 300], 20), ([1000] * 3, 24)],
)
def test_pallas_decode_bit_exact(sizes, bits):
    rng = np.random.default_rng(sum(sizes) + bits)
    ids, lengths, prec, states, pool, n_max, maxp = _encode_batch(rng, sizes, bits)

    ref_ids, _ = rd.roc_decode_batch(
        states, jnp.asarray(lengths), jnp.asarray(prec), pool, n_max,
        rd.n_slices_for(maxp),
    )
    ref_ids = np.asarray(ref_ids)

    got, ok = roc_decode_pallas(
        states, lengths, prec, pool, n_max, interpret=True
    )
    assert ok
    np.testing.assert_array_equal(got, ref_ids)


def test_pallas_decode_emit_rev_matches():
    """emit_rev=True returns each lane reversed (row length-1-j holds
    element j) — the layout the fused translate stage gathers from."""
    from vector_db_id_compression_tpu.ops.roc_pallas import RocPallasDecoder
    from vector_db_id_compression_tpu.ops import roc_pallas as rp

    rng = np.random.default_rng(7)
    sizes, bits = [700, 3, 513, 64], 20
    ids, lengths, prec, states, pool, n_max, maxp = _encode_batch(
        rng, sizes, bits)
    dec = RocPallasDecoder(states, lengths, prec, pool, n_max)
    fwd, ok = dec.decode(interpret=True)
    assert ok
    rev, err = rp._run_decode(
        dec._buf, dec._hi, dec._lo, dec._ptr0, dec._lens, dec._prec_row,
        dec._n_max_pad, dec._capp, True, dec._pool_ok, True)
    assert not bool(err)
    rev = np.asarray(rev)[: len(sizes)]
    fwd = np.asarray(fwd)
    for b, n in enumerate(sizes):
        np.testing.assert_array_equal(rev[b, :n][::-1], fwd[b, :n])
        assert (rev[b, n:] == 0).all()


def test_pallas_chained_decode_bit_exact():
    """RocChainedPallasDecoder matches the XLA chained decoder on the
    RocBlockGraph format (S multisets threaded through one state)."""
    from vector_db_id_compression_tpu.ops.roc_pallas import (
        RocChainedPallasDecoder,
    )

    rng = np.random.default_rng(11)
    L, S, K, bits = 5, 4, 16, 18
    ids = np.zeros((L, S, K), dtype=np.uint64)
    degs = np.zeros((L, S), dtype=np.int32)
    prec = np.ones((L, S), dtype=np.int32)
    for b in range(L):
        for s in range(S):
            n = int(rng.integers(0, K + 1))
            degs[b, s] = n
            if n == 0:
                continue
            v = np.sort(rng.choice(2**bits - 1, size=n,
                                   replace=False).astype(np.uint64) + 1)
            ids[b, s, :n] = v
            prec[b, s] = precision_for_max_id_safe(int(v.max()))
    maxp = int(prec.max())
    n_sl = rd.n_slices_for(maxp)
    cap = rd.stack_capacity(S * K, maxp)
    pool = rd.default_pool(S * K)
    states = rd.roc_encode_chained(
        jnp.asarray(ids), jnp.asarray(degs), jnp.asarray(prec), pool,
        rd.fresh_states(L, cap), n_sl)
    assert not bool(np.asarray(states.err).any())

    ref, _ = rd.roc_decode_chained(
        states, jnp.asarray(degs), jnp.asarray(prec), pool, K, n_sl)
    ref = np.asarray(ref)

    dec = RocChainedPallasDecoder(states, degs, prec, pool, K)
    got, ok = dec.decode(interpret=True)
    assert ok
    np.testing.assert_array_equal(np.asarray(got).astype(np.uint64), ref)

    # traced subset entry (the in-traversal fetch path)
    import jax

    idx = np.array([3, 3, 0, 4] + [0] * 124, dtype=np.int32)  # pad to 128
    sub = jax.jit(lambda i: dec.decode_lanes_traced(i, interpret=True))(
        jnp.asarray(idx))
    np.testing.assert_array_equal(
        np.asarray(sub)[:4].astype(np.uint64), ref[idx[:4]])
