"""RRR(63) compressed bitvectors (codecs/rrr.py): block round-trip,
rank/select vs a plain-python oracle, wavelet-tree-over-RRR equality with the
plain wavelet tree, and the smaller-payload property."""

import numpy as np
import jax.numpy as jnp
import pytest

from vector_db_id_compression_tpu.codecs.rrr import (
    BLOCK,
    RRRPlanes,
    rrr_encode_planes,
    rrr_rank1,
    rrr_select0,
    rrr_select1,
    _decode_blocks,
)
from vector_db_id_compression_tpu.codecs.wavelet_tree import (
    build_wavelet_tree,
    wt_planes,
    wt_select,
    wt_select_rrr,
)


@pytest.mark.parametrize("density", [0.05, 0.5, 0.95])
def test_block_round_trip(density):
    rng = np.random.default_rng(int(density * 100))
    n = 5 * BLOCK + 17
    plane = (rng.random(n) < density).astype(np.uint8)
    rrr = rrr_encode_planes(plane[None, :])
    nb = np.asarray(rrr.classes).shape[1]
    bits = np.asarray(_decode_blocks(rrr, 0, jnp.arange(nb, dtype=jnp.int32)))
    padded = np.zeros(nb * BLOCK, dtype=np.uint8)
    padded[:n] = plane
    for b in range(nb):
        want = padded[b * BLOCK:(b + 1) * BLOCK]
        got = (bits[b] >> np.arange(BLOCK).astype(np.uint64)) & 1
        np.testing.assert_array_equal(got.astype(np.uint8), want, f"block {b}")


def test_rank_select_vs_oracle():
    rng = np.random.default_rng(3)
    n = 1000
    plane = (rng.random(n) < 0.4).astype(np.uint8)
    rrr = rrr_encode_planes(plane[None, :])
    cum = np.concatenate([[0], np.cumsum(plane)])
    pos = rng.integers(0, n + 1, 200)
    got = np.asarray(rrr_rank1(rrr, 0, jnp.asarray(pos, jnp.int64)))
    np.testing.assert_array_equal(got, cum[pos])
    ones = np.flatnonzero(plane)
    zeros = np.flatnonzero(plane == 0)
    k1 = rng.integers(0, len(ones), 100)
    np.testing.assert_array_equal(
        np.asarray(rrr_select1(rrr, 0, jnp.asarray(k1, jnp.int64))), ones[k1])
    k0 = rng.integers(0, len(zeros), 100)
    np.testing.assert_array_equal(
        np.asarray(rrr_select0(rrr, 0, jnp.asarray(k0, jnp.int64))), zeros[k0])


def test_wt_rrr_matches_plain():
    rng = np.random.default_rng(7)
    sigma, n = 13, 700
    symbols = rng.integers(0, sigma, n).astype(np.uint32)
    wt = build_wavelet_tree(symbols, sigma)
    rrr = rrr_encode_planes(wt_planes(symbols, sigma))
    # query every (symbol, occurrence)
    for s in range(sigma):
        cnt = int((symbols == s).sum())
        if cnt == 0:
            continue
        offs = jnp.arange(cnt, dtype=jnp.int64)
        sym = jnp.full(cnt, s, jnp.int64)
        a = np.asarray(wt_select(wt, sym, offs))
        b = np.asarray(wt_select_rrr(rrr, sym, offs))
        np.testing.assert_array_equal(a, b, f"symbol {s}")
        np.testing.assert_array_equal(np.sort(a), np.flatnonzero(symbols == s))


def test_rrr_payload_smaller_for_skewed_planes():
    """H0 coding must beat 1 bit/bit on biased planes."""
    rng = np.random.default_rng(9)
    n = 63 * 64
    plane = (rng.random(n) < 0.05).astype(np.uint8)
    rrr = rrr_encode_planes(plane[None, :])
    assert rrr.payload_bits < n * 0.55, (rrr.payload_bits, n)


def test_container_wt1_matches_wt0(tmp_path):
    from vector_db_id_compression_tpu.store.invlists import (
        InvertedLists,
        WaveletTreeInvertedLists,
    )
    from vector_db_id_compression_tpu.store.serialize import (
        load_invlists,
        save_invlists,
    )

    rng = np.random.default_rng(11)
    nlist, ntotal = 8, 800
    assign = rng.integers(0, nlist, ntotal)
    il = InvertedLists(nlist, 0)
    for ln in range(nlist):
        il.add_entries(ln, np.flatnonzero(assign == ln).astype(np.uint64),
                       None)
    c0 = WaveletTreeInvertedLists(il, wt_type=0)
    c1 = WaveletTreeInvertedLists(il, wt_type=1)
    lns = np.arange(nlist)
    ids0, lens0 = c0.decode_lists(lns)
    ids1, lens1 = c1.decode_lists(lns)
    np.testing.assert_array_equal(ids0, ids1)
    np.testing.assert_array_equal(lens0, lens1)
    # random access too
    q_ln = rng.integers(0, nlist, 50)
    q_off = np.array([rng.integers(0, il.list_size(l)) for l in q_ln])
    np.testing.assert_array_equal(c0.get_single_ids_batch(q_ln, q_off),
                                  c1.get_single_ids_batch(q_ln, q_off))
    # serialization round-trip of the RRR variant
    p = tmp_path / "wt1.npz"
    save_invlists(p, c1)
    c1b = load_invlists(p)
    ids1b, _ = c1b.decode_lists(lns)
    np.testing.assert_array_equal(ids1, ids1b)
