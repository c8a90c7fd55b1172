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


def test_secondary_ops_vs_oracle():
    """rank / predecessor1 / successor1 / delta / select_range vs a numpy
    oracle (reference elias_fano.hpp:147-208 semantics)."""
    from vector_db_id_compression_tpu.codecs.elias_fano import (
        ef_delta,
        ef_predecessor1,
        ef_rank,
        ef_select_range,
        ef_successor1,
    )

    rng = np.random.default_rng(7)
    lists = [
        _rand_sorted(rng, 300, 10**6),
        _rand_sorted(rng, 17, 50),
        np.arange(40, dtype=np.uint64) * 3,          # dense, duplicatable gaps
        _rand_sorted(rng, 1000, 2000),               # very dense
    ]
    batch = batch_ef_lists([ef_encode_list(v) for v in lists])

    lanes, poss, want_rank = [], [], []
    for b, v in enumerate(lists):
        # probe member values, gaps, 0, past-the-end
        probes = np.unique(np.concatenate([
            v[:5], v[:5] + 1, rng.integers(0, int(v[-1]) + 2, 20).astype(np.uint64),
            np.array([0, int(v[-1]) + 1], dtype=np.uint64)]))
        for p in probes:
            lanes.append(b)
            poss.append(int(p))
            want_rank.append(int(np.searchsorted(v, p, side="left")))
    lanes_j = jnp.asarray(lanes, jnp.int32)
    poss_j = jnp.asarray(poss, jnp.int64)
    got_rank = np.asarray(ef_rank(batch, lanes_j, poss_j))
    np.testing.assert_array_equal(got_rank, want_rank)

    # predecessor1 (largest <= pos) / successor1 (smallest >= pos): restrict
    # probes to where they exist, as the reference's asserts require
    pl, pp, want_pred = [], [], []
    sl, sp, want_succ = [], [], []
    for b, v in enumerate(lists):
        for p in rng.integers(0, int(v[-1]) + 1, 25):
            if (v <= p).any():
                pl.append(b); pp.append(int(p)); want_pred.append(int(v[v <= p].max()))
            if (v >= p).any():
                sl.append(b); sp.append(int(p)); want_succ.append(int(v[v >= p].min()))
    np.testing.assert_array_equal(
        np.asarray(ef_predecessor1(batch, jnp.asarray(pl, jnp.int32),
                                   jnp.asarray(pp, jnp.int64))), want_pred)
    np.testing.assert_array_equal(
        np.asarray(ef_successor1(batch, jnp.asarray(sl, jnp.int32),
                                 jnp.asarray(sp, jnp.int64))), want_succ)

    # delta: select(n) - select(n-1), select(0) at n=0
    dl, dn, want_delta = [], [], []
    for b, v in enumerate(lists):
        for n in rng.choice(len(v), size=min(len(v), 15), replace=False):
            dl.append(b); dn.append(int(n))
            want_delta.append(int(v[n]) - (int(v[n - 1]) if n else 0)
                              if n else int(v[0]))
    np.testing.assert_array_equal(
        np.asarray(ef_delta(batch, jnp.asarray(dl, jnp.int32),
                            jnp.asarray(dn, jnp.int64))), want_delta)

    # select_range: (select(n), select(n+1)), n+1 < m
    rl, rn, want_a, want_b = [], [], [], []
    for b, v in enumerate(lists):
        for n in rng.choice(len(v) - 1, size=min(len(v) - 1, 10), replace=False):
            rl.append(b); rn.append(int(n))
            want_a.append(int(v[n])); want_b.append(int(v[n + 1]))
    got_a, got_b = ef_select_range(batch, jnp.asarray(rl, jnp.int32),
                                   jnp.asarray(rn, jnp.int64))
    np.testing.assert_array_equal(np.asarray(got_a), want_a)
    np.testing.assert_array_equal(np.asarray(got_b), want_b)


def test_decode_all_select_forms_identical(monkeypatch):
    """count-select (small graph shapes) and scatter-select (large invlist
    shapes) must produce identical decodes — the gate is a perf choice."""
    import vector_db_id_compression_tpu.codecs.elias_fano as ef_mod

    rng = np.random.default_rng(5)
    lists = [_rand_sorted(rng, m, 10**6) for m in (32, 7, 1, 31, 0)]
    batch = batch_ef_lists([ef_encode_list(v) for v in lists])
    n_max = 32
    monkeypatch.setattr(ef_mod, "_EF_COUNT_SELECT_CELLS", 10**9)
    by_count = np.asarray(ef_mod.ef_decode_all(batch, n_max))
    monkeypatch.setattr(ef_mod, "_EF_COUNT_SELECT_CELLS", 0)
    by_scatter = np.asarray(ef_mod.ef_decode_all(batch, n_max))
    np.testing.assert_array_equal(by_count, by_scatter)
    for b, v in enumerate(lists):
        np.testing.assert_array_equal(by_count[b, : len(v)], v)
