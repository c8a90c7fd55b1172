"""Artifact round-trip: every container variant save→load→identical behavior
and byte-stable artifacts across saves (determinism contract)."""

import numpy as np
import pytest

from vector_db_id_compression_tpu.store.invlists import (
    EliasFanoInvertedLists,
    InvertedLists,
    PackedBitsInvertedLists,
    RocInvertedLists,
    WaveletTreeInvertedLists,
)
from vector_db_id_compression_tpu.store.serialize import load_invlists, save_invlists

CODE_SIZE = 4


def _make_source(rng, nlist=12, ntotal=600):
    il = InvertedLists(nlist, CODE_SIZE)
    assignment = rng.integers(0, nlist, size=ntotal)
    for ln in range(nlist):
        ids = np.flatnonzero(assignment == ln).astype(np.uint64)
        codes = rng.integers(0, 256, size=len(ids) * CODE_SIZE).astype(np.uint8)
        il.add_entries(ln, ids, codes)
    return il


@pytest.mark.parametrize(
    "variant",
    [RocInvertedLists, EliasFanoInvertedLists, PackedBitsInvertedLists,
     WaveletTreeInvertedLists],
)
def test_roundtrip(tmp_path, variant):
    rng = np.random.default_rng(0)
    il = _make_source(rng)
    comp = variant(il)
    path = tmp_path / "artifact.npz"
    save_invlists(path, comp)
    loaded = load_invlists(path)
    assert type(loaded) is type(comp)
    assert loaded.compressed_ids_size_in_bytes == comp.compressed_ids_size_in_bytes
    for ln in range(il.nlist):
        np.testing.assert_array_equal(loaded.get_ids(ln), comp.get_ids(ln))
        np.testing.assert_array_equal(loaded.get_codes(ln), comp.get_codes(ln))
    if comp.supports_random_access:
        lns = np.array([1, 5, 5, 0])
        offs = np.array([0, 1, 2, 0])
        ok = np.array([il.list_size(int(l)) > int(o) for l, o in zip(lns, offs)])
        np.testing.assert_array_equal(
            loaded.get_single_ids_batch(lns[ok], offs[ok]),
            comp.get_single_ids_batch(lns[ok], offs[ok]),
        )


def test_artifact_byte_stable(tmp_path):
    rng = np.random.default_rng(1)
    il = _make_source(rng)
    comp = RocInvertedLists(il)
    p1, p2 = tmp_path / "a1.npz", tmp_path / "a2.npz"
    save_invlists(p1, comp)
    save_invlists(p2, comp)
    assert p1.read_bytes() == p2.read_bytes()


def test_roundtrip_interleaved(tmp_path):
    """roc-interleaved container (ADVICE r1: was missing from _KIND) —
    exercise both the chunked (>= interleave_min) and single-stream paths."""
    from vector_db_id_compression_tpu.store.invlists import (
        InterleavedRocInvertedLists,
    )

    rng = np.random.default_rng(3)
    il = InvertedLists(4, CODE_SIZE)
    sizes = [700, 40, 0, 260]  # 700 >= interleave_min=128 → chunked
    base = 0
    for ln, n in enumerate(sizes):
        ids = (rng.choice(10**6, size=n, replace=False).astype(np.uint64)
               if n else np.empty(0, np.uint64))
        il.add_entries(ln, ids,
                       rng.integers(0, 256, n * CODE_SIZE).astype(np.uint8))
        base += n
    comp = InterleavedRocInvertedLists(il, interleave=4, interleave_min=128)
    path = tmp_path / "inter.npz"
    save_invlists(path, comp)
    loaded = load_invlists(path)
    assert type(loaded) is InterleavedRocInvertedLists
    assert loaded.compressed_ids_size_in_bytes == comp.compressed_ids_size_in_bytes
    assert loaded.overhead_in_bytes == comp.overhead_in_bytes
    for ln in range(il.nlist):
        np.testing.assert_array_equal(loaded.get_ids(ln), comp.get_ids(ln))
        np.testing.assert_array_equal(loaded.get_codes(ln), comp.get_codes(ln))
