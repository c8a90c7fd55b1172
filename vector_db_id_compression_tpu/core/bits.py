"""Bit-vector plumbing: packing, rank/select over batched packed bitvectors.

Replaces the reference's external succinct primitives (bit_vector, darray1
select dictionaries, broadword msb/popcount — included at
custom_invlists_impl.h:14-16) and Faiss BitstringReader/Writer semantics
(bit-offset reader reimplemented at custom_invlists_impl.cpp:35-58).

Canonical layout: a bitstream is a little-endian sequence over uint32 words —
bit j of the stream is bit (j % 32) of word (j // 32). Fixed-width fields are
written LSB-first (matching Faiss BitstringWriter semantics so packed-bits
containers serialize the same way the reference reads them).

Host side: vectorized numpy pack/unpack (build time).
Device side: rank/select over batches of packed bitvectors. Instead of the
reference's darray select dictionary (sampled select positions + inline
blocks), we keep a per-word prefix popcount — `select1(k)` is a binary search
over the prefix array plus an in-word bit scan, both dense vector ops over
query batches; `rank1` is a gather + masked popcount. This shape is
XLA-friendly (static shapes, no pointer chasing) and the index is O(1 word per
32 bits), comparable to darray overhead.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# host (numpy) packing
# ---------------------------------------------------------------------------


def np_pack_fixed(values: np.ndarray, width: int, total_bits: int | None = None) -> np.ndarray:
    """Pack ``values`` as consecutive ``width``-bit fields, LSB-first, into a
    uint32 word array. Vectorized (no Python loop over elements)."""
    values = np.asarray(values, dtype=np.uint64)
    m = len(values)
    if total_bits is None:
        total_bits = m * width
    nwords = (total_bits + 31) // 32
    if width == 0 or m == 0:
        return np.zeros(nwords, dtype=np.uint32)
    # bit matrix [m, width] -> flat stream
    bits = ((values[:, None] >> np.arange(width, dtype=np.uint64)) & np.uint64(1)).astype(np.uint8)
    flat = np.zeros(nwords * 32, dtype=np.uint8)
    flat[: m * width] = bits.reshape(-1)
    weights = (np.uint32(1) << np.arange(32, dtype=np.uint32))
    return (flat.reshape(nwords, 32).astype(np.uint32) * weights).sum(axis=1).astype(np.uint32)


def np_unpack_fixed(words: np.ndarray, width: int, count: int) -> np.ndarray:
    """Inverse of np_pack_fixed → uint64[count]."""
    if width == 0:
        return np.zeros(count, dtype=np.uint64)
    words = np.asarray(words, dtype=np.uint32)
    flat = ((words[:, None] >> np.arange(32, dtype=np.uint32)) & np.uint32(1)).reshape(-1)
    bits = flat[: count * width].reshape(count, width).astype(np.uint64)
    return (bits << np.arange(width, dtype=np.uint64)).sum(axis=1, dtype=np.uint64)


def np_set_bits(positions: np.ndarray, nbits: int) -> np.ndarray:
    """Bitvector with 1s at ``positions`` (distinct), packed uint32 words."""
    nwords = (nbits + 31) // 32
    words = np.zeros(nwords, dtype=np.uint32)
    positions = np.asarray(positions, dtype=np.int64)
    np.bitwise_or.at(words, positions >> 5, (np.uint32(1) << (positions & 31).astype(np.uint32)))
    return words


# ---------------------------------------------------------------------------
# device (JAX) rank/select over batched packed bitvectors
# ---------------------------------------------------------------------------


class BitVectorBatch(NamedTuple):
    """B packed bitvectors, equal word-padded, with a prefix-popcount index.

    words:  u32[B, W]
    prefix: i32[B, W]  cumulative popcount *through* each word (inclusive)
    nbits:  i32[B]     logical lengths
    """

    words: jax.Array
    prefix: jax.Array
    nbits: jax.Array

    @property
    def total_ones(self) -> jax.Array:
        return self.prefix[:, -1]


def build_bitvector_batch(words: jax.Array, nbits: jax.Array) -> BitVectorBatch:
    pops = jax.lax.population_count(words).astype(jnp.int32)
    return BitVectorBatch(words, jnp.cumsum(pops, axis=1), nbits)


def _select_in_word(word: jax.Array, k: jax.Array) -> jax.Array:
    """Position of the (k+1)-th set bit within each u32 word (k 0-based).
    Dense over the trailing 32-lane axis."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (word[..., None] >> shifts) & jnp.uint32(1)
    cum = jnp.cumsum(bits.astype(jnp.int32), axis=-1)
    return jnp.argmax(cum == (k[..., None] + 1), axis=-1).astype(jnp.int32)


def select1_batch(bv: BitVectorBatch, lane: jax.Array, k: jax.Array) -> jax.Array:
    """Bit position of the (k+1)-th set bit (k 0-based) in bitvector ``lane``,
    vectorized over parallel query arrays ``lane``/``k`` of equal shape."""
    prefix = bv.prefix[lane]          # [..., W]
    # first word whose inclusive prefix exceeds k
    word_idx = jnp.sum((prefix <= k[..., None]).astype(jnp.int32), axis=-1)
    word_idx = jnp.clip(word_idx, 0, bv.words.shape[1] - 1)
    before = jnp.where(word_idx > 0,
                       jnp.take_along_axis(bv.prefix[lane],
                                           jnp.maximum(word_idx - 1, 0)[..., None],
                                           axis=-1)[..., 0],
                       0)
    word = bv.words[lane, word_idx]
    return word_idx * 32 + _select_in_word(word, k - before)


def rank1_batch(bv: BitVectorBatch, lane: jax.Array, pos: jax.Array) -> jax.Array:
    """Count of set bits strictly below ``pos``."""
    word_idx = pos >> 5
    bit = (pos & 31).astype(jnp.uint32)
    before = jnp.where(word_idx > 0,
                       bv.prefix[lane, jnp.maximum(word_idx - 1, 0)],
                       0)
    word = bv.words[lane, word_idx]
    mask = jnp.where(bit > 0, (jnp.uint32(1) << bit) - jnp.uint32(1), jnp.uint32(0))
    return before + jax.lax.population_count(word & mask).astype(jnp.int32)


@partial(jax.jit, static_argnums=(1,))
def get_fixed_fields(words: jax.Array, width: int, idx: jax.Array) -> jax.Array:
    """Read the ``idx``-th LSB-first ``width``-bit fields from packed u32
    words [B, W]; idx i32[B, Q] per-lane query offsets → u64[B, Q].

    Equivalent of the reference's bit-offset BitstringReader
    (custom_invlists_impl.cpp:35-58), vectorized over queries.
    """
    if width == 0:
        return jnp.zeros(idx.shape, dtype=jnp.uint64)
    if width > 32:
        raise ValueError("get_fixed_fields supports widths <= 32 bits")
    B = words.shape[0]
    start = idx.astype(jnp.int64) * width
    w0 = (start >> 5).astype(jnp.int32)
    off = (start & 31).astype(jnp.uint64)
    lane = jnp.arange(B, dtype=jnp.int32)[:, None]
    lo = words[lane, w0].astype(jnp.uint64)
    hi = words[lane, jnp.minimum(w0 + 1, words.shape[1] - 1)].astype(jnp.uint64)
    # width <= 32 and off < 32, so two words always cover the field
    val = (lo | (hi << jnp.uint64(32))) >> off
    return val & ((jnp.uint64(1) << jnp.uint64(width)) - jnp.uint64(1))
