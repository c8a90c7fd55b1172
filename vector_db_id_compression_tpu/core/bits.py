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
Device side: rank/select over batches of packed bitvectors, with a **sampled
superblock directory** — one cumulative-popcount word per ``SB_WORDS``
payload words (SB_WORDS=16 → one i32 per 512 bits, 6.25% overhead — the
darray-class footprint of the reference's select dictionary,
elias_fano.hpp:141-145, instead of the 100% a per-word prefix would cost).
``select1(k)``: binary search over the superblock directory, then a dense
popcount-cumsum over the superblock's 16-word window, then an in-word bit
scan — all static-shape vector ops over query batches. ``rank1``: superblock
prefix + masked popcount over the window. XLA-friendly: no pointer chasing,
every query in a batch takes the identical instruction path.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# superblock size: 16 u32 words = 512 bits per directory entry
SB_WORDS = 16
SB_BITS = SB_WORDS * 32

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
    """B packed bitvectors, word-padded to a superblock multiple, with a
    sampled-popcount select/rank directory.

    words:     u32[B, W]   W is a multiple of SB_WORDS
    sb_prefix: i32[B, SB]  cumulative popcount *through* each superblock
                           (inclusive), SB = W // SB_WORDS
    nbits:     i32[B]      logical lengths
    """

    words: jax.Array
    sb_prefix: jax.Array
    nbits: jax.Array

    @property
    def total_ones(self) -> jax.Array:
        return self.sb_prefix[:, -1]


def directory_entries(nbits: int) -> int:
    """Directory entries a bitvector of ``nbits`` logical bits needs — the
    per-list overhead accounting unit (one i32 per entry)."""
    return max((int(nbits) + SB_BITS - 1) // SB_BITS, 1)


def build_bitvector_batch(words: jax.Array, nbits: jax.Array) -> BitVectorBatch:
    words = jnp.asarray(words, dtype=jnp.uint32)
    B, W = words.shape
    Wp = ((W + SB_WORDS - 1) // SB_WORDS) * SB_WORDS
    if Wp != W:
        words = jnp.pad(words, ((0, 0), (0, Wp - W)))
    pops = jax.lax.population_count(words).astype(jnp.int32)
    sb = jnp.cumsum(pops.reshape(B, Wp // SB_WORDS, SB_WORDS).sum(axis=2), axis=1)
    return BitVectorBatch(words, sb, jnp.asarray(nbits, jnp.int32))


def _select_in_word(word: jax.Array, k: jax.Array) -> jax.Array:
    """Position of the (k+1)-th set bit within each u32 word (k 0-based).
    Dense over the trailing 32-lane axis."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (word[..., None] >> shifts) & jnp.uint32(1)
    cum = jnp.cumsum(bits.astype(jnp.int32), axis=-1)
    return jnp.argmax(cum == (k[..., None] + 1), axis=-1).astype(jnp.int32)


def _window(words: jax.Array, lane: jax.Array, sb: jax.Array) -> jax.Array:
    """Gather one superblock's SB_WORDS-word window per query → u32[..., S]."""
    widx = sb[..., None] * SB_WORDS + jnp.arange(SB_WORDS, dtype=jnp.int32)
    return words[lane[..., None], widx]


def select1_batch(bv: BitVectorBatch, lane: jax.Array, k: jax.Array) -> jax.Array:
    """Bit position of the (k+1)-th set bit (k 0-based) in bitvector ``lane``,
    vectorized over parallel query arrays ``lane``/``k`` of equal shape."""
    sbp = bv.sb_prefix[lane]                                  # [..., SB]
    # first superblock whose inclusive prefix exceeds k
    sb = jnp.sum((sbp <= k[..., None]).astype(jnp.int32), axis=-1)
    sb = jnp.clip(sb, 0, bv.sb_prefix.shape[1] - 1)
    before_sb = jnp.where(
        sb > 0,
        jnp.take_along_axis(sbp, jnp.maximum(sb - 1, 0)[..., None], axis=-1)[..., 0],
        0,
    )
    win = _window(bv.words, lane, sb)                         # [..., S]
    cum = jnp.cumsum(jax.lax.population_count(win).astype(jnp.int32), axis=-1)
    k_rel = k - before_sb
    rel = jnp.sum((cum <= k_rel[..., None]).astype(jnp.int32), axis=-1)
    rel = jnp.clip(rel, 0, SB_WORDS - 1)
    before = before_sb + jnp.where(
        rel > 0,
        jnp.take_along_axis(cum, jnp.maximum(rel - 1, 0)[..., None], axis=-1)[..., 0],
        0,
    )
    word = jnp.take_along_axis(win, rel[..., None], axis=-1)[..., 0]
    return (sb * SB_WORDS + rel) * 32 + _select_in_word(word, k - before)


def rank1_batch(bv: BitVectorBatch, lane: jax.Array, pos: jax.Array) -> jax.Array:
    """Count of set bits strictly below ``pos``."""
    word_idx = pos >> 5
    # pos == 32*W (rank of the whole vector) lands one superblock past the
    # end; clamp — the full-window masks then count the whole last superblock
    sb = jnp.minimum(word_idx // SB_WORDS, bv.sb_prefix.shape[1] - 1)
    before_sb = jnp.where(
        sb > 0, bv.sb_prefix[lane, jnp.maximum(sb - 1, 0)], 0
    )
    win = _window(bv.words, lane, sb)                         # [..., S]
    g = sb[..., None] * SB_WORDS + jnp.arange(SB_WORDS, dtype=jnp.int32)
    bit = (pos & 31).astype(jnp.uint32)[..., None]
    part_mask = jnp.where(bit > 0, (jnp.uint32(1) << bit) - jnp.uint32(1), jnp.uint32(0))
    mask = jnp.where(
        g < word_idx[..., None],
        jnp.uint32(0xFFFFFFFF),
        jnp.where(g == word_idx[..., None], part_mask, jnp.uint32(0)),
    )
    inwin = jax.lax.population_count(win & mask).astype(jnp.int32).sum(axis=-1)
    return before_sb + inwin


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
