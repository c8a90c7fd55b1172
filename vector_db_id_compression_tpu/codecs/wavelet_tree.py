"""Wavelet tree over the cluster-assignment string.

The reference inverts the IVF: it builds the length-ntotal string
``list_nos[id] = list_no`` and wraps it in an SDSL ``wt_int`` (plain bitvector
or rrr_vector<63>-compressed), so ``get_single_id(list_no, offset)`` is
``wt.select(offset+1, list_no)`` (custom_invlists_impl.cpp:346-392).

This is a from-scratch levelwise balanced wavelet tree designed for batched
device queries:

  build (host, vectorized): level-l sequence is the stable sort of the
    symbols by their top-l bits (stable sorts compose, so no per-node
    partitioning loop); each level stores one packed bitvector of the
    current bit plane plus an inclusive per-word prefix popcount.

  select (device): the classic two-sweep walk — a top-down pass computes the
    node interval along the symbol's bit path via rank, a bottom-up pass
    lifts the leaf offset through select0/select1 at each level. Both
    rank and select are O(log W) per query via ``jnp.searchsorted`` over the
    prefix-popcount arrays, fully vectorized over (symbol, offset) query
    batches — the TPU replacement for SDSL's pointer-walking select.

Levels L = ceil(log2(sigma)) with sigma = alphabet size (nlist); symbols must
be < 2**L. Total payload: L * ntotal bits (+ index), the wavelet-tree rate the
paper's Table 2 reports.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.bits import np_pack_fixed


def wt_levels(sigma: int) -> int:
    """Number of bit planes for alphabet size sigma (>=1 symbol)."""
    return max(1, int(sigma - 1).bit_length()) if sigma > 1 else 1


class WaveletTree(NamedTuple):
    words: jax.Array    # u32[L, W] packed bit planes
    prefix1: jax.Array  # i64[L, W] inclusive popcount per word
    n: int              # sequence length
    levels: int

    @property
    def size_in_bits(self) -> int:
        """Payload bits (bit planes only), matching the plain-wt accounting
        granularity of the reference (index overhead reported separately)."""
        return self.levels * self.n

    @property
    def index_size_in_bits(self) -> int:
        return int(self.prefix1.size) * 32  # prefix index, i32-equivalent


def build_wavelet_tree(symbols: np.ndarray, sigma: int) -> WaveletTree:
    """Host build. ``symbols``: u32[n] values in [0, sigma)."""
    symbols = np.asarray(symbols, dtype=np.uint32)
    n = len(symbols)
    L = wt_levels(sigma)
    W = max((n + 31) // 32, 1)
    words = np.zeros((L, W), dtype=np.uint32)
    prefix1 = np.zeros((L, W), dtype=np.int64)
    for l in range(L):
        # level-l sequence = stable sort by top-l bits
        if l == 0:
            seq = symbols
        else:
            seq = symbols[np.argsort(symbols >> (L - l), kind="stable")]
        plane = ((seq >> (L - 1 - l)) & 1).astype(np.uint64)
        w = np_pack_fixed(plane, 1, total_bits=W * 32)
        words[l, : len(w)] = w
        prefix1[l] = np.cumsum(_popcount_np(words[l]))
    return WaveletTree(jnp.asarray(words), jnp.asarray(prefix1), n, L)


def _popcount_np(x: np.ndarray) -> np.ndarray:
    return np.bitwise_count(x.astype(np.uint32)).astype(np.int64)


# ---------------------------------------------------------------------------
# device rank/select on one level
# ---------------------------------------------------------------------------


def _rank1(wt: WaveletTree, level: int, pos: jax.Array) -> jax.Array:
    """Set bits strictly below pos on a level; pos i64[Q]."""
    w = (pos >> 5).astype(jnp.int32)
    before = jnp.where(w > 0, wt.prefix1[level, jnp.maximum(w - 1, 0)], 0)
    bit = (pos & 31).astype(jnp.uint32)
    mask = jnp.where(bit > 0, (jnp.uint32(1) << bit) - jnp.uint32(1), jnp.uint32(0))
    inword = jax.lax.population_count(wt.words[level, w] & mask).astype(jnp.int64)
    return before + inword


def _select_in_word(word: jax.Array, k: jax.Array) -> jax.Array:
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (word[..., None] >> shifts) & jnp.uint32(1)
    cum = jnp.cumsum(bits.astype(jnp.int32), axis=-1)
    return jnp.argmax(cum == (k[..., None] + 1), axis=-1).astype(jnp.int64)


def _select1(wt: WaveletTree, level: int, k: jax.Array) -> jax.Array:
    """Position of (k+1)-th set bit (k 0-based); O(log W) searchsorted."""
    p = wt.prefix1[level]
    w = jnp.searchsorted(p, k + 1, side="left").astype(jnp.int32)
    w = jnp.clip(w, 0, p.shape[0] - 1)
    before = jnp.where(w > 0, p[jnp.maximum(w - 1, 0)], 0)
    return w.astype(jnp.int64) * 32 + _select_in_word(wt.words[level, w], k - before)


def _select0(wt: WaveletTree, level: int, k: jax.Array) -> jax.Array:
    p1 = wt.prefix1[level]
    W = p1.shape[0]
    p0 = (jnp.arange(W, dtype=jnp.int64) + 1) * 32 - p1
    w = jnp.searchsorted(p0, k + 1, side="left").astype(jnp.int32)
    w = jnp.clip(w, 0, W - 1)
    before = jnp.where(w > 0, p0[jnp.maximum(w - 1, 0)], 0)
    return w.astype(jnp.int64) * 32 + _select_in_word(~wt.words[level, w], k - before)


# ---------------------------------------------------------------------------
# wavelet-tree select: position of the (offset+1)-th occurrence of symbol
# ---------------------------------------------------------------------------


def _wt_select_generic(n: int, L: int, rank1, select0, select1,
                       symbol: jax.Array, offset: jax.Array) -> jax.Array:
    """The two-sweep select walk, parameterized over the level primitives
    (plain bit planes or RRR-compressed planes — codecs/rrr.py)."""
    symbol = symbol.astype(jnp.int64)
    offset = offset.astype(jnp.int64)

    # top-down: node interval [lo, hi) along the bit path; remember per level
    # the node start, its rank0/rank1 there, the branch bit, and child start
    lo = jnp.zeros_like(offset)
    hi = jnp.full_like(offset, n)
    per_level = []
    for l in range(L):
        b = (symbol >> (L - 1 - l)) & 1
        r1_lo = rank1(l, lo)
        r1_hi = rank1(l, hi)
        r0_lo = lo - r1_lo
        z = (hi - r1_hi) - r0_lo  # zeros inside [lo, hi)
        child_lo = jnp.where(b == 0, lo, lo + z)
        child_hi = jnp.where(b == 0, lo + z, hi)
        per_level.append((b, lo, r0_lo, r1_lo, child_lo))
        lo, hi = child_lo, child_hi

    # bottom-up: lift the in-leaf offset through select at each level
    p = lo + offset
    for l in reversed(range(L)):
        b, lo_l, r0_lo, r1_lo, child_lo = per_level[l]
        j = p - child_lo
        p = jnp.where(
            b == 0,
            select0(l, r0_lo + j),
            select1(l, r1_lo + j),
        )
    return p


def wt_select(wt: WaveletTree, symbol: jax.Array, offset: jax.Array) -> jax.Array:
    """Vectorized over query arrays: global position (the vector id) of the
    (offset+1)-th occurrence of ``symbol`` (0-based offset) — the reference's
    wt.select(offset+1, list_no) (custom_invlists_impl.cpp:377-379).

    Two sweeps over the L levels; every step is a batched rank or select.
    """
    return _wt_select_generic(
        wt.n, wt.levels,
        lambda l, pos: _rank1(wt, l, pos),
        lambda l, k: _select0(wt, l, k),
        lambda l, k: _select1(wt, l, k),
        symbol, offset,
    )


def wt_select_rrr(rrr, symbol: jax.Array, offset: jax.Array) -> jax.Array:
    """wt_select over RRR(63)-compressed bit planes (wt_type 1 —
    sdsl::wt_int<rrr_vector<63>> parity, custom_invlists_impl.cpp:367-373)."""
    from .rrr import rrr_rank1, rrr_select0, rrr_select1

    return _wt_select_generic(
        rrr.n, rrr.levels,
        lambda l, pos: rrr_rank1(rrr, l, pos),
        lambda l, k: rrr_select0(rrr, l, k),
        lambda l, k: rrr_select1(rrr, l, k),
        symbol, offset,
    )


def wt_planes(symbols: np.ndarray, sigma: int) -> np.ndarray:
    """The raw bit planes u8[L, n] of the levelwise tree (for RRR storage)."""
    symbols = np.asarray(symbols, dtype=np.uint32)
    n = len(symbols)
    L = wt_levels(sigma)
    planes = np.zeros((L, n), dtype=np.uint8)
    for l in range(L):
        seq = symbols if l == 0 else symbols[
            np.argsort(symbols >> (L - l), kind="stable")]
        planes[l] = ((seq >> (L - 1 - l)) & 1).astype(np.uint8)
    return planes
