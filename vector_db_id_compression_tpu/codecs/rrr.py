"""RRR(63) compressed bitvectors with device rank/select.

Reference parity: the wavelet-tree invlists' ``wt_type 1`` wraps its bit
planes in ``sdsl::rrr_vector<63>`` (custom_invlists_impl.cpp:367-373). This
is the from-scratch equivalent:

  - blocks of 63 bits, each stored as a 6-bit *class* (its popcount k) plus
    a ceil(log2(C(63,k)))-bit *offset* (the block's combinatorial rank among
    all 63-bit words of popcount k) — the classic H0-compressed layout;
  - a **sampled superblock directory** (SB_BLOCKS=16 blocks = 1008 bits per
    entry): cumulative rank and cumulative offset-bit-start per superblock —
    the SDSL superblock-pointer scheme itself, a few percent overhead
    instead of per-block pointers. Within a superblock both quantities are
    recovered on device from the stored classes (a dense 16-wide gather +
    masked sum — no pointers);
  - **device** rank/select: block lookup is a searchsorted over the sampled
    rank directory; the touched block is combinatorially unranked on the fly
    with a 63-step `lax.fori_loop` over a u64 binomial table (regular XLA,
    not Pallas — u64 arithmetic is available here).

Build is host-side numpy (vectorized over blocks; the only Python loop is
over the 63 in-block positions).
"""

from __future__ import annotations

from math import comb
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BLOCK = 63
SB_BLOCKS = 16                 # blocks per superblock directory entry
SB_BITS = SB_BLOCKS * BLOCK    # 1008 payload bits per entry

# binomial table C[n][k] for n,k <= 63; C(63,31) ~ 9.16e17 < 2^63 fits u64
_C = np.zeros((BLOCK + 1, BLOCK + 1), dtype=np.uint64)
for _n in range(BLOCK + 1):
    for _k in range(_n + 1):
        _C[_n, _k] = comb(_n, _k)

# offset field width per class
OFF_BITS = np.array(
    [int(_C[BLOCK, k] - 1).bit_length() if 0 < k < BLOCK else 0
     for k in range(BLOCK + 1)],
    dtype=np.int32,
)


class RRRPlanes(NamedTuple):
    """L stacked RRR bitvectors (one per wavelet-tree level)."""

    classes: jax.Array       # i32[L, NB] block popcounts (the 6-bit classes),
    #                          NB padded to a SB_BLOCKS multiple
    off_words: jax.Array     # u32[L, OW] packed offset fields
    sb_off_start: jax.Array  # i64[L, NSB] bit-start of each superblock's offsets
    sb_rank: jax.Array       # i64[L, NSB] inclusive popcount through superblock
    n: int                   # bits per plane
    levels: int

    @property
    def payload_bits(self) -> int:
        """Exact RRR payload: 6 class bits + offset bits per block."""
        cls = np.asarray(self.classes)
        return int(6 * cls.size + OFF_BITS[cls].sum())

    @property
    def index_bits(self) -> int:
        """Sampled directory (SDSL superblock-pointer parity): one
        (rank, offset-start) pair per SB_BLOCKS blocks, counted at the
        widths a tight packing needs."""
        nsb = np.asarray(self.sb_rank).shape[1]
        rank_w = max(int(self.n).bit_length(), 1)
        start_w = max(int(np.asarray(self.sb_off_start).max(initial=1))
                      .bit_length(), 1)
        return self.levels * nsb * (rank_w + start_w)


def _block_offsets_host(blocks: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """blocks u8[NB, 63] -> (classes i32[NB], offsets u64[NB]):
    combinatorial rank of each block among 63-bit words of its popcount."""
    NB = blocks.shape[0]
    k_rem = blocks.sum(axis=1).astype(np.int64)
    classes = k_rem.astype(np.int32)
    off = np.zeros(NB, dtype=np.uint64)
    for i in range(BLOCK):
        ones = blocks[:, i] == 1
        # positions after i: BLOCK-1-i; choosing a 1 here skips all blocks
        # with a 0 at i, i.e. C(BLOCK-1-i, k_rem) patterns
        off[ones] += _C[BLOCK - 1 - i, np.clip(k_rem[ones], 0, BLOCK)]
        k_rem[ones] -= 1
    return classes, off


def rrr_encode_planes(planes: np.ndarray) -> RRRPlanes:
    """planes u8[L, n] of 0/1 -> stacked RRR vectors."""
    planes = np.asarray(planes, dtype=np.uint8)
    L, n = planes.shape
    NSB = max((n + SB_BITS - 1) // SB_BITS, 1)
    NB = NSB * SB_BLOCKS
    padded = np.zeros((L, NB * BLOCK), dtype=np.uint8)
    padded[:, :n] = planes
    blocks = padded.reshape(L, NB, BLOCK)

    classes = np.zeros((L, NB), dtype=np.int32)
    offsets = np.zeros((L, NB), dtype=np.uint64)
    for l in range(L):
        classes[l], offsets[l] = _block_offsets_host(blocks[l])

    widths = OFF_BITS[classes]                       # i32[L, NB]
    off_start = np.zeros((L, NB), dtype=np.int64)
    off_start[:, 1:] = np.cumsum(widths, axis=1)[:, :-1]
    total_bits = int(widths.sum(axis=1).max()) if NB else 0
    OW = max((total_bits + 31) // 32, 1)
    bitarr = np.zeros((L, OW * 32), dtype=np.uint8)
    max_w = int(widths.max(initial=0))
    for j in range(max_w):
        sel = widths > j                             # [L, NB]
        pos = off_start[sel] + j
        bits = ((offsets[sel] >> np.uint64(j)) & np.uint64(1)).astype(np.uint8)
        rows = np.nonzero(sel)[0]
        bitarr[rows, pos] = bits
    # pack LSB-first into u32 words
    weights = (1 << np.arange(32, dtype=np.uint32))
    off_words = (bitarr.reshape(L, OW, 32).astype(np.uint32)
                 * weights[None, None, :]).sum(axis=2, dtype=np.uint32)

    # sampled directory: per-superblock offset start + inclusive rank
    sb_off_start = off_start[:, ::SB_BLOCKS].copy()
    sb_rank = np.cumsum(
        classes.reshape(L, NSB, SB_BLOCKS).sum(axis=2, dtype=np.int64), axis=1)
    return RRRPlanes(
        classes=jnp.asarray(classes),
        off_words=jnp.asarray(off_words),
        sb_off_start=jnp.asarray(sb_off_start),
        sb_rank=jnp.asarray(sb_rank),
        n=n, levels=L,
    )


# ---------------------------------------------------------------------------
# device block decode (combinatorial unranking)
# ---------------------------------------------------------------------------

_C_dev = jnp.asarray(_C)                 # u64[64, 64]
_OFF_BITS_dev = jnp.asarray(OFF_BITS)    # i32[64]


def _class_window(rrr: RRRPlanes, level: int, sb: jax.Array) -> jax.Array:
    """Gather each query's superblock of classes → i32[Q, SB_BLOCKS].

    Fetched as ROWS of the [L*NSB, SB_BLOCKS] view (fast major-dim row
    gather) instead of a minor-dim element gather from i32[L, NB]."""
    NSB = rrr.classes.shape[1] // SB_BLOCKS
    rows = rrr.classes.reshape(rrr.classes.shape[0] * NSB, SB_BLOCKS)
    return rows[level * NSB + sb]


def _block_start_and_rank(rrr: RRRPlanes, level: int, blk: jax.Array):
    """(offset bit-start, exclusive rank) of each queried block, recovered
    from the sampled directory + the class window."""
    sb = blk // SB_BLOCKS
    rel = blk - sb * SB_BLOCKS
    cls = _class_window(rrr, level, sb)                     # [Q, S]
    widths = _OFF_BITS_dev[cls].astype(jnp.int64)
    before = jnp.arange(SB_BLOCKS, dtype=jnp.int64) < rel[..., None]
    start = rrr.sb_off_start[level, sb] + jnp.sum(
        jnp.where(before, widths, 0), axis=-1)
    rank_before_sb = jnp.where(
        sb > 0, rrr.sb_rank[level, jnp.maximum(sb - 1, 0)], 0)
    rank = rank_before_sb + jnp.sum(
        jnp.where(before, cls.astype(jnp.int64), 0), axis=-1)
    return start, rank


def _read_offset(rrr: RRRPlanes, level: int, blk: jax.Array,
                 start: jax.Array) -> jax.Array:
    """Read each queried block's packed offset field -> u64[Q]."""
    width = _OFF_BITS_dev[rrr.classes[level, blk]]  # i32[Q]
    w = (start >> 5).astype(jnp.int32)
    s = (start & 31).astype(jnp.uint32)
    OW = rrr.off_words.shape[1]
    w0 = rrr.off_words[level, jnp.clip(w, 0, OW - 1)].astype(jnp.uint64)
    w1 = rrr.off_words[level, jnp.clip(w + 1, 0, OW - 1)].astype(jnp.uint64)
    w2 = rrr.off_words[level, jnp.clip(w + 2, 0, OW - 1)].astype(jnp.uint64)
    lo64 = w0 | (w1 << jnp.uint64(32))
    s64 = s.astype(jnp.uint64)
    val = lo64 >> s64
    hi_part = jnp.where(s64 > 0, w2 << (jnp.uint64(64) - s64), jnp.uint64(0))
    val = val | hi_part
    mask = jnp.where(
        width >= 63,
        jnp.uint64(0xFFFFFFFFFFFFFFFF),
        (jnp.uint64(1) << width.astype(jnp.uint64)) - jnp.uint64(1),
    )
    return val & mask


def _unrank_bits(off0: jax.Array, k0: jax.Array) -> jax.Array:
    """Combinatorially unrank offsets -> u64[Q] bitmasks (bit i = pos i).

    The binomial lookup C(BLOCK-1-i, k) fetches the step's table ROW
    (contiguous, step index is the loop counter) and selects the per-query
    entry with a masked reduce over the 64-wide class axis — a scattered
    [Q]-element gather per step would serialize on TPU."""
    iota64 = jnp.arange(BLOCK + 1, dtype=jnp.int32)

    def step(i, carry):
        off, k, bits = carry
        row = jax.lax.dynamic_index_in_dim(
            _C_dev, BLOCK - 1 - i, axis=0, keepdims=False)      # u64[64]
        c = jnp.sum(
            jnp.where(k[..., None] == iota64, row, jnp.uint64(0)), axis=-1)
        take = (off >= c) & (k > 0)
        off = jnp.where(take, off - c, off)
        bits = bits | jnp.where(
            take, jnp.uint64(1) << i.astype(jnp.uint64), jnp.uint64(0))
        k = k - take.astype(jnp.int32)
        return off, k, bits

    _, _, bits = jax.lax.fori_loop(
        0, BLOCK, step, (off0, k0, jnp.zeros_like(off0)))
    return bits


def _decode_blocks(rrr: RRRPlanes, level: int, blk: jax.Array) -> jax.Array:
    """Unrank queried blocks -> u64[Q] bitmasks (bit i = position i)."""
    start, _ = _block_start_and_rank(rrr, level, blk)
    k0 = rrr.classes[level, blk].astype(jnp.int32)
    off0 = _read_offset(rrr, level, blk, start)
    return _unrank_bits(off0, k0)


def rrr_rank1(rrr: RRRPlanes, level: int, pos: jax.Array) -> jax.Array:
    """Set bits strictly below pos; pos i64[Q]."""
    NB = rrr.classes.shape[1]
    blk = jnp.clip((pos // BLOCK).astype(jnp.int64), 0, NB - 1)
    _, before = _block_start_and_rank(rrr, level, blk)
    m = (pos - blk * BLOCK).astype(jnp.uint64)
    bits = _decode_blocks(rrr, level, blk)
    mask = (jnp.uint64(1) << jnp.minimum(m, jnp.uint64(BLOCK))) - jnp.uint64(1)
    inblk = jax.lax.population_count(bits & mask).astype(jnp.int64)
    return before + inblk


def _select_in_block(bits: jax.Array, j: jax.Array, invert: bool) -> jax.Array:
    """(j+1)-th set (or clear) position within the 63-bit block."""
    shifts = jnp.arange(BLOCK, dtype=jnp.uint64)
    b = ((bits[..., None] >> shifts) & jnp.uint64(1)).astype(jnp.int32)
    if invert:
        b = 1 - b
    cum = jnp.cumsum(b, axis=-1)
    return jnp.argmax(cum == (j[..., None] + 1), axis=-1).astype(jnp.int64)


def _rrr_select(rrr: RRRPlanes, level: int, k: jax.Array, invert: bool) -> jax.Array:
    """Shared select over ones/zeros: searchsorted over the sampled rank
    directory, class-window cumsum to the block, then unrank + in-block scan."""
    sbr = rrr.sb_rank[level]
    NSB = sbr.shape[0]
    if invert:
        counts = (jnp.arange(NSB, dtype=jnp.int64) + 1) * SB_BITS - sbr
    else:
        counts = sbr
    sb = jnp.clip(jnp.searchsorted(counts, k + 1, side="left").astype(jnp.int64),
                  0, NSB - 1)
    before_sb = jnp.where(sb > 0, counts[jnp.maximum(sb - 1, 0)], 0)
    cls = _class_window(rrr, level, sb).astype(jnp.int64)     # [Q, S]
    per_blk = (BLOCK - cls) if invert else cls
    cum = jnp.cumsum(per_blk, axis=-1)
    k_rel = k - before_sb
    rel = jnp.clip(jnp.sum((cum <= k_rel[..., None]).astype(jnp.int64), axis=-1),
                   0, SB_BLOCKS - 1)
    before = before_sb + jnp.where(
        rel > 0,
        jnp.take_along_axis(cum, jnp.maximum(rel - 1, 0)[..., None], axis=-1)[..., 0],
        0,
    )
    blk = sb * SB_BLOCKS + rel
    bits = _decode_blocks(rrr, level, blk)
    return blk * BLOCK + _select_in_block(bits, k - before, invert=invert)


def rrr_select1(rrr: RRRPlanes, level: int, k: jax.Array) -> jax.Array:
    return _rrr_select(rrr, level, k, invert=False)


def rrr_select0(rrr: RRRPlanes, level: int, k: jax.Array) -> jax.Array:
    return _rrr_select(rrr, level, k, invert=True)


def rrr_select_merged(rrr: RRRPlanes, level: int, k: jax.Array,
                      invert: jax.Array) -> jax.Array:
    """select0/select1 fused with a per-query ``invert`` vector: the walk
    consumes exactly one of the two per query (branch bit), so evaluating
    both — as a static-invert caller must under jnp.where — doubles the
    expensive block unranking. One searchsorted per polarity (cheap), then
    ONE class window, ONE offset read, ONE unranking for the batch.

    Everything is recovered from the ones directory: zeros-before-superblock
    is (sb+1)*SB_BITS - ones, zeros-per-block is BLOCK - class."""
    from .wavelet_tree import sb_select_search

    dt = k.dtype
    sbr = rrr.sb_rank[level]
    # dense two-level search, both polarities + before-count in one pass
    # (the two searchsorteds were the select walk's dominant cost on TPU —
    # see wavelet_tree.sb_select_search); count arithmetic rides k.dtype
    sb, before_sb = sb_select_search(sbr, k, invert, SB_BITS,
                                     with_before=True)

    cls = _class_window(rrr, level, sb).astype(dt)              # [Q, S]
    per_blk = jnp.where(invert[..., None], BLOCK - cls, cls)
    cum = jnp.cumsum(per_blk, axis=-1)
    k_rel = k - before_sb
    rel = jnp.clip(jnp.sum((cum <= k_rel[..., None]).astype(dt),
                           axis=-1), 0, SB_BLOCKS - 1)
    before = before_sb + jnp.where(
        rel > 0,
        jnp.take_along_axis(
            cum, jnp.maximum(rel - 1, 0)[..., None].astype(jnp.int32),
            axis=-1)[..., 0],
        0,
    )
    # class + offset start of the target block, straight from the window
    # (no scattered [Q] gathers from the global tables). The offset-plane
    # bit address stays i64: it can exceed the sequence length.
    widths = _OFF_BITS_dev[cls].astype(jnp.int64)
    in_sb = jnp.arange(SB_BLOCKS, dtype=jnp.int64) < rel[..., None]
    start = rrr.sb_off_start[level, sb] + jnp.sum(
        jnp.where(in_sb, widths, 0), axis=-1)
    k_cls = jnp.take_along_axis(
        cls, rel[..., None].astype(jnp.int32), axis=-1)[..., 0]
    width = jnp.take_along_axis(
        widths, rel[..., None].astype(jnp.int32), axis=-1)[..., 0]
    off0 = _read_offset_at(rrr, level, start, width)
    bits = _unrank_bits(off0, k_cls.astype(jnp.int32))
    blk = sb * SB_BLOCKS + rel
    j = k - before
    return blk * BLOCK + _select_in_block_v(bits, j, invert).astype(dt)


def _read_offset_at(rrr: RRRPlanes, level: int, start: jax.Array,
                    width: jax.Array) -> jax.Array:
    """_read_offset with the field width supplied by the caller (avoids the
    scattered class gather)."""
    w = (start >> 5).astype(jnp.int32)
    s = (start & 31).astype(jnp.uint32)
    OW = rrr.off_words.shape[1]
    w0 = rrr.off_words[level, jnp.clip(w, 0, OW - 1)].astype(jnp.uint64)
    w1 = rrr.off_words[level, jnp.clip(w + 1, 0, OW - 1)].astype(jnp.uint64)
    w2 = rrr.off_words[level, jnp.clip(w + 2, 0, OW - 1)].astype(jnp.uint64)
    lo64 = w0 | (w1 << jnp.uint64(32))
    s64 = s.astype(jnp.uint64)
    val = lo64 >> s64
    hi_part = jnp.where(s64 > 0, w2 << (jnp.uint64(64) - s64), jnp.uint64(0))
    val = val | hi_part
    mask = jnp.where(
        width >= 63,
        jnp.uint64(0xFFFFFFFFFFFFFFFF),
        (jnp.uint64(1) << width.astype(jnp.uint64)) - jnp.uint64(1),
    )
    return val & mask


def _select_in_block_v(bits: jax.Array, j: jax.Array,
                       invert: jax.Array) -> jax.Array:
    """_select_in_block with a per-query invert vector."""
    shifts = jnp.arange(BLOCK, dtype=jnp.uint64)
    b = ((bits[..., None] >> shifts) & jnp.uint64(1)).astype(jnp.int32)
    b = jnp.where(invert[..., None], 1 - b, b)
    cum = jnp.cumsum(b, axis=-1)
    return jnp.argmax(cum == (j[..., None] + 1), axis=-1).astype(jnp.int64)
