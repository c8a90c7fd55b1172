"""ROC — Random Order Coding of an unordered set of IDs (bits-back rANS).

Encodes a set of n distinct u64 IDs at ~ n*precision - log2(n!) bits by
transmitting the set in a pseudo-random order determined by the ANS state
itself (reference: custom_invlist_cpp/codec.cpp:123-152).

Host path (this module, numpy): exact oracle + build-time encoder.
Device path (``roc_device``): batched lists-as-lanes `lax.scan`.

Encode, per list (reference codec.cpp:123-138):
    for i in 0..n-1:
        idx    = pop_mod(state, n - i)            # sample w/o replacement
        symbol = k-th order statistic of remaining; remove it
        push_symbol(state, symbol, precision)
Decode is the exact inverse (codec.cpp:140-152); decoded order equals the
encode sampling order, so payload codes reordered at encode time line up.

``precision_for_max_id`` reproduces the reference's
``ceil(log2(max_id))`` (custom_invlists_impl.cpp:163-164) including its
power-of-two under-allocation; callers must guarantee distinct ids.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..core.mt19937 import DEFAULT_SEED
from ..core.order_stats import FenwickOrderStats, InsertRank
from ..core.rans import RansState, pop_mod, pop_symbol, push_mod, push_symbol


def precision_for_max_id(max_id: int) -> int:
    """ceil(log2(max_id)) for max_id >= 1, as the reference computes it
    (custom_invlists_impl.cpp:163-164, altid_impl.cpp:125).

    Equals (max_id - 1).bit_length(): note a power-of-two max_id gets a
    precision that cannot represent max_id itself — reproduced verbatim for
    bit-exactness; container layers assert ids fit before encoding.
    """
    if max_id < 1:
        raise ValueError("max_id must be >= 1 (reference behavior is undefined)")
    return (max_id - 1).bit_length()


def precision_for_max_id_safe(max_id: int) -> int:
    """Smallest precision that can represent ``max_id`` itself.

    Identical to ``precision_for_max_id`` except when max_id is an exact
    power of two, where the reference formula under-allocates and the codec
    silently corrupts the maximum id (codec_push drops bits above
    ``precision``: codec.cpp:92-105). Container layers use this safe variant —
    lossless always — at the cost of stream divergence from the reference
    only on inputs the reference itself decodes incorrectly.
    """
    if max_id < 1:
        raise ValueError("max_id must be >= 1")
    return max_id.bit_length()


def roc_encode(
    ids: np.ndarray,
    precision: int,
    state: Optional[RansState] = None,
    seed: int = DEFAULT_SEED,
) -> tuple[RansState, np.ndarray]:
    """Encode distinct ``ids`` into an ANS state.

    Returns (state, order): ``order[i]`` is the index into ``ids`` of the
    element emitted at step i — the permutation that payload codes must be
    reordered by so that decode order matches storage order
    (custom_invlists_impl.cpp:178-193).
    """
    ids = np.asarray(ids, dtype=np.uint64)
    n = len(ids)
    if state is None:
        state = RansState(seed)
    sort_perm = np.argsort(ids, kind="stable")
    tree = FenwickOrderStats(ids[sort_perm], np.ones(n, dtype=np.int64))
    order = np.empty(n, dtype=np.int64)
    for i in range(n):
        nmax = n - i
        idx = pop_mod(state, nmax)
        pos, symbol = tree.select_remove(idx)
        push_symbol(state, symbol, precision)
        order[i] = sort_perm[pos]
    return state, order


def roc_decode(state: RansState, n: int, precision: int) -> np.ndarray:
    """Decode ``n`` ids, mutating ``state`` (clone first to keep it).

    Output order equals the encode sampling order (codec.cpp:150: the i-th
    decoded symbol lands at data[n-1-i], i.e. data[j] is encode step j's
    symbol).
    """
    out = np.empty(n, dtype=np.uint64)
    tree = InsertRank()
    for i in range(n):
        symbol = pop_symbol(state, precision)
        start = tree.insert(symbol)
        push_mod(state, start, i + 1)
        out[n - i - 1] = symbol
    return out
