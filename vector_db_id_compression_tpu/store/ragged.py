"""Size-bucketed batching of ragged lists.

XLA needs static shapes; inverted lists and adjacency lists are ragged
(empty to ~1e5 elements). We group lists into geometric size buckets and pad
each bucket to its ceiling — the device codecs then process one bucket as one
lanes-in-lockstep batch. This is the TPU-native replacement for the
reference's OpenMP `parallel for` over individual lists
(custom_invlists_impl.cpp:147,234): instead of one thread per list, one lane
per list and one scan per bucket, with padding waste bounded by the bucket
growth factor.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

import numpy as np


@dataclass(frozen=True)
class Bucket:
    """Lists of similar length, padded to ``n_pad``."""

    list_ids: np.ndarray  # i64[B] original list numbers
    lengths: np.ndarray   # i32[B]
    n_pad: int


def bucketize(lengths: Sequence[int], growth: float = 2.0, min_pad: int = 8,
              max_waste: float = 1.35) -> List[Bucket]:
    """Group list indices into size buckets (empty lists dropped).

    The ceiling grows geometrically while the bucket's padded-slot waste
    stays under ``max_waste`` (padded slots / true slots). A pure
    occupancy-growth rule collapses any continuous length distribution into
    ONE bucket padded to the global max — at 10M ids that meant 4087 lists
    padded to n_pad=11168 against a mean length of 2441 (4.6x slot waste in
    every scan/decode pass, and a bucket far outside the Pallas decode VMEM
    envelope). The waste bound keeps n_pad near each bucket's own lengths;
    the number of buckets stays O(log(max_len)/log(growth))."""
    lengths = np.asarray(lengths, dtype=np.int64)
    nonempty = np.flatnonzero(lengths > 0)
    if len(nonempty) == 0:
        return []
    buckets: List[Bucket] = []
    order = nonempty[np.argsort(lengths[nonempty], kind="stable")]
    sorted_lens = lengths[order]
    csum = np.zeros(len(order) + 1, dtype=np.int64)
    np.cumsum(sorted_lens, out=csum[1:])
    # two-pointer greedy: extend the bucket one member at a time (cap = the
    # new member's length) while waste stays bounded. Growing the CAP
    # multiplicatively instead degenerates: from a length near the
    # distribution mode, one doubling overshoots the waste bound
    # immediately, producing one bucket per distinct length (~750 buckets =
    # ~750 decode dispatches at 10M ids); member-at-a-time growth yields a
    # handful of buckets with the same bound.
    lo = 0
    n = len(order)
    while lo < n:
        hi = lo + 1
        cap = max(int(sorted_lens[lo]), min_pad)
        while hi < n:
            cand = max(int(sorted_lens[hi]), min_pad)
            if (hi + 1 - lo) * cand > max_waste * int(csum[hi + 1] - csum[lo]):
                break
            cap = cand
            hi += 1
        ids = order[lo:hi]
        buckets.append(
            Bucket(
                list_ids=ids.copy(),
                lengths=lengths[ids].astype(np.int32),
                n_pad=cap,
            )
        )
        lo = hi
    return buckets


def pad_lists(
    arrays: Sequence[np.ndarray], n_pad: int, dtype=None, fill=0
) -> np.ndarray:
    """[B, n_pad] padded stack of 1-D arrays."""
    B = len(arrays)
    dtype = dtype or arrays[0].dtype
    out = np.full((B, n_pad), fill, dtype=dtype)
    for b, a in enumerate(arrays):
        out[b, : len(a)] = a
    return out
