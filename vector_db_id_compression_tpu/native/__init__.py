"""Native host codec bindings (ctypes over the C++ runtime in
``roc_native.cpp``).

The reference's runtime layer is C++ behind SWIG (SURVEY.md §2.1/2.2); this
framework's host runtime is C++ behind ctypes, built on demand with g++ into
a cached shared object next to the source. The batch API is list-parallel
(std::thread) and bit-exact with the Python host codec (core/rans.py) and the
device codec — asserted in tests/test_native.py.

Use :func:`available` to gate; every caller falls back to the Python host
path when no toolchain is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "roc_native.cpp"
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_lib() -> Optional[ctypes.CDLL]:
    so = _HERE / "roc_native.so"
    try:
        if not so.exists() or so.stat().st_mtime < _SRC.stat().st_mtime:
            # compile to a unique temp path, then atomically rename —
            # concurrent processes must never dlopen a half-written object
            tmp = so.with_suffix(f".{os.getpid()}.tmp.so")
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                 str(_SRC), "-o", str(tmp), "-pthread"],
                check=True, capture_output=True,
            )
            os.replace(tmp, so)
        lib = ctypes.CDLL(str(so))
    except (OSError, subprocess.CalledProcessError):
        return None

    u64p = np.ctypeslib.ndpointer(np.uint64, flags="C")
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
    lib.roc_encode_lists.restype = ctypes.c_int
    lib.roc_encode_lists.argtypes = [
        u64p, i64p, ctypes.c_int, i32p,
        u64p, u32p, ctypes.c_int32, i32p, i32p, u32p, ctypes.c_int,
    ]
    lib.roc_decode_lists.restype = ctypes.c_int
    lib.roc_decode_lists.argtypes = [
        u64p, u32p, ctypes.c_int32, i32p, i64p, ctypes.c_int, i32p,
        u64p, ctypes.c_int,
    ]
    return lib


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        _LIB = _build_lib()
    return _LIB


def available() -> bool:
    return _lib() is not None


def _default_threads() -> int:
    return max(os.cpu_count() or 1, 1)


def roc_encode_lists(
    id_lists: Sequence[np.ndarray],
    precisions: Sequence[int],
    cap: Optional[int] = None,
    n_threads: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, List[np.ndarray], np.ndarray]:
    """Batch ROC encode. Returns (heads u64[n], stacks u32[n, cap],
    stack_lens i32[n], orders [per-list i32 permutation], mt_draws u32[n])."""
    lib = _lib()
    assert lib is not None, "native codec unavailable"
    n_lists = len(id_lists)
    lengths = np.array([len(l) for l in id_lists], dtype=np.int64)
    offsets = np.zeros(n_lists + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    ids_flat = (np.concatenate([np.asarray(l, np.uint64) for l in id_lists])
                if offsets[-1] else np.zeros(0, np.uint64))
    prec = np.asarray(precisions, dtype=np.int32)
    if cap is None:
        # stack words are bounded by total pushed bits / 32 (+ slack)
        max_n = int(lengths.max()) if n_lists else 0
        max_p = int(prec.max()) if n_lists else 0
        cap = max_n * max_p // 32 + 8
    heads = np.zeros(n_lists, dtype=np.uint64)
    stacks = np.zeros((n_lists, cap), dtype=np.uint32)
    stack_lens = np.zeros(n_lists, dtype=np.int32)
    order_flat = np.zeros(int(offsets[-1]), dtype=np.int32)
    mt_draws = np.zeros(n_lists, dtype=np.uint32)
    rc = lib.roc_encode_lists(
        ids_flat, offsets, n_lists, prec, heads, stacks.reshape(-1),
        cap, stack_lens, order_flat, mt_draws,
        n_threads or _default_threads(),
    )
    assert rc == 0, f"stack capacity {cap} overflowed: max needed " \
                    f"{int(stack_lens.max())}"
    orders = [order_flat[offsets[i]:offsets[i + 1]] for i in range(n_lists)]
    return heads, stacks, stack_lens, orders, mt_draws


def roc_decode_lists(
    heads: np.ndarray,
    stacks: np.ndarray,
    stack_lens: np.ndarray,
    lengths: Sequence[int],
    precisions: Sequence[int],
    n_threads: Optional[int] = None,
) -> List[np.ndarray]:
    """Batch ROC decode; returns per-list ids in decode (= encode sampling)
    order."""
    lib = _lib()
    assert lib is not None, "native codec unavailable"
    n_lists = len(lengths)
    lengths = np.asarray(lengths, dtype=np.int64)
    offsets = np.zeros(n_lists + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    stacks = np.ascontiguousarray(stacks, dtype=np.uint32)
    cap = stacks.shape[1] if stacks.ndim == 2 else 0
    out = np.zeros(int(offsets[-1]), dtype=np.uint64)
    lib.roc_decode_lists(
        np.ascontiguousarray(heads, np.uint64), stacks.reshape(-1),
        cap, np.ascontiguousarray(stack_lens, np.int32), offsets, n_lists,
        np.ascontiguousarray(precisions, np.int32), out,
        n_threads or _default_threads(),
    )
    return [out[offsets[i]:offsets[i + 1]] for i in range(n_lists)]
