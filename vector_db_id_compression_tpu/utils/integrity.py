"""Artifact integrity: content checksums for the on-disk formats.

The reference has no serialization at all (SURVEY.md §5 "checkpoint/resume");
store/serialize.py adds the format, and this module adds corruption
detection: a stable CRC32 over every array in an ``.npz`` artifact, written
as a sidecar entry and re-verified on load.
"""

from __future__ import annotations

import zlib
from pathlib import Path
from typing import Union

import numpy as np


def _crc_of_arrays(arrays: dict) -> int:
    crc = 0
    for key in sorted(arrays):
        if key == "checksum":
            continue
        arr = np.ascontiguousarray(arrays[key])
        crc ^= zlib.crc32(key.encode() + b"\0" + arr.tobytes())
    return crc


def artifact_checksum(path: Union[str, Path]) -> int:
    """Order-independent CRC32 over all non-meta arrays in an npz artifact."""
    z = np.load(path, allow_pickle=False)
    return _crc_of_arrays({k: z[k] for k in z.files})


def stamp_artifact(path: Union[str, Path]) -> int:
    """Append a checksum entry to an existing artifact (rewrites the file)."""
    path = Path(path)
    # np.savez appends '.npz' to suffix-less paths — that would write a NEW
    # file and leave the original unstamped; require the suffix upfront
    if path.suffix != ".npz":
        raise ValueError(f"artifact path must end in .npz, got {path}")
    z = dict(np.load(path, allow_pickle=False))
    z.pop("checksum", None)
    crc = _crc_of_arrays(z)
    np.savez(path, **z, checksum=np.array([crc], dtype=np.uint32))
    return crc


def verify_artifact(path: Union[str, Path]) -> bool:
    """True iff the artifact carries a checksum and it matches its content."""
    z = np.load(path, allow_pickle=False)
    if "checksum" not in z.files:
        return False
    return int(z["checksum"][0]) == artifact_checksum(path)
