"""Profiling/tracing helpers.

The reference's observability is ad-hoc ``time.time()`` in benches and a
purpose-built visited-ids tracer (SURVEY.md §5; altid_impl.cpp:170-231 — our
functional equivalent lives in search/nsg.py:search_and_trace). This module
adds the TPU-side counterparts:

  - :func:`device_trace`: context manager around ``jax.profiler`` traces
    (view in TensorBoard / xprof);
  - :func:`throughput`: robust wall-clock throughput of a device computation
    with an honest sync (``np.asarray`` on a small probe output — on remote
    backends like axon, ``block_until_ready`` alone may not synchronize).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Tuple

import numpy as np


@contextlib.contextmanager
def device_trace(logdir: str = "/tmp/vdbidc_trace"):
    """Capture a jax.profiler trace for the enclosed block."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def throughput(fn: Callable[[], object], items: int, repeats: int = 3,
               warmup: int = 1) -> Tuple[float, float]:
    """(items_per_second, seconds) for the best of ``repeats`` runs of
    ``fn``; each run is synced by materializing the result to host."""
    for _ in range(warmup):
        np.asarray(fn())
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        np.asarray(fn())
        best = min(best, time.time() - t0)
    return items / best, best
