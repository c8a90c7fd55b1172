"""Time IndexIVF.search_defer_id_decoding at 1M scale on the real TPU.

Uses the index cached by profile_search_phases.py (/tmp/profile_1m_index.npz).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from vector_db_id_compression_tpu.bench.datasets import SyntheticDataset
from vector_db_id_compression_tpu.search import ivf as M

CACHE = "/tmp/profile_1m_index.npz"


def main():
    ds = SyntheticDataset(d=32, nb=1_000_000, nq=1000, nt=100_000)
    t0 = time.time()
    index = M.load_index(CACHE)
    print(f"loaded index in {time.time()-t0:.1f}s", flush=True)
    xq = ds.get_queries()
    gt = ds.get_groundtruth(20)
    for nprobe in (1, 4, 16):
        index.search_defer_id_decoding(xq, 20, nprobe=nprobe)  # warm
        times = []
        for _ in range(5):
            t0 = time.time()
            D, I = index.search_defer_id_decoding(xq, 20, nprobe=nprobe)
            times.append(time.time() - t0)
        r1 = float((I[:, :1] == gt[:, :1]).sum()) / len(xq)
        print(f"nprobe={nprobe:3d} median={np.median(times):.3f}s "
              f"min={min(times):.3f}s R@1={r1:.3f}", flush=True)


if __name__ == "__main__":
    main()
