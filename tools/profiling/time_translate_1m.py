"""Time the deferred-search translate stage per container at 1M scale."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from vector_db_id_compression_tpu.bench.datasets import SyntheticDataset
from vector_db_id_compression_tpu.search import ivf as M
from vector_db_id_compression_tpu.store.invlists import (
    AVAILABLE_COMPRESSED_IVFS)

CACHE = "/tmp/profile_1m_index.npz"


def main():
    ds = SyntheticDataset(d=32, nb=1_000_000, nq=1000, nt=100_000)
    index = M.load_index(CACHE)
    xq = ds.get_queries()
    k, nprobe = 20, 16
    D, L = index.search_positional(xq, k, nprobe)
    for name in ("packed-bits", "elias-fano", "roc", "wavelet-tree"):
        t0 = time.time()
        c = AVAILABLE_COMPRESSED_IVFS[name](index.invlists)
        print(f"{name}: built in {time.time()-t0:.1f}s", flush=True)
        one = getattr(c, "supports_random_access", True)
        index.replace_invlists(c)
        index._translate(L, one)  # warm
        times = []
        for _ in range(5):
            t0 = time.time()
            I = index._translate(L, one)
            times.append(time.time() - t0)
        print(f"{name}: translate median {np.median(times)*1e3:.1f} ms "
              f"(1by1={one})", flush=True)


if __name__ == "__main__":
    main()
