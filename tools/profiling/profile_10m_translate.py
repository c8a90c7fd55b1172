"""Break down the 10M QINCo deferred search: scan vs harvest vs translate.

Usage: python tools/profiling/profile_10m_translate.py [workdir]
Loads the qinco index built by bench.search_ivf_qinco --todo train add,
swaps in the ROC container, and times each phase of
search_defer_id_decoding separately (the bench driver only reports the
total as t_search).
"""

import sys
import time

import numpy as np


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/qinco10m"

    from types import SimpleNamespace

    from vector_db_id_compression_tpu.bench.search_ivf_qinco import load_index
    from vector_db_id_compression_tpu.bench.datasets import get_dataset
    from vector_db_id_compression_tpu.store.invlists import RocInvertedLists

    from pathlib import Path

    args = SimpleNamespace(
        dataset="synthetic", synth_scale=100.0, fb_ssnpp_dir=None,
        workdir=workdir, nlist=4096, M=8, ksub=256, hidden=256,
        kmeans_niter=20, qinco_steps=300, seed=0,
    )
    ds = get_dataset(args.dataset, None, synth_scale=args.synth_scale)
    index = load_index(args, Path(workdir))
    print(f"index loaded: ntotal={index.ntotal} nlist={index.nlist}")

    t0 = time.time()
    cont = RocInvertedLists(index.invlists)
    print(f"roc compress: {time.time()-t0:.1f}s "
          f"({cont.compressed_ids_size_in_bytes * 8 / index.ntotal:.2f} bits/id)")
    index.replace_invlists(cont)

    xq = ds.get_queries()
    nprobe, nshort = 64, 100

    # warmup (compiles)
    index.search_defer_id_decoding(xq[:8], nshort, nprobe=nprobe,
                                   decode_1by1=False, return_codes=2)

    for run in range(2):
        t0 = time.time()
        D, L = index.search_positional(xq, nshort, nprobe)
        t_scan = time.time() - t0

        t0 = time.time()
        codes = index._harvest_codes(L, True)
        t_harv = time.time() - t0

        t0 = time.time()
        I = index._translate(L, decode_1by1=False)
        t_tr = time.time() - t0
        print(f"run {run}: scan={t_scan:.2f}s harvest={t_harv:.2f}s "
              f"translate={t_tr:.2f}s  total={t_scan+t_harv+t_tr:.2f}s")

    # translate micro-detail: how many unique lists, which path
    flat = L.reshape(-1)
    valid = flat >= 0
    lns = (flat[valid] >> 32).astype(np.int64)
    uniq = np.unique(lns)
    print(f"touched lists: {len(uniq)} / {index.nlist}")
    t0 = time.time()
    decoded, lens = cont.decode_lists(uniq)
    print(f"decode_lists({len(uniq)}): {time.time()-t0:.2f}s; "
          f"pallas state: "
          f"{ {bi: (d is not None) for bi, d in cont._pallas.items()} }")
    t0 = time.time()
    decoded, lens = cont.decode_lists(uniq)
    print(f"decode_lists again: {time.time()-t0:.2f}s")


if __name__ == "__main__":
    main()
