"""Oracle-check search_defer_id_decoding at 1M against a numpy IVF oracle.

For each query: score centroids, take top-nprobe lists (same tie-break as
_coarse_topk), exact L2 over exactly those lists' members, top-k. Compare
ids and distances with the device search.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from vector_db_id_compression_tpu.bench.datasets import SyntheticDataset
from vector_db_id_compression_tpu.search import ivf as M

CACHE = "/tmp/profile_1m_index.npz"


def main():
    ds = SyntheticDataset(d=32, nb=1_000_000, nq=1000, nt=100_000)
    index = M.load_index(CACHE)
    xb = ds.get_database()
    xq = ds.get_queries()[:100]
    k, nprobe = 20, 16

    D, I = index.search_defer_id_decoding(xq, k, nprobe=nprobe)

    import jax.numpy as jnp
    _, probes_all = M._coarse_topk(jnp.asarray(xq),
                                   jnp.asarray(index.centroids), nprobe)
    probes_all = np.asarray(probes_all)
    il = index.invlists
    bad = 0
    for qi in range(len(xq)):
        x = xq[qi]
        probes = probes_all[qi]
        cand = np.concatenate([il.ids[int(ln)].astype(np.int64)
                               for ln in probes])
        y = xb[cand]
        d2 = ((y - x) ** 2).sum(1)
        order = np.argsort(d2, kind="stable")[:k]
        ids_ref = cand[order]
        d_ref = d2[order]
        if not np.allclose(np.sort(d_ref), np.sort(D[qi]), rtol=1e-4,
                           atol=1e-2):
            bad += 1
            if bad <= 3:
                print(f"q{qi}: D mismatch\n ref {np.sort(d_ref)[:5]}\n got "
                      f"{np.sort(D[qi])[:5]}")
        elif set(ids_ref[:10].tolist()) != set(I[qi, :10].tolist()):
            # distances equal but ids differ → ties; not a failure
            pass
    print(f"checked {len(xq)} queries, {bad} distance mismatches", flush=True)


if __name__ == "__main__":
    main()
