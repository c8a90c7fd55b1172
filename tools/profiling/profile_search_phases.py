"""Phase-level profile of IndexIVF.search_positional at 1M scale.

Replicates the body of search_positional (search/ivf.py) with wall timers
around each phase: coarse quantization, per-bucket host prep + async
dispatch, device->host result pulls, host emit + final merge. Run on the
real TPU to find where the 5.4s at nprobe>=4 goes (the scan kernels
measure ~17ms on-chip — see scan_microbench.py).

Caches the built index at /tmp/profile_1m_index.npz for fast reruns.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from vector_db_id_compression_tpu.bench.datasets import SyntheticDataset
from vector_db_id_compression_tpu.bench.bench_invlists import build_index
from vector_db_id_compression_tpu.search import ivf as M

CACHE = "/tmp/profile_1m_index.npz"


def get_index():
    ds = SyntheticDataset(d=32, nb=1_000_000, nq=1000, nt=100_000)
    if os.path.exists(CACHE):
        t0 = time.time()
        index = M.load_index(CACHE)
        print(f"loaded cached index in {time.time()-t0:.1f}s", flush=True)
    else:
        t0 = time.time()
        index = build_index(ds, "IVF1024,Flat")
        print(f"built index in {time.time()-t0:.1f}s", flush=True)
        M.save_index(CACHE, index)
    return ds, index


def profiled_search(self, xq, k, nprobe):
    import jax.numpy as jnp
    T = {}
    t0 = time.time()
    xq = np.asarray(xq, dtype=np.float32)
    nq = len(xq)
    xq_dev = jnp.asarray(xq)
    _, probes = M._coarse_topk(xq_dev, jnp.asarray(self.centroids), nprobe)
    probes = np.asarray(probes)
    T["coarse"] = time.time() - t0

    t0 = time.time()
    budget = int(os.environ.get("VDBIDC_SCAN_BUDGET", str(2 ** 28)))
    cand_d = np.full((nq, nprobe, k), np.inf, dtype=np.float32)
    cand_l = np.full((nq, nprobe, k), -1, dtype=np.int64)
    b_of = self._bucket_of[probes]
    pending = []
    n_disp = 0
    host_prep = 0.0
    for si in np.unique(b_of[b_of >= 0]):
        sb = self._scan[si]
        tp = time.time()
        q_arr, p_arr = np.nonzero(b_of == si)
        lns = probes[q_arr, p_arr]
        lanes_np = self._lane_of[lns]
        host_prep += time.time() - tp
        P = len(q_arr)
        B = len(sb.list_ids)
        dense = self._scan_is_float and 4 * P >= nq * B
        if dense:
            slab = max(1, budget // max(nq * sb.n_pad, 1))
            d_all, o_all = M._scan_flat_allpairs(
                xq_dev, sb.payload, sb.lengths_dev, k,
                slab if B > slab else 0)
            qa = jnp.asarray(q_arr)
            la = jnp.asarray(lanes_np)
            pending.append((q_arr, p_arr, lns, d_all[qa, la],
                            o_all[qa, la], len(q_arr)))
            n_disp += 1
            continue
        P_c = M._pad_pow2(min(P, max(1, budget // max(
            sb.n_pad * self.d, 1))))
        for ps in range(0, P, P_c):
            pe = min(ps + P_c, P)
            q_idx = np.zeros(P_c, dtype=np.int32)
            lanes = np.zeros(P_c, dtype=np.int32)
            q_idx[: pe - ps], lanes[: pe - ps] = (q_arr[ps:pe],
                                                  lanes_np[ps:pe])
            pairs = (jnp.asarray(q_idx), jnp.asarray(lanes))
            dists, offs = M._scan_flat_bucket(
                xq_dev, sb.payload, sb.lengths_dev, pairs, k)
            pending.append((q_arr[ps:pe], p_arr[ps:pe], lns[ps:pe],
                            dists, offs, pe - ps))
            n_disp += 1
    T["dispatch"] = time.time() - t0
    T["dispatch_hostprep"] = host_prep
    T["n_dispatch"] = n_disp
    T["n_buckets"] = len(np.unique(b_of[b_of >= 0]))

    t0 = time.time()
    pulled = [(q, p, l, np.asarray(d)[:r], np.asarray(o)[:r], r)
              for q, p, l, d, o, r in pending]
    T["pull"] = time.time() - t0

    t0 = time.time()
    for q_a, p_a, l_a, dists, offs, rows in pulled:
        M._emit_pairs(cand_d, cand_l, q_a, p_a, l_a, dists, offs)
    T["emit"] = time.time() - t0

    t0 = time.time()
    x2 = (xq * xq).sum(axis=1)[:, None, None]
    cand_d = np.where(np.isfinite(cand_d), cand_d + x2, cand_d)
    D, L = M._merge_topk(
        jnp.asarray(cand_d.reshape(nq, -1)),
        jnp.asarray(cand_l.reshape(nq, -1)))
    D = np.asarray(D)[:, :k]
    L = np.asarray(L)[:, :k]
    T["merge"] = time.time() - t0
    return T


def main():
    ds, index = get_index()
    xq = ds.get_queries()
    print(f"buckets: {[(len(sb.list_ids), sb.n_pad) for sb in index._scan]}",
          flush=True)
    for nprobe in (1, 4, 16):
        for rep in range(3):
            T = profiled_search(index, xq, 20, nprobe)
            tot = sum(v for kk, v in T.items()
                      if kk not in ("n_dispatch", "n_buckets",
                                    "dispatch_hostprep"))
            parts = " ".join(f"{kk}={v:.3f}" if isinstance(v, float)
                             else f"{kk}={v}" for kk, v in T.items())
            print(f"nprobe={nprobe} rep={rep} total={tot:.3f}  {parts}",
                  flush=True)


if __name__ == "__main__":
    main()
