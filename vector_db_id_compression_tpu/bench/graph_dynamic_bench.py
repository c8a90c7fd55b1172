"""NSG online (dynamic) benchmark — reference P2 parity
(``alt-graph-index/graph_dynamic_bench_invlists.py:1-148``).

Build an NSG-style graph with a given max degree, then for each adjacency
container {ref, compact, elias-fano, roc} swap it in (the analogue of
``nsg.replace_final_graph``, ``altid.swig:88-92``), time k-NN searches, and
record search time + compressed adjacency size to CSV.

Usage::

    python -m vector_db_id_compression_tpu.bench.graph_dynamic_bench \
        --dataset synthetic --max-degree 32 --runs 10
"""

from __future__ import annotations

import argparse
import csv
import sys
import time
from typing import List

import numpy as np

from ..search.graph_device import search_graph_device
from ..search.nsg import build_nsg, search_graph
from ..store.graph import (CompactBitGraph, EliasFanoGraph, Graph,
                           RocBlockGraph, RocGraph)

METHOD_MAP = {
    "ref": lambda g: g,
    "compact": CompactBitGraph,
    "elias-fano": EliasFanoGraph,
    "roc": RocGraph,
    # framework extension: chained ANS per 16-node block amortizes the
    # 8-byte per-node head that dominates ROC's rate at NSG degrees
    "roc-block": lambda g: RocBlockGraph(g, block=16),
}

METHODS = ["ref", "compact", "elias-fano", "roc", "roc-block"]


def _sustained_device(g, xb, xq, k, medoid, pipeline: int = 8):
    """Marginal time of ``pipeline`` async back-to-back device traversals
    (single dispatch each): the queue hides the per-call round trip, so
    method deltas rise above the dispatch floor that dominates one-shot
    timings on remote-TPU rigs (NOTES.md)."""
    import jax.numpy as jnp

    from ..search import graph_device as gd

    xq32 = np.asarray(xq, np.float32)
    L = 2 * k
    max_iters = 4 * L + 32
    tree, fetch, K = gd.provider_for(g)
    entries = jnp.asarray(np.broadcast_to(np.asarray(medoid, np.int32),
                                          (len(xq32),)))
    xb_dev = jnp.asarray(np.asarray(xb, np.float32))
    xq_dev = jnp.asarray(xq32)
    args = (fetch, tree, xb_dev, xq_dev, K, k, L, max_iters, entries)
    np.asarray(gd._search(*args)[1])  # warm (compiled by the timed runs)
    t0 = time.time()
    np.asarray(gd._search(*args)[1])
    t1 = time.time() - t0
    t0 = time.time()
    outs = [gd._search(*args) for _ in range(pipeline)]
    np.asarray(outs[-1][1])
    tK = time.time() - t0
    return max((tK - t1) / (pipeline - 1), 1e-9)


def run_bench(ds, max_degree: int, runs: int = 100, k: int = 10,
              methods: List[str] = METHODS,
              out_csv: str = "graph_dynamic_bench_out.csv",
              host_search: bool = False):
    """``host_search`` switches back to the per-hop host loop; the default is
    the fully-jitted device traversal (identical results — tests/
    test_graph_device.py — and ~100x faster on a remote TPU)."""
    xb = ds.get_database()
    xq = ds.get_queries()
    gt = ds.get_groundtruth(k)
    print(f"dataset {ds}  NSG{max_degree}", flush=True)
    t0 = time.time()
    base, medoid = build_nsg(xb, R=max_degree)
    adjacency = base.adjacency
    num_edges = int((adjacency >= 0).sum())
    print(f"  graph built in {time.time()-t0:.1f}s, {num_edges} edges",
          flush=True)

    rows = []
    for m in methods:
        t0 = time.time()
        g = METHOD_MAP[m](base)
        build_time = time.time() - t0
        if m == "ref":
            # raw int32 adjacency (what faiss stores); reference models
            # compact as log2(nb)/8*num_edges (graph_dynamic_bench:33-34)
            ids_size = adjacency.size * 4
            overhead = 0
        else:
            ids_size = g.compressed_ids_size_in_bytes
            overhead = g.overhead_in_bytes

        if host_search:
            search = lambda: search_graph(g, xb, xq, k, entry=medoid)[1]
        else:
            search = lambda: search_graph_device(g, xb, xq, k,
                                                 entry=medoid)[1]
        search()  # warmup/compile
        times = []
        I = None
        for _ in range(runs):
            t0 = time.time()
            I = search()
            times.append(time.time() - t0)
        sustained = (np.nan if host_search
                     else _sustained_device(g, xb, xq, k, medoid))
        recall = float((I[:, :1] == gt[:, :1]).sum()) / len(xq)
        row = dict(
            method=m, max_degree=max_degree, k=k, nq=len(xq),
            dt_search=float(np.median(times)),
            dt_search_sustained=float(sustained),
            ids_size=int(ids_size), overhead_size=int(overhead),
            bits_per_edge=8.0 * ids_size / max(num_edges, 1),
            recall_1=recall, build_time=build_time,
            dataset=str(ds), runs=runs,
        )
        rows.append(row)
        print(f"  {m:12s} dt={row['dt_search']*1e3:8.2f}ms "
              f"sustained={sustained*1e3:8.2f}ms "
              f"bits/edge={row['bits_per_edge']:6.2f} R@1={recall:.3f}",
              flush=True)
        with open(out_csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
    return rows


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0].isdigit():  # reference positional form
        from .datasets import get_dataset
        ds = get_dataset(int(argv[0]), argv[2] if len(argv) > 2 else None)
        return run_bench(ds, int(argv[1]))

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default="synthetic",
                   choices=["synthetic", "sift1m", "deep1m", "fb_ssnpp"])
    p.add_argument("--max-degree", type=int, default=32)
    p.add_argument("--runs", type=int, default=100)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--methods", nargs="+", default=METHODS)
    p.add_argument("--fb_ssnpp_dir", default=None)
    p.add_argument("--synth_scale", type=float, default=1.0)
    p.add_argument("--host-search", action="store_true",
                   help="use the per-hop host loop instead of the jitted "
                        "device traversal")
    p.add_argument("--out", default="graph_dynamic_bench_out.csv")
    a = p.parse_args(argv)

    from .datasets import get_dataset
    ds = get_dataset(a.dataset, a.fb_ssnpp_dir, synth_scale=a.synth_scale)
    run_bench(ds, a.max_degree, runs=a.runs, k=a.k, methods=a.methods,
              out_csv=a.out, host_search=a.host_search)


if __name__ == "__main__":
    main()
