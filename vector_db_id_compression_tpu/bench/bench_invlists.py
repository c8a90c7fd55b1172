"""IVF online benchmark — reference P1 parity
(``custom_invlist_cpp/bench_invlists.py:1-147``).

For a dataset and an ``IVF{nlist},{Flat|PQ{M}}`` factory string: build the
index, compress the ID lists with every codec, then time ``k=20`` searches at
``nprobe ∈ {1, 4, 16}`` for each method and record search time, compressed ID
size, and codec overhead to CSV (one row per (method, nprobe), exactly the
reference's schema: ``bench_invlists.py:120-137``).

Usage::

    python -m vector_db_id_compression_tpu.bench.bench_invlists \
        --dataset synthetic --index IVF256,Flat --runs 10 --out res.csv

Unlike the reference (whose documented invocation is broken — SURVEY.md §2.3
"quirks"), this is a proper argparse CLI, and it also accepts the reference's
positional form ``<dataset_idx> <index_str> [fb_ssnpp_dir]``.
"""

from __future__ import annotations

import argparse
import csv
import re
import sys
import time
from typing import Dict, List

import numpy as np

from ..search.ivf import IndexIVF
from ..store.invlists import AVAILABLE_COMPRESSED_IVFS

METHODS = ["ref", "packed-bits", "elias-fano", "roc", "wavelet-tree",
           "wavelet-tree-1"]


def parse_index_str(s: str):
    m = re.fullmatch(r"IVF(\d+),(Flat|PQ(\d+))", s)
    if not m:
        raise ValueError(f"unsupported index string {s!r} "
                         "(expected IVF<nlist>,Flat or IVF<nlist>,PQ<M>)")
    nlist = int(m.group(1))
    if m.group(2) == "Flat":
        return nlist, "flat", 0
    return nlist, "pq", int(m.group(3))


def build_index(ds, index_str: str, niter: int = 20) -> IndexIVF:
    nlist, storage, pq_m = parse_index_str(index_str)
    index = IndexIVF(ds.d, nlist, storage=storage, pq_m=pq_m)
    xt = ds.get_train()
    index.train(xt, niter=niter)
    index.add(ds.get_database())
    return index


def _fused_times(sh, xq, k: int, nprobe: int, pipeline: int = 8):
    """(one_shot_s, sustained_s) of the fused single-dispatch search
    (parallel.search.ShardedIVF on a 1-device mesh): one-shot includes the
    dispatch round trip; sustained is the marginal time of ``pipeline``
    async back-to-back dispatches (the queue hides the per-call round trip
    — same methodology as bench.py's codec headline)."""
    import time as _t

    import jax.numpy as jnp

    sh.search(xq, k, nprobe)  # compile + warm (may chunk queries)
    one = float("inf")
    for _ in range(3):
        t0 = _t.time()
        sh.search(xq, k, nprobe)
        one = min(one, _t.time() - t0)
    # sustained: pipeline the (single-chunk) program; when the search is
    # query-chunked, pipeline one chunk and scale by the chunk count
    nq_c, k_, np_ = next(kk for kk in sh._compiled
                         if kk[1] == k and kk[2] == nprobe)
    jitted = sh._compiled[(nq_c, k_, np_)]
    xq_dev = jnp.asarray(np.asarray(xq[:nq_c], np.float32))
    if len(xq_dev) < nq_c:
        xq_dev = jnp.pad(xq_dev, ((0, nq_c - len(xq_dev)), (0, 0)))
    t0 = _t.time()
    _, I1 = jitted(xq_dev)
    np.asarray(I1)
    t1 = _t.time() - t0
    t0 = _t.time()
    outs = [jitted(xq_dev) for _ in range(pipeline)]
    np.asarray(outs[-1][1])
    tK = _t.time() - t0
    n_chunks = -(-len(xq) // nq_c)
    sustained = max((tK - t1) / (pipeline - 1), 1e-9) * n_chunks
    return one, sustained


def run_bench(ds, index_str: str, runs: int = 100, k: int = 20,
              nprobes=(1, 4, 16), methods: List[str] = METHODS,
              out_csv: str = "bench_invlists_out.csv",
              fused: bool = False) -> List[Dict]:
    print(f"dataset {ds}  index {index_str}", flush=True)
    index = build_index(ds, index_str)
    xq = ds.get_queries()
    gt = ds.get_groundtruth(k)
    source = index.invlists

    # pre-build every compressed container (reference bench_invlists.py:90-93)
    containers = {"ref": source}
    build_time = {"ref": 0.0}
    for m, fac in AVAILABLE_COMPRESSED_IVFS.items():
        if m not in methods:
            continue
        t0 = time.time()
        containers[m] = fac(source)
        build_time[m] = time.time() - t0
        print(f"  built {m} in {build_time[m]:.2f}s", flush=True)

    fused_sh = {}
    if fused and index.storage in ("flat", "qinco", "pq"):
        import jax
        from jax.sharding import Mesh

        from ..parallel.search import ShardedIVF

        mesh = Mesh(np.array(jax.devices()[:1]), axis_names=("lists",))
        for m in methods:
            index.replace_invlists(containers[m])
            fused_sh[m] = ShardedIVF(mesh, index, containers[m])

    rows = []
    for m in methods:
        c = containers[m]
        index.replace_invlists(c)
        # decode_1by1 set per container capability — the reference hardcodes
        # the same policy per method (bench_invlists.py:103)
        decode_1by1 = getattr(c, "supports_random_access", True)
        ids_size = getattr(c, "compressed_ids_size_in_bytes",
                           index.ntotal * 8)
        overhead = getattr(c, "overhead_in_bytes", 0)
        for nprobe in nprobes:
            # warmup (compile) then timed runs
            index.search_defer_id_decoding(xq, k, nprobe=nprobe,
                                           decode_1by1=decode_1by1)
            times = []
            D = I = None
            for _ in range(runs):
                t0 = time.time()
                D, I = index.search_defer_id_decoding(
                    xq, k, nprobe=nprobe, decode_1by1=decode_1by1)
                times.append(time.time() - t0)
            recall = float((I[:, :1] == gt[:, :1]).sum()) / len(xq)
            row = dict(
                method=m, nprobe=nprobe, k=k, nq=len(xq),
                dt_search=float(np.median(times)),
                dt_search_min=float(np.min(times)),
                ids_size=int(ids_size), overhead_size=int(overhead),
                bits_per_id=8.0 * ids_size / max(index.ntotal, 1),
                recall_1=recall, build_time=build_time[m],
                dataset=str(ds), index=index_str, runs=runs,
            )
            if m in fused_sh:
                one, sus = _fused_times(fused_sh[m], xq, k, nprobe)
                row["dt_fused"] = one
                row["dt_fused_sustained"] = sus
            rows.append(row)
            extra = (f" fused={row['dt_fused']*1e3:7.2f}ms "
                     f"sustained={row['dt_fused_sustained']*1e3:7.2f}ms"
                     if m in fused_sh else "")
            print(f"  {m:15s} nprobe={nprobe:3d} "
                  f"dt={row['dt_search']*1e3:8.2f}ms "
                  f"bits/id={row['bits_per_id']:6.2f} R@1={recall:.3f}"
                  f"{extra}", flush=True)
            # rewrite the CSV after every point so partial sweeps survive
            # (reference bench_invlists.py:141-146)
            with open(out_csv, "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
                w.writeheader()
                w.writerows(rows)
    return rows


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    # reference positional form: <dataset_idx> <index_str> [fb_ssnpp_dir]
    if argv and argv[0].isdigit():
        from .datasets import get_dataset
        ds = get_dataset(int(argv[0]), argv[2] if len(argv) > 2 else None)
        return run_bench(ds, argv[1])

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default="synthetic",
                   choices=["synthetic", "sift1m", "deep1m", "fb_ssnpp"])
    p.add_argument("--index", default="IVF256,Flat")
    p.add_argument("--runs", type=int, default=100)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--nprobe", type=int, nargs="+", default=[1, 4, 16])
    p.add_argument("--methods", nargs="+", default=METHODS)
    p.add_argument("--fb_ssnpp_dir", default=None)
    p.add_argument("--synth_scale", type=float, default=1.0)
    p.add_argument("--out", default="bench_invlists_out.csv")
    p.add_argument("--fused", action="store_true",
                   help="also time the fused single-dispatch search "
                        "(parallel.search) with pipelined sustained timing")
    a = p.parse_args(argv)

    from .datasets import get_dataset
    ds = get_dataset(a.dataset, a.fb_ssnpp_dir, synth_scale=a.synth_scale)
    run_bench(ds, a.index, runs=a.runs, k=a.k, nprobes=tuple(a.nprobe),
              methods=a.methods, out_csv=a.out, fused=a.fused)


if __name__ == "__main__":
    main()
