import time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from vector_db_id_compression_tpu.bench.datasets import get_dataset
from vector_db_id_compression_tpu.search.nsg import build_nsg, search_graph
from vector_db_id_compression_tpu.search.graph_device import search_graph_device
from vector_db_id_compression_tpu.store.graph import RocGraph, EliasFanoGraph, CompactBitGraph

ds = get_dataset('synthetic', synth_scale=0.05)
xb, xq = ds.get_database(), ds.get_queries()[:50]
graph, medoid = build_nsg(xb, R=16)
for name, g in (("ref", graph), ("compact", CompactBitGraph(graph)),
                ("elias-fano", EliasFanoGraph(graph)), ("roc", RocGraph(graph))):
    D_d, I_d = search_graph_device(g, xb, xq, 10, entry=medoid)  # compile
    ts = []
    for _ in range(3):
        t0 = time.time()
        D_d, I_d = search_graph_device(g, xb, xq, 10, entry=medoid)
        ts.append(time.time() - t0)
    t0 = time.time()
    D_h, I_h, _ = search_graph(g, xb, xq, 10, entry=medoid)
    th = time.time() - t0
    match = np.array_equal(I_h, I_d)
    print(f"{name:11s} device {min(ts)*1e3:7.1f}ms  host {th*1e3:8.1f}ms  "
          f"({th/min(ts):5.1f}x)  match={match}", flush=True)
