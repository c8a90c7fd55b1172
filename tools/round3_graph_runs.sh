#!/bin/bash
# Round-3 graph-stack runs (VERDICT items 5 + 6 evidence).
export VDBIDC_COMPILE_CACHE=/root/repo/.jax_cache
cd /root/repo
echo "=== phase G1: refresh 5k NSG16 dynamic bench (Pallas in-traversal decode) ==="
timeout 3600 python -m vector_db_id_compression_tpu.bench.graph_dynamic_bench \
  --dataset synthetic --synth_scale 0.05 --max-degree 16 --runs 10 \
  --out results/graph_dynamic_bench_synthetic_tpu.csv || echo "G1 FAILED"
echo "=== phase G2: refresh 4k HNSW16 bench ==="
timeout 3600 python -m vector_db_id_compression_tpu.bench.hnsw_bench \
  --dataset synthetic --synth_scale 0.04 --M 16 --runs 10 \
  --out results/hnsw_bench_synthetic_tpu.csv || echo "G2 FAILED"
echo "=== phase G3: 1M NSG32 dynamic bench (all five containers) ==="
timeout 14400 python -m vector_db_id_compression_tpu.bench.graph_dynamic_bench \
  --dataset synthetic --synth_scale 10 --max-degree 32 --runs 5 \
  --out results/graph_dynamic_bench_synthetic1m_tpu.csv || echo "G3 FAILED"
echo "GRAPH_RUNS_DONE"
