#!/bin/bash
# Round-3 Table-4-shape run (VERDICT item 4): 10M synthetic, IVF65536,
# 16x8 QINCo codes, nprobe=128, nshort=200, all six compression modes.
# Matches /root/reference/README.md:161-197 (modes at
# custom_invlist_cpp/search_ivf_qinco.py:384-388).
export VDBIDC_COMPILE_CACHE=/root/repo/.jax_cache
cd /root/repo
WD=/tmp/qinco10m_t4
echo "=== phase T0: train+add (nlist=65536, M=16, ksub=256) ==="
timeout 14400 python -m vector_db_id_compression_tpu.bench.search_ivf_qinco \
  --todo train add --dataset synthetic --synth_scale 100 \
  --workdir $WD --nlist 65536 --M 16 --ksub 256 --hidden 256 \
  --qinco_steps 300 --nprobe 128 --nshort 200 --k 100 --runs 1 \
  || { echo "T0 FAILED"; exit 1; }
for MODE in none packed-bits elias-fano roc wavelet-tree wavelet-tree-1; do
  echo "=== phase T: search mode=$MODE ==="
  timeout 7200 python -m vector_db_id_compression_tpu.bench.search_ivf_qinco \
    --todo search --dataset synthetic --synth_scale 100 \
    --workdir $WD --nlist 65536 --M 16 --ksub 256 --hidden 256 \
    --id_compression $MODE --defer_id_decoding \
    --nprobe 128 --nshort 200 --k 100 --runs 3 \
    && cp $WD/search_results.json \
          results/search_ivf_qinco_synthetic10m_ivf65k_${MODE}_tpu.json \
    || echo "T($MODE) FAILED"
done
echo "TABLE4_RUNS_DONE"
