#!/bin/bash
export VDBIDC_COMPILE_CACHE=/root/repo/.jax_cache
cd /root/repo
echo "=== retry phase 3: 10M QINCo search roc+defer ==="
python -m vector_db_id_compression_tpu.bench.search_ivf_qinco \
  --todo search --dataset synthetic --synth_scale 100 \
  --workdir /tmp/qinco10m --nlist 4096 --M 8 --ksub 256 --hidden 256 \
  --id_compression roc --defer_id_decoding \
  --nprobe 64 --nshort 100 --k 100 --runs 3 \
  && cp /tmp/qinco10m/search_results.json \
        results/search_ivf_qinco_synthetic10m_roc_tpu.json \
  || echo "PHASE3 FAILED"
echo "=== retry phase 1: 1M P1 sweep ==="
python -m vector_db_id_compression_tpu.bench.bench_invlists \
  --dataset synthetic --synth_scale 10 --index IVF1024,Flat --runs 20 \
  --nprobe 1 4 16 --fused --out results/bench_invlists_synthetic1m_tpu.csv \
  || echo "PHASE1 FAILED"
echo "ALL_DONE_RETRY"
