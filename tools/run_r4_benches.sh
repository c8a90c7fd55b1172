#!/usr/bin/env bash
# Round-4 TPU bench batch — run AFTER tools/run_table4.sh finishes (one
# chip; don't contend). Each step appends/refreshes a committed results
# artifact. Usage: tools/run_r4_benches.sh [step...]  (default: all)
set -u
cd "$(dirname "$0")/.." || exit 1
mkdir -p results
STEPS=${*:-"ivf1m interleaved graph1m codec_scale wt_profile"}

run() { echo "=== $* ==="; "$@" || echo "STEP_FAILED: $*"; }

for STEP in $STEPS; do
case $STEP in
ivf1m)
  # 1M Flat sweep, fused, all six reference methods — refresh after the
  # prepared container translate + EF/WT select changes
  run python -m vector_db_id_compression_tpu.bench.bench_invlists \
    --dataset synthetic --synth_scale 10 --index IVF1024,Flat --runs 5 \
    --nprobe 1 4 16 --fused --out results/bench_invlists_synthetic1m_tpu.csv
  ;;
interleaved)
  # long-list shape (1M ids over 128 lists, ~7.8k ids/list): the
  # interleaved container's chunked chains vs the sequential roc format
  run python -m vector_db_id_compression_tpu.bench.bench_invlists \
    --dataset synthetic --synth_scale 10 --index IVF128,Flat --runs 5 \
    --nprobe 1 4 --methods ref roc roc-interleaved \
    --out results/bench_invlists_synthetic1m_longlist_tpu.csv
  ;;
graph1m)
  # 1M-node NSG32 dynamic bench — EF provider after the scatter-free
  # count-select decode
  run python -m vector_db_id_compression_tpu.bench.graph_dynamic_bench \
    --dataset synthetic --synth_scale 10 --max-degree 32 --runs 5 --k 10 \
    --out results/graph_dynamic_bench_synthetic1m_tpu.csv
  ;;
codec_scale)
  : > results/codec_scale_tpu.jsonl
  for NT in 10000000 30000000 100000000; do
    run python -m vector_db_id_compression_tpu.bench.codec_scale \
      --ntotal $NT --nlist 65536 >> results/codec_scale_tpu.jsonl
  done
  ;;
wt_profile)
  run python tools/profiling/profile_wt_select.py 20000
  ;;
esac
done
echo BATCH_DONE
