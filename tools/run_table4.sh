#!/usr/bin/env bash
# Table-4 parity run at the reference operating shape
# (/root/reference/README.md:161-197): 10M ids, IVF65536, 16x8 QINCo codes,
# nprobe=128, nshort=200, all six --id_compression modes, redo-averaged
# (reference --redo_search 10, README.md:185 — RUNS warm redos here, the
# sweep row records mean+min).
# Usage: [FORCE=1] [RUNS=5] tools/run_table4.sh [workdir]
set -u
cd "$(dirname "$0")/.." || exit 1
WD=${1:-/tmp/qinco10m65k}
RUNS=${RUNS:-5}
mkdir -p "$WD" results
COMMON=(--dataset synthetic --synth_scale 100 --workdir "$WD"
        --nlist 65536 --M 16 --ksub 256 --kmeans_niter 20 --qinco_steps 300
        --seed 0)

if [ ! -f "$WD/qinco_index.npz" ] || [ ! -f "$WD/.added" ]; then
  python -m vector_db_id_compression_tpu.bench.search_ivf_qinco \
    --todo train add "${COMMON[@]}" >"$WD/train_add.log" 2>&1 || exit 1
  touch "$WD/.added"
fi

FAILED=""
for MODE in none packed-bits elias-fano roc wavelet-tree wavelet-tree-1; do
  OUT="results/search_ivf_qinco_synthetic10m_65k_${MODE}_tpu.json"
  [ -f "$OUT" ] && [ "${FORCE:-0}" != 1 ] && continue
  python -m vector_db_id_compression_tpu.bench.search_ivf_qinco \
    --todo search "${COMMON[@]}" --id_compression "$MODE" \
    --defer_id_decoding --nprobe 128 --nshort 200 --k 100 --runs "$RUNS" \
    >"$WD/search_${MODE}.log" 2>&1 \
    || { echo "FAIL $MODE"; FAILED="$FAILED $MODE"; continue; }
  cp "$WD/search_results.json" "$OUT"
  echo "done $MODE"
done
if [ -n "$FAILED" ]; then
  echo "FAILED_MODES:$FAILED"
  exit 1
fi
echo ALL_DONE
