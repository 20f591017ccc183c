#!/bin/bash
# Factorized bls2017_rd sweep, run CONCURRENTLY with the mshyper queue.
# The tunnel is latency-bound (train process ~20% CPU, erratic step rate),
# so interleaving two jobs raises aggregate chip throughput; the main
# queue's factorized section later no-ops via orbax resume + skip_existing.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/factorized_queue.log
mark() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

for hid in 0 1 2 3 4 5 6; do
  mark "factorized hid=$hid: train"
  SLURM_JOB_ID=201b91d1 timeout -k 60 7200 python -m shallow_ntc_tpu.factorized.train \
    --config shallow_ntc_tpu/factorized/configs/bls2017_rd.py \
    --experiments_dir ./train_xms_rd --matmul_precision default --hid $hid \
    >> "$LOG" 2>&1 || { mark "FAILED factorized hid=$hid (rc=$?)"; continue; }
  for wd in train_xms_rd/201b91d1/factorized-lmbda=*; do
    timeout -k 60 1800 python eval.py --workdir "$wd" --dataset deadleaves_eval \
      --results_dir json_results/deadleaves24/end_to_end --skip_existing \
      --matmul_precision highest \
      >> "$LOG" 2>&1 || mark "FAILED eval $wd (rc=$?)"
  done
  git add -A train_xms_rd json_results 2>/dev/null
  git diff --cached --quiet || \
    git commit -qm "R-D evidence: factorized hid=$hid trained + 24-image eval" \
    || mark "commit race (benign), hid=$hid"
done
mark "FACTORIZED QUEUE DONE"
