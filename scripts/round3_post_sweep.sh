#!/bin/bash
# Post-sweep chip work (run after run_rd_sweep.sh):
#   1. bench_suite refresh (stale round-2 numbers: itinf 196.8 -> ~229,
#      rANS decode 38.7 -> ~83 Msym/s)
#   2. SGA itinf transforms_dtype A/B at lmbda=0.01: f32 vs bfloat16 rate
#      and converged rd_loss (VERDICT r2 item 3 "same converged rd_loss")
#   3. itinf step component attribution (scripts/itinf_profile.py)
set -u
cd "$(dirname "$0")/.."
REPO="$PWD"
LOG=/tmp/post_sweep.log
mark() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

mark "=== bench_suite refresh ==="
timeout -k 60 3600 python scripts/bench_suite.py >> "$LOG" 2>&1 || mark "FAILED bench_suite (rc=$?)"

WD=train_xms_rd/201b91d1/mshyper-lmbda=0.01-num_steps=30000
for dt in float32 bfloat16; do
  mark "=== itinf dtype A/B: $dt ==="
  SLURM_JOB_ID=dtype_$dt timeout -k 60 2400 python -m shallow_ntc_tpu.mshyper.itinf \
    --config shallow_ntc_tpu/mshyper/configs/itinf.py \
    --config.train_eval_config.warm_start_exp_dir="$REPO/$WD" \
    --config.train_eval_config.transforms_dtype="$dt" \
    --config.data_config.dataset=deadleaves_eval \
    --config.data_config.batchsize=1 \
    --experiments_dir ./itinf_dtype_ab --matmul_precision default \
    >> "$LOG" 2>&1 || mark "FAILED itinf dtype=$dt (rc=$?)"
done

mark "=== itinf step attribution ==="
timeout -k 60 2400 python scripts/itinf_profile.py >> "$LOG" 2>&1 || mark "FAILED itinf_profile (rc=$?)"

mark "POST_SWEEP DONE"
