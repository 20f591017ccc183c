#!/bin/bash
# Round-3 manual tail (run after killing round3_resume_queue.sh once the
# aggregate commit lands). Reprioritized vs the queue's own tail: the
# full-30k `highest` precision arm (~1.5h) is replaced by a same-seed
# 10k-step pair, freeing chip time for the bench refresh (now carrying the
# int8 decode/encode A/Bs), the itinf dtype A/B, and the step attribution.
set -u
cd "$(dirname "$0")/.."
REPO="$PWD"
LOG=/tmp/tail.log
mark() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

mark "=== bench_suite refresh (bf16 + int8 decode/encode) ==="
timeout -k 60 3600 python scripts/bench_suite.py >> "$LOG" 2>&1 \
  || mark "FAILED bench_suite (rc=$?)"
git add results/bench_suite.json && git commit -qm "bench_suite refresh: int8 decode/encode A/B on idle chip" || true

mark "=== itinf dtype A/B at lmbda=0.01 (f32 vs bf16 transforms) ==="
WD=train_xms_rd/201b91d1/mshyper-lmbda=0.01-num_steps=30000
for dt in float32 bfloat16; do
  SLURM_JOB_ID=dtype_$dt timeout -k 60 2400 python -m shallow_ntc_tpu.mshyper.itinf \
    --config shallow_ntc_tpu/mshyper/configs/itinf.py \
    --config.train_eval_config.warm_start_exp_dir="$REPO/$WD" \
    --config.train_eval_config.transforms_dtype="$dt" \
    --config.data_config.dataset=deadleaves_eval \
    --config.data_config.batchsize=1 \
    --experiments_dir ./itinf_dtype_ab --matmul_precision default \
    >> "$LOG" 2>&1 || mark "FAILED itinf dtype=$dt (rc=$?)"
done
git add -A itinf_dtype_ab && git commit -qm "itinf transforms-dtype A/B: f32 vs bfloat16 at lmbda=0.01" || true

mark "=== itinf step attribution ==="
timeout -k 60 2400 python scripts/itinf_profile.py >> "$LOG" 2>&1 \
  || mark "FAILED itinf_profile (rc=$?)"

mark "=== precision study: same-seed 10k pairs (default vs highest) ==="
for p in default highest; do
  SLURM_JOB_ID=prec10k_$p timeout -k 60 5400 python -m shallow_ntc_tpu.mshyper.train \
    --config shallow_ntc_tpu/mshyper/configs/two_layer_syn_rd.py \
    --config.train_eval_config.num_steps=10000 \
    --config.model_config.scheduled_num_steps=10000 \
    --experiments_dir "./train_xms_prec" --matmul_precision "$p" --hid 3 \
    >> "$LOG" 2>&1 || mark "FAILED precision arm $p (rc=$?)"
done
for wd in train_xms_prec/prec10k_*/mshyper-*; do
  [ -d "$wd" ] || continue
  timeout -k 60 1800 python eval.py --workdir "$wd" --dataset deadleaves_eval \
    --results_dir json_results/precision_study --skip_existing \
    --matmul_precision highest >> "$LOG" 2>&1 || mark "FAILED eval $wd (rc=$?)"
done
python scripts/collect_train_curves.py \
  --workdirs_glob 'train_xms_prec/*/mshyper-*' \
  --out results/precision_study/train_curves.json >> "$LOG" 2>&1 \
  || mark "collect_train_curves(prec) rc=$?"
git add -A train_xms_prec json_results results && \
  git commit -qm "Precision study: same-seed 10k-step pair (default vs highest) + eval" || true

mark "TAIL DONE"
