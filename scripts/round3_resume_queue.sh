#!/bin/bash
# Round-3 resilient R-D queue (VM-reset-safe rerun of run_rd_sweep.sh).
#
# A host reset destroyed every untracked artifact of the first round-3 sweep
# (6/7 mshyper checkpoints, the factorized run, data/). This queue redoes the
# work as PER-LAMBDA units — train -> eval(24-img) -> SGA itinf -> git commit
# of all metrics — so a reset can lose at most one in-flight unit. The
# dead-leaves dataset is seeded per image index, so the regenerated corpus is
# bit-identical to the lost one and results stay comparable.
#
# Chip discipline: this script owns the TPU while it runs; interactive work
# must use JAX_PLATFORMS=cpu.
set -u
cd "$(dirname "$0")/.."
REPO="$PWD"
LOG=/tmp/resume_queue.log
mark() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

commit_metrics() {  # $1 = message
  git add -A train_xms_rd train_xms_prec json_results itinf_xms_rd24 \
      results 2>/dev/null
  git diff --cached --quiet || git commit -qm "$1" || mark "commit failed: $1"
}

MSHYPER_LAMBDAS=(0.00125 0.0025 0.005 0.01 0.02 0.04 0.08)

mark "=== mshyper per-lambda units (xid 201b91d1) ==="
for hid in 0 1 2 3 4 5 6; do
  lam=${MSHYPER_LAMBDAS[$hid]}
  wd="train_xms_rd/201b91d1/mshyper-lmbda=$lam-num_steps=30000"
  mark "mshyper hid=$hid lmbda=$lam: train"
  SLURM_JOB_ID=201b91d1 timeout -k 60 5400 python -m shallow_ntc_tpu.mshyper.train \
    --config shallow_ntc_tpu/mshyper/configs/two_layer_syn_rd.py \
    --experiments_dir ./train_xms_rd --matmul_precision default --hid $hid \
    >> "$LOG" 2>&1 || { mark "FAILED train lmbda=$lam (rc=$?)"; continue; }

  mark "mshyper lmbda=$lam: eval (deadleaves24)"
  timeout -k 60 1800 python eval.py --workdir "$wd" --dataset deadleaves_eval \
    --results_dir json_results/deadleaves24/end_to_end --skip_existing \
    --matmul_precision highest \
    >> "$LOG" 2>&1 || mark "FAILED eval lmbda=$lam (rc=$?)"

  xid="sga24_$lam"
  if ls itinf_xms_rd24/$xid/*/batch_id=2/metrics.json >/dev/null 2>&1; then
    mark "skip itinf lmbda=$lam (metrics.json exists)"
  else
    mark "mshyper lmbda=$lam: SGA itinf (3000 steps, batch 8)"
    SLURM_JOB_ID=$xid timeout -k 60 3600 python -m shallow_ntc_tpu.mshyper.itinf \
      --config shallow_ntc_tpu/mshyper/configs/itinf.py \
      --config.train_eval_config.warm_start_exp_dir="$REPO/$wd" \
      --config.data_config.dataset=deadleaves_eval \
      --config.data_config.batchsize=8 \
      --experiments_dir ./itinf_xms_rd24 --matmul_precision default \
      >> "$LOG" 2>&1 || mark "FAILED itinf lmbda=$lam (rc=$?)"
  fi
  commit_metrics "R-D evidence: mshyper lmbda=$lam retrained + 24-image eval + SGA"
done

mark "=== factorized per-lambda units (xid 201b91d1) ==="
for hid in 0 1 2 3 4 5 6; do
  mark "factorized hid=$hid: train"
  SLURM_JOB_ID=201b91d1 timeout -k 60 3600 python -m shallow_ntc_tpu.factorized.train \
    --config shallow_ntc_tpu/factorized/configs/bls2017_rd.py \
    --experiments_dir ./train_xms_rd --matmul_precision default --hid $hid \
    >> "$LOG" 2>&1 || { mark "FAILED factorized hid=$hid (rc=$?)"; continue; }
  for wd in train_xms_rd/201b91d1/factorized-lmbda=*; do
    timeout -k 60 1800 python eval.py --workdir "$wd" --dataset deadleaves_eval \
      --results_dir json_results/deadleaves24/end_to_end --skip_existing \
      --matmul_precision highest \
      >> "$LOG" 2>&1 || mark "FAILED eval $wd (rc=$?)"
  done
  commit_metrics "R-D evidence: factorized hid=$hid trained + 24-image eval"
done

mark "=== aggregate ==="
python scripts/itinf_to_results.py --itinf_glob 'itinf_xms_rd24/*/*' \
  --out json_results/deadleaves24/sga >> "$LOG" 2>&1 || mark "FAILED itinf_to_results"
python scripts/aggregate_results.py \
  --results_glob 'json_results/deadleaves24/*/*.json' \
  --out results/rd_deadleaves >> "$LOG" 2>&1 || mark "FAILED aggregate"
python scripts/collect_train_curves.py \
  --workdirs_glob 'train_xms_rd/*/*-lmbda=*' \
  --out results/rd_deadleaves/train_curves.json >> "$LOG" 2>&1 \
  || mark "collect_train_curves rc=$?"
commit_metrics "R-D table complete: 7 lambdas x 3 methods on 24-image dead-leaves set"

mark "=== precision study: same-seed 30k at matmul_precision=highest ==="
SLURM_JOB_ID=prec01 timeout -k 60 9000 python -m shallow_ntc_tpu.mshyper.train \
  --config shallow_ntc_tpu/mshyper/configs/two_layer_syn_rd.py \
  --experiments_dir ./train_xms_prec --matmul_precision highest --hid 3 \
  >> "$LOG" 2>&1 || mark "FAILED precision run (rc=$?)"
for wd in train_xms_prec/prec01/mshyper-*; do
  [ -d "$wd" ] || continue
  timeout -k 60 1800 python eval.py --workdir "$wd" --dataset deadleaves_eval \
    --results_dir json_results/precision_study --skip_existing \
    --matmul_precision highest >> "$LOG" 2>&1 || mark "FAILED eval $wd (rc=$?)"
done
python scripts/collect_train_curves.py \
  --workdirs_glob 'train_xms_prec/*/mshyper-*' \
  --out results/precision_study/train_curve_highest.json >> "$LOG" 2>&1 \
  || mark "collect_train_curves(prec) rc=$?"
commit_metrics "Precision study: same-seed lmbda=0.01 trained at matmul_precision=highest"

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
git add -Af itinf_dtype_ab 2>/dev/null
git diff --cached --quiet || git commit -qm "itinf transforms-dtype A/B: f32 vs bfloat16 at lmbda=0.01"

mark "=== itinf step attribution ==="
timeout -k 60 2400 python scripts/itinf_profile.py >> "$LOG" 2>&1 \
  || mark "FAILED itinf_profile (rc=$?)"

mark "QUEUE DONE"
