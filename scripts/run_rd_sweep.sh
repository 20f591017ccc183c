#!/bin/bash
# Round-3 R-D evidence driver (VERDICT r2 items 5 + 6):
#   * complete the 7-lambda mshyper two_layer_syn sweep (3 runs exist; reuse
#     xid 201b91d1 so finished runs resume at 30k steps and no-op),
#   * run the full 7-lambda factorized bls2017_rd sweep (never run before),
#   * matmul-precision study: same-seed mshyper lmbda=0.01 at `highest`
#     (the existing run is the `default` arm; seeds are fixed at 0),
#   * eval everything on the enlarged 24-image dead-leaves eval set,
#   * SGA itinf (3000 steps, batchsize 8) for all 7 mshyper checkpoints,
#   * aggregate into results/rd_deadleaves (reference aggregate.json format).
# Designed to be idempotent: orbax resume makes finished train runs no-ops,
# eval.py --skip_existing skips finished evals, itinf re-runs are keyed by a
# per-lambda xid and skipped if metrics.json exists.
set -u
cd "$(dirname "$0")/.."
REPO="$PWD"
LOG=/tmp/rd_sweep.log
mark() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

mark "=== mshyper 7-lambda sweep (xid 201b91d1) ==="
for hid in 0 1 2 3 4 5 6; do
  mark "mshyper hid=$hid"
  SLURM_JOB_ID=201b91d1 timeout -k 60 5400 python -m shallow_ntc_tpu.mshyper.train \
    --config shallow_ntc_tpu/mshyper/configs/two_layer_syn_rd.py \
    --experiments_dir ./train_xms_rd --matmul_precision default --hid $hid \
    >> "$LOG" 2>&1 || mark "FAILED mshyper hid=$hid (rc=$?)"
done

mark "=== factorized 7-lambda sweep (xid 201b91d1) ==="
for hid in 0 1 2 3 4 5 6; do
  mark "factorized hid=$hid"
  SLURM_JOB_ID=201b91d1 timeout -k 60 3600 python -m shallow_ntc_tpu.factorized.train \
    --config shallow_ntc_tpu/factorized/configs/bls2017_rd.py \
    --experiments_dir ./train_xms_rd --matmul_precision default --hid $hid \
    >> "$LOG" 2>&1 || mark "FAILED factorized hid=$hid (rc=$?)"
done

mark "=== precision study: lmbda=0.01 at matmul_precision=highest ==="
SLURM_JOB_ID=prec01 timeout -k 60 7200 python -m shallow_ntc_tpu.mshyper.train \
  --config shallow_ntc_tpu/mshyper/configs/two_layer_syn_rd.py \
  --experiments_dir ./train_xms_prec --matmul_precision highest --hid 3 \
  >> "$LOG" 2>&1 || mark "FAILED precision run (rc=$?)"

mark "=== eval on deadleaves_eval (24 images) ==="
for wd in train_xms_rd/201b91d1/mshyper-* train_xms_rd/201b91d1/factorized-* \
          train_xms_prec/prec01/mshyper-*; do
  [ -d "$wd" ] || continue
  case "$wd" in
    train_xms_prec/*) out=json_results/precision_study ;;
    *) out=json_results/deadleaves24/end_to_end ;;
  esac
  mark "eval $wd -> $out"
  timeout -k 60 1800 python eval.py --workdir "$wd" --dataset deadleaves_eval \
    --results_dir "$out" --matmul_precision highest \
    >> "$LOG" 2>&1 || mark "FAILED eval $wd (rc=$?)"
done

mark "=== SGA itinf (3000 steps, batchsize 8, 24 images) ==="
for wd in train_xms_rd/201b91d1/mshyper-*; do
  [ -d "$wd" ] || continue
  lam=$(basename "$wd" | sed 's/.*lmbda=\([0-9.]*\)-.*/\1/')
  xid="sga24_$lam"
  if ls itinf_xms_rd24/$xid/*/metrics.json >/dev/null 2>&1; then
    mark "skip itinf lmbda=$lam (metrics.json exists)"; continue
  fi
  mark "itinf lmbda=$lam"
  SLURM_JOB_ID=$xid timeout -k 60 3600 python -m shallow_ntc_tpu.mshyper.itinf \
    --config shallow_ntc_tpu/mshyper/configs/itinf.py \
    --config.train_eval_config.warm_start_exp_dir="$REPO/$wd" \
    --config.data_config.dataset=deadleaves_eval \
    --config.data_config.batchsize=8 \
    --experiments_dir ./itinf_xms_rd24 --matmul_precision default \
    >> "$LOG" 2>&1 || mark "FAILED itinf lmbda=$lam (rc=$?)"
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
python scripts/collect_train_curves.py \
  --workdirs_glob 'train_xms_prec/*/mshyper-*' \
  --out results/precision_study/train_curve_highest.json >> "$LOG" 2>&1 \
  || mark "collect_train_curves(prec) rc=$?"

mark "SWEEP DONE"
