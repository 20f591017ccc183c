#!/bin/bash
# Round-4 TPU work queue. Same resilient per-unit shape as round 3's
# (scripts/round3_resume_queue.sh): each unit is train -> eval -> commit, so
# a VM reset loses at most the in-flight unit.
#
#   scripts/round4_queue.sh jpegl        train the 5 missing JPEG-like lambdas
#                                        (VERDICT r4 item 2), eval, SGA on 3
#                                        of them (stretch item 8), aggregate
#   scripts/round4_queue.sh longrun      500k-step flagship run (item 3)
#   scripts/round4_queue.sh longrun_eval eval the longrun checkpoints
#   scripts/round4_queue.sh precision N  same-seed N-step pair arm at
#                                        matmul_precision=$3 (item 3 sub)
#
# Chip discipline: this script owns the TPU while it runs; interactive work
# must use CPU (jax.config.update("jax_platforms", "cpu")).
set -u
cd "$(dirname "$0")/.."
REPO="$PWD"
LOG=/tmp/round4_queue.log
mark() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

commit_metrics() {  # $1 = message
  # NB: `git add a b c` is all-or-nothing -- one nonexistent pathspec makes
  # it add NOTHING (this silently no-op'd the per-unit commits until
  # round4_queue2.sh). Only add dirs that exist.
  for d in train_xms_rd train_xms_long train_xms_prec json_results \
           itinf_xms_rd24 results; do
    [ -e "$d" ] && git add -A "$d"
  done
  git diff --cached --quiet || git commit -qm "$1" || mark "commit failed: $1"
}

JPEGL_LAMBDAS=(0.00125 0.0025 0.005 0.01 0.02 0.04 0.08)

case "${1:-}" in
  jpegl)
    # hids 0,1,2,4,5 = the lambdas round 3 did not train (3=0.01 and 6=0.08
    # have surviving 24-image evals in json_results/deadleaves24).
    for hid in 0 1 2 4 5; do
      lam=${JPEGL_LAMBDAS[$hid]}
      wd="train_xms_rd/jpegl01/mshyper-synthesis=jpegl-lmbda=$lam-num_steps=30000"
      mark "jpegl hid=$hid lmbda=$lam: train"
      SLURM_JOB_ID=jpegl01 timeout -k 60 5400 python -m shallow_ntc_tpu.mshyper.train \
        --config shallow_ntc_tpu/mshyper/configs/jpegl_rd.py \
        --experiments_dir ./train_xms_rd --matmul_precision default --hid $hid \
        >> "$LOG" 2>&1 || { mark "FAILED train lmbda=$lam (rc=$?)"; continue; }
      mark "jpegl lmbda=$lam: eval (deadleaves24)"
      timeout -k 60 1800 python eval.py --workdir "$wd" --dataset deadleaves_eval \
        --results_dir json_results/deadleaves24/end_to_end --skip_existing \
        --matmul_precision highest \
        >> "$LOG" 2>&1 || mark "FAILED eval lmbda=$lam (rc=$?)"
      commit_metrics "R-D evidence: JPEG-like synthesis lmbda=$lam trained + 24-image eval"
    done

    # Stretch (VERDICT r4 item 8): SGA on three spanning JPEG-like
    # checkpoints -- shows itinf generalizes across decoders (the reference
    # publishes SGA only for the 2-layer decoder).
    for lam in 0.0025 0.02 0.04; do
      wd="train_xms_rd/jpegl01/mshyper-synthesis=jpegl-lmbda=$lam-num_steps=30000"
      [ -d "$wd/train/checkpoints" ] || { mark "skip SGA lmbda=$lam (no ckpt)"; continue; }
      xid="sga24_jpegl_$lam"
      mark "jpegl lmbda=$lam: SGA itinf (3000 steps, batch 8)"
      SLURM_JOB_ID=$xid timeout -k 60 3600 python -m shallow_ntc_tpu.mshyper.itinf \
        --config shallow_ntc_tpu/mshyper/configs/itinf.py \
        --config.train_eval_config.warm_start_exp_dir="$REPO/$wd" \
        --config.data_config.dataset=deadleaves_eval \
        --config.data_config.batchsize=8 \
        --experiments_dir ./itinf_xms_rd24 --matmul_precision default \
        >> "$LOG" 2>&1 || mark "FAILED itinf jpegl lmbda=$lam (rc=$?)"
    done

    mark "jpegl: aggregate"
    python scripts/itinf_to_results.py --itinf_glob 'itinf_xms_rd24/*/*' \
      --out json_results/deadleaves24/sga >> "$LOG" 2>&1 || mark "FAILED itinf_to_results"
    python scripts/aggregate_results.py \
      --results_glob 'json_results/deadleaves24/*/*.json' \
      --out results/rd_deadleaves >> "$LOG" 2>&1 || mark "FAILED aggregate"
    commit_metrics "R-D table: JPEG-like column complete at all 7 lambdas (+SGA on 3)"
    mark "JPEGL UNIT DONE"
    ;;

  longrun)
    # 500k-step flagship at lmbda=0.01 (paper horizon is 1.8M;
    # 500k exercises the lambda warm-up, the 80% LR drop at 400k, and
    # checkpoint/resume at scale). Resumable: rerunning this unit continues
    # from the latest checkpoint (orbax restore-or-init).
    mark "longrun: 500k-step flagship lmbda=0.01"
    SLURM_JOB_ID=long500k timeout -k 60 28800 python -m shallow_ntc_tpu.mshyper.train \
      --config shallow_ntc_tpu/mshyper/configs/two_layer_syn_rd.py \
      --config.train_eval_config.num_steps=500000 \
      --config.model_config.scheduled_num_steps=500000 \
      --config.train_eval_config.checkpoint_every_steps=25000 \
      --config.train_eval_config.eval_every_steps=25000 \
      --config.train_eval_config.log_metrics_every_steps=1000 \
      --experiments_dir ./train_xms_long --matmul_precision default --hid 3 \
      >> "$LOG" 2>&1 || mark "longrun exited rc=$? (resume by rerunning)"
    mark "LONGRUN UNIT DONE"
    ;;

  longrun_eval)
    for wd in train_xms_long/long500k/mshyper-*; do
      [ -d "$wd" ] || continue
      timeout -k 60 1800 python eval.py --workdir "$wd" --dataset deadleaves_eval \
        --results_dir json_results/longrun --skip_existing \
        --matmul_precision highest >> "$LOG" 2>&1 || mark "FAILED eval $wd (rc=$?)"
    done
    python scripts/collect_train_curves.py \
      --workdirs_glob 'train_xms_long/*/mshyper-*' \
      --out results/longrun_train_curve.json >> "$LOG" 2>&1 || true
    commit_metrics "Long-horizon 500k flagship: eval + train curve"
    ;;

  precision)
    # Same-seed pair arm at >=100k steps (VERDICT: the 10k-step caveat).
    steps="${2:?usage: precision <steps> <matmul_precision>}"
    prec="${3:?usage: precision <steps> <matmul_precision>}"
    mark "precision arm: $steps steps at matmul_precision=$prec"
    SLURM_JOB_ID="prec${steps}_${prec}" timeout -k 60 21600 python -m shallow_ntc_tpu.mshyper.train \
      --config shallow_ntc_tpu/mshyper/configs/two_layer_syn_rd.py \
      --config.train_eval_config.num_steps="$steps" \
      --config.model_config.scheduled_num_steps="$steps" \
      --experiments_dir "./train_xms_prec" --matmul_precision "$prec" --hid 3 \
      >> "$LOG" 2>&1 || mark "FAILED precision arm (rc=$?)"
    for wd in "train_xms_prec/prec${steps}_${prec}"/mshyper-*; do
      [ -d "$wd" ] || continue
      timeout -k 60 1800 python eval.py --workdir "$wd" --dataset deadleaves_eval \
        --results_dir json_results/precision_study --skip_existing \
        --matmul_precision highest >> "$LOG" 2>&1 || mark "FAILED eval $wd (rc=$?)"
    done
    commit_metrics "Precision study: ${steps}-step same-seed arm at $prec"
    ;;

  *)
    echo "unknown queue item: ${1:-}" >&2; exit 2
    ;;
esac
