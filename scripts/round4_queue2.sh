#!/bin/bash
# Round-4 continuation queue (takes over from round4_queue.sh jpegl after
# its driver was replaced mid-unit). Differences from v1:
#   * commit_metrics only git-adds paths that exist -- v1 passed
#     train_xms_long/train_xms_prec unconditionally, and a single bad
#     pathspec makes `git add` add NOTHING (all-or-nothing), so v1's
#     per-unit commits silently no-op'd.
#   * remaining jpegl trains override eval/ckpt cadence to 10k (the
#     mid-train val passes + grids cost ~3 min/run over the tunnel and the
#     30k-step R-D point only needs the final checkpoint).
#   * lambda=0.04 (hid=5) is dropped for round-4 time; the SGA-on-jpegl
#     stretch (VERDICT item 8) fits in its slot instead.
set -u
cd "$(dirname "$0")/.."
REPO="$PWD"
LOG=/tmp/round4_queue.log
mark() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

commit_metrics() {  # $1 = message
  for d in train_xms_rd train_xms_long train_xms_prec json_results \
           itinf_xms_rd24 results; do
    [ -e "$d" ] && git add -A "$d"
  done
  git diff --cached --quiet || git commit -qm "$1" || mark "commit failed: $1"
}

JPEGL_LAMBDAS=(0.00125 0.0025 0.005 0.01 0.02 0.04 0.08)

eval_wd() {  # $1 = workdir
  timeout -k 60 1800 python eval.py --workdir "$1" --dataset deadleaves_eval \
    --results_dir json_results/deadleaves24/end_to_end --skip_existing \
    --matmul_precision highest >> "$LOG" 2>&1 || mark "FAILED eval $1 (rc=$?)"
}

case "${1:-rest}" in
  rest)
    # 1. lambda=0.0025 finished training under the old driver: eval + commit.
    lam=0.0025
    wd="train_xms_rd/jpegl01/mshyper-synthesis=jpegl-lmbda=$lam-num_steps=30000"
    if [ -d "$wd/train/checkpoints" ]; then
      mark "jpegl lmbda=$lam: eval (deadleaves24)"
      eval_wd "$wd"
      commit_metrics "R-D evidence: JPEG-like synthesis lmbda=$lam trained + 24-image eval"
    else
      mark "skip eval lmbda=$lam (no ckpt yet)"
    fi

    # 2. Remaining trains: hid 2 (0.005) and 4 (0.02). Each unit needs
    # ~37 min; don't start one that cannot finish before the round ends
    # (the driver benches on this chip at round end).
    TRAIN_CUTOFF=1787136300   # ~10:45 UTC
    SGA_CUTOFF=1787137500     # ~11:05 UTC
    for hid in 2 4; do
      [ "$(date +%s)" -gt "$TRAIN_CUTOFF" ] && { mark "skip train hid=$hid (cutoff)"; continue; }
      lam=${JPEGL_LAMBDAS[$hid]}
      wd="train_xms_rd/jpegl01/mshyper-synthesis=jpegl-lmbda=$lam-num_steps=30000"
      mark "jpegl hid=$hid lmbda=$lam: train"
      SLURM_JOB_ID=jpegl01 timeout -k 60 4200 python -m shallow_ntc_tpu.mshyper.train \
        --config shallow_ntc_tpu/mshyper/configs/jpegl_rd.py \
        --config.train_eval_config.eval_every_steps=10000 \
        --config.train_eval_config.checkpoint_every_steps=10000 \
        --experiments_dir ./train_xms_rd --matmul_precision default --hid $hid \
        >> "$LOG" 2>&1 || { mark "FAILED train lmbda=$lam (rc=$?)"; continue; }
      mark "jpegl lmbda=$lam: eval (deadleaves24)"
      eval_wd "$wd"
      commit_metrics "R-D evidence: JPEG-like synthesis lmbda=$lam trained + 24-image eval"
    done

    # 3. Stretch (VERDICT item 8): SGA on jpegl checkpoints -- shows itinf
    # generalizes across decoders. Spanning lambdas from what is trained.
    for lam in 0.0025 0.02; do
      [ "$(date +%s)" -gt "$SGA_CUTOFF" ] && { mark "skip SGA lmbda=$lam (cutoff)"; continue; }
      wd="train_xms_rd/jpegl01/mshyper-synthesis=jpegl-lmbda=$lam-num_steps=30000"
      [ -d "$wd/train/checkpoints" ] || { mark "skip SGA lmbda=$lam (no ckpt)"; continue; }
      xid="sga24_jpegl_$lam"
      mark "jpegl lmbda=$lam: SGA itinf (3000 steps, batch 8)"
      SLURM_JOB_ID=$xid timeout -k 60 1800 python -m shallow_ntc_tpu.mshyper.itinf \
        --config shallow_ntc_tpu/mshyper/configs/itinf.py \
        --config.train_eval_config.warm_start_exp_dir="$REPO/$wd" \
        --config.data_config.dataset=deadleaves_eval \
        --config.data_config.batchsize=8 \
        --experiments_dir ./itinf_xms_rd24 --matmul_precision default \
        >> "$LOG" 2>&1 || mark "FAILED itinf jpegl lmbda=$lam (rc=$?)"
      commit_metrics "SGA itinf on JPEG-like decoder lmbda=$lam (beyond-reference evidence)"
    done

    # 4. Aggregate everything that landed.
    mark "jpegl: aggregate"
    python scripts/itinf_to_results.py --itinf_glob 'itinf_xms_rd24/*/*' \
      --out json_results/deadleaves24/sga >> "$LOG" 2>&1 || mark "FAILED itinf_to_results"
    python scripts/aggregate_results.py \
      --results_glob 'json_results/deadleaves24/*/*.json' \
      --out results/rd_deadleaves >> "$LOG" 2>&1 || mark "FAILED aggregate"
    commit_metrics "R-D table: JPEG-like column at 6/7 lambdas + SGA-on-jpegl"
    mark "QUEUE2 DONE"
    ;;
  *)
    echo "unknown queue item: ${1:-}" >&2; exit 2
    ;;
esac
