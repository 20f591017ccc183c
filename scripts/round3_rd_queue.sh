#!/bin/bash
# Round-3 TPU work queue (run ONE item at a time; the chip is shared with
# interactive measurements between items).
#
#   scripts/round3_rd_queue.sh train <hid>      factorized bls2017_rd work unit
#   scripts/round3_rd_queue.sh precision <p>    mshyper lmbda=0.01 10k-step run at
#                                               matmul precision <p> (A/B pair)
#   scripts/round3_rd_queue.sh eval             eval every checkpoint on the
#                                               24-image deadleaves eval set
#   scripts/round3_rd_queue.sh sga              SGA itinf over the 7 mshyper ckpts
#   scripts/round3_rd_queue.sh aggregate        rebuild results/rd_deadleaves
set -e
cd "$(dirname "$0")/.."

case "$1" in
  train)
    exec python -m shallow_ntc_tpu.factorized.train \
      --config shallow_ntc_tpu/factorized/configs/bls2017_rd.py \
      --experiments_dir ./train_xms_rd --matmul_precision default --hid "$2"
    ;;
  precision)
    # Same seed (train_lib seed=0), same lambda (config default 0.01), same
    # data stream; only the matmul precision differs (VERDICT r2 item 6).
    exec python -m shallow_ntc_tpu.mshyper.train \
      --config shallow_ntc_tpu/mshyper/configs/two_layer_syn_rd.py \
      --config.train_eval_config.num_steps=10000 \
      --config.model_config.scheduled_num_steps=10000 \
      --experiments_dir "./train_xms_prec/$2" --matmul_precision "$2"
    ;;
  eval)
    shopt -s nullglob
    for wd in train_xms_rd/*/mshyper-lmbda=* train_xms_rd/*/wid=*-mshyper-lmbda=* \
              train_xms_rd/*/factorized-lmbda=* train_xms_rd/*/wid=*-factorized-lmbda=*; do
      python eval.py --workdir "$wd" --dataset deadleaves_eval \
        --results_dir json_results/deadleaves24/end_to_end --skip_existing
    done
    ;;
  sga)
    shopt -s nullglob
    for wd in train_xms_rd/*/mshyper-lmbda=* train_xms_rd/*/wid=*-mshyper-lmbda=*; do
      python -m shallow_ntc_tpu.mshyper.itinf \
        --config shallow_ntc_tpu/mshyper/configs/itinf.py \
        --config.train_eval_config.warm_start_exp_dir="$PWD/$wd" \
        --config.data_config.dataset=deadleaves_eval \
        --config.data_config.batchsize=8 \
        --experiments_dir ./itinf_xms_rd24
    done
    ;;
  aggregate)
    python scripts/itinf_to_results.py --itinf_glob 'itinf_xms_rd24/*/*' \
      --out json_results/deadleaves24/sga
    python scripts/aggregate_results.py \
      --results_glob 'json_results/deadleaves24/*/*.json' \
      --out results/rd_deadleaves
    ;;
  *)
    echo "unknown queue item: $1" >&2; exit 2
    ;;
esac
