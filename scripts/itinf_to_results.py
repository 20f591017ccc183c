#!/usr/bin/env python
"""Convert SGA itinf workdirs into eval.py-style result JSONs.

The reference's published R-D tables carry a "2-layer_syn+SGA" method row
(results/kodak/aggregate.json) produced by iterative-inference encoding on
trained checkpoints (reference itinf_lib.py:99-209). Our itinf driver writes
<workdir>/metrics.json as a flat list of per-batch val metrics; this script
re-emits them in the flat per-image format eval_lib.eval_workdir writes, with
the method/lambda recovered from the warm-start config, so
scripts/aggregate_results.py folds SGA points into the same aggregate.json.

Usage:
  python scripts/itinf_to_results.py --itinf_glob 'itinf_xms_rd/*/*' \
      --out json_results/deadleaves/sga
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def convert_workdir(workdir: str, out_dir: str) -> str:
  with open(os.path.join(workdir, "metrics.json")) as f:
    batches = json.load(f)
  with open(os.path.join(workdir, "config.json")) as f:
    cfg = json.load(f)

  warm = cfg["train_eval_config"]["warm_start_exp_dir"]
  # warm_start_exp_dir may be a workdir OR an experiment dir holding wid=*
  # work units. This converter only needs the training config (for
  # rd_lambda), not checkpoints, so accept any dir that carries config.json
  # directly -- find_workdir_by_wid keys the direct-workdir shortcut on
  # train/checkpoints, which run-artifact dirs restored from git lack.
  if os.path.isfile(os.path.join(warm, "config.json")):
    warm_workdir = warm
  else:
    from shallow_ntc_tpu import eval_lib

    warm_workdir = eval_lib.find_workdir_by_wid(
        warm, cfg["train_eval_config"].get("warm_start_wid", 0))
  with open(os.path.join(warm_workdir, "config.json")) as f:
    train_cfg = json.load(f)
  lmbda = train_cfg["model_config"]["rd_lambda"]
  method = cfg.get("model_family", "mshyper") + "+sga"

  # itinf metrics are per-*batch* means; record the batch size so that
  # aggregate_results.py can weight them correctly when batchsize > 1.
  batchsize = int(cfg.get("data_config", {}).get("batchsize", 1) or 1)
  records = []
  for b in batches:
    rec = {k: v for k, v in b.items() if k != "batch_id"}
    rec["instance_id"] = b["batch_id"]
    rec["lmbda"] = str(lmbda)
    rec["num_images"] = batchsize
    records.append(rec)

  xid = os.path.basename(os.path.dirname(os.path.normpath(workdir)))
  steps = cfg["train_eval_config"].get("num_steps", 0)
  fname = f"{method}-lmbda={lmbda}-step={steps}-xid={xid}.json"
  os.makedirs(out_dir, exist_ok=True)
  out_path = os.path.join(out_dir, fname)
  with open(out_path, "w") as f:
    json.dump(records, f, indent=2)
  return out_path


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--itinf_glob", required=True,
                 help="Glob of itinf workdirs (each holding metrics.json).")
  p.add_argument("--out", required=True)
  args = p.parse_args()

  dirs = [d for d in sorted(glob.glob(args.itinf_glob))
          if os.path.isfile(os.path.join(d, "metrics.json"))]
  if not dirs:
    raise SystemExit(f"No itinf workdirs with metrics.json match {args.itinf_glob!r}")
  failures = 0
  for d in dirs:
    try:
      print("wrote", convert_workdir(d, args.out))
    except (OSError, KeyError, ValueError) as e:
      # One unconvertible workdir (e.g. a stale run whose warm-start dir is
      # gone) must not block converting the rest of the sweep.
      failures += 1
      print(f"SKIP {d}: {type(e).__name__}: {e}", file=sys.stderr)
  if failures == len(dirs):
    raise SystemExit("every itinf workdir failed to convert")


if __name__ == "__main__":
  main()
