#!/usr/bin/env python
"""Aggregate per-image eval JSONs into R-D curves (reference: results/*/aggregate.json).

Reads the flat per-image JSON lists produced by eval.py / eval_lib.eval_workdir
(each record: {bpp, psnr, msssim, ..., instance_id, <runname hparams>}),
groups by method + rd_lambda, averages over images, and writes
  <out>/aggregate.json       {method: {lmbda: {bpp, psnr, ...}}}
  <out>/<method>-detailed.json  flat per-image lists per method

Usage:
  python scripts/aggregate_results.py --results_glob 'json_results/kodak/end_to_end/*.json' \
      --out results/kodak
"""

import argparse
import collections
import glob
import json
import os
import re

METRICS = ("bpp", "psnr", "mse", "msssim", "msssim_db", "lpips", "rd_loss")


def method_of(record, fname):
  """Method label: runname minus the rd_lambda segment."""
  base = os.path.basename(fname)
  base = re.sub(r"-step=\d+.*", "", base)
  base = re.sub(r"-?(rd_lambda|lmbda)=[\d.e+-]+", "", base)
  return base.strip("-") or "default"


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument("--results_glob", required=True)
  parser.add_argument("--out", required=True)
  args = parser.parse_args()

  files = sorted(glob.glob(args.results_glob))
  if not files:
    raise SystemExit(f"No result files match {args.results_glob!r}")

  detailed = collections.defaultdict(list)
  for f in files:
    with open(f) as fh:
      records = json.load(fh)
    method = method_of(records[0] if records else {}, f)
    for r in records:
      lam = r.get("rd_lambda") or r.get("lmbda")
      detailed[method].append({"rd_lambda": lam, **r})

  aggregate = {}
  for method, records in detailed.items():
    by_lambda = collections.defaultdict(list)
    for r in records:
      by_lambda[str(r.get("rd_lambda"))].append(r)
    agg = {}
    for lam, rs in sorted(by_lambda.items(), key=lambda kv: float(kv[0] or 0)):
      # Each record is a mean over `num_images` images (1 for per-image eval
      # records; the itinf batch size for SGA batch records) — weight by it.
      entry = {"num_images": sum(int(r.get("num_images", 1)) for r in rs)}
      for m in METRICS:
        pairs = [(float(r[m]), int(r.get("num_images", 1)))
                 for r in rs if m in r and r[m] is not None]
        if pairs:
          wsum = sum(w for _, w in pairs)
          entry[m] = sum(v * w for v, w in pairs) / wsum
      agg[lam] = entry
    aggregate[method] = agg

  os.makedirs(args.out, exist_ok=True)
  with open(os.path.join(args.out, "aggregate.json"), "w") as f:
    json.dump(aggregate, f, indent=2)
  for method, records in detailed.items():
    safe = re.sub(r"[^\w=.-]", "_", method)
    with open(os.path.join(args.out, f"{safe}-detailed.json"), "w") as f:
      json.dump(records, f, indent=2)
  print(f"Wrote aggregate for {len(detailed)} methods to {args.out}")


if __name__ == "__main__":
  main()
