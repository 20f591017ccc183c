#!/usr/bin/env python
"""Aggregate per-image eval JSONs into R-D curves (reference: results/*/aggregate.json).

Reads the flat per-image JSON lists produced by eval.py / eval_lib.eval_workdir
(each record: {bpp, psnr, msssim, ..., instance_id, <runname hparams>}),
groups by method + rd_lambda, averages over images, and writes

  <out>/aggregate.json          {method: {"rd_lambda": [l0..], "bpp": [..],
                                 "psnr": [..], ...}} -- the reference's
                                 aggregate.json schema (sorted-by-lambda metric
                                 arrays, /root/reference/results/kodak/
                                 aggregate.json), plus additive keys the
                                 reference lacks: "rd_lambda", "num_images",
                                 and per-image "<metric>_std" spread arrays.
  <out>/<method>-detailed.json  flat per-image lists per method (reference
                                 <method>-detailed.json analogue)

Usage:
  python scripts/aggregate_results.py --results_glob 'json_results/kodak/end_to_end/*.json' \
      --out results/kodak
"""

import argparse
import collections
import glob
import json
import math
import os
import re

METRICS = ("bpp", "psnr", "mse", "msssim", "msssim_db", "lpips", "rd_loss")


def method_of(record, fname):
  """Method label: runname minus the rd_lambda / step-count segments."""
  base = os.path.basename(fname)
  base = re.sub(r"-step=\d+.*", "", base)
  base = re.sub(r"(^|-)(rd_lambda|lmbda)=[\d.]+(?:e[+-]?\d+)?", "", base)
  base = re.sub(r"(^|-)num_steps=\d+", "", base)
  return base.strip("-") or "default"


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument("--results_glob", required=True)
  parser.add_argument("--out", required=True)
  args = parser.parse_args()

  files = sorted(glob.glob(args.results_glob))
  if not files:
    raise SystemExit(f"No result files match {args.results_glob!r}")

  # A workdir evaluated at several checkpoints produces one file per step
  # (eval_lib names them <runname>-step=<n>-...); only the LATEST step of
  # each run belongs in the table -- otherwise stale mid-training evals
  # get silently averaged into the front.
  def step_of(fname):
    m = re.search(r"-step=(\d+)", os.path.basename(fname))
    return int(m.group(1)) if m else 0

  latest = {}
  for f in files:
    # Key on the full path (sans step), not the basename: a glob spanning
    # multiple directories can hold same-named files from different runs or
    # datasets, and those are distinct results, not stale duplicates.
    key = re.sub(r"-step=\d+", "", f)
    if key not in latest or step_of(f) > step_of(latest[key]):
      latest[key] = f
  dropped = sorted(set(files) - set(latest.values()))
  for f in dropped:
    print(f"dropping stale-step eval {os.path.basename(f)}")
  files = sorted(latest.values())

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
      by_lambda[float(r.get("rd_lambda") or 0)].append(r)
    lambdas = sorted(by_lambda)
    agg = {"rd_lambda": lambdas,
           "num_images": [sum(int(r.get("num_images", 1))
                              for r in by_lambda[l]) for l in lambdas]}
    for m in METRICS:
      means, stds = [], []
      for l in lambdas:
        # Each record is a mean over `num_images` images (1 for per-image
        # eval records; the itinf batch size for SGA batch records) --
        # weight by it. The std is the between-record spread (per-image when
        # records are per-image; per-batch otherwise).
        pairs = [(float(r[m]), int(r.get("num_images", 1)))
                 for r in by_lambda[l] if m in r and r[m] is not None]
        if not pairs:
          means.append(None)
          stds.append(None)
          continue
        wsum = sum(w for _, w in pairs)
        mean = sum(v * w for v, w in pairs) / wsum
        var = sum(w * (v - mean) ** 2 for v, w in pairs) / wsum
        means.append(mean)
        stds.append(math.sqrt(var))
      if any(v is not None for v in means):
        agg[m] = means
        agg[m + "_std"] = stds
    aggregate[method] = agg

  os.makedirs(args.out, exist_ok=True)
  with open(os.path.join(args.out, "aggregate.json"), "w") as f:
    json.dump(aggregate, f, indent=2)
  for method, records in detailed.items():
    safe = re.sub(r"[^\w=.+-]", "_", method)
    with open(os.path.join(args.out, f"{safe}-detailed.json"), "w") as f:
      json.dump(records, f, indent=2)
  print(f"Wrote aggregate for {len(detailed)} methods to {args.out}")


if __name__ == "__main__":
  main()
