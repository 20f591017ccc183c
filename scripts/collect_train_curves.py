#!/usr/bin/env python
"""Collect train-loss trajectories from workdir record.jsonl files.

Produces a compact curves JSON (list of {runname, points: [{step, bpp, psnr,
rd_loss}]}) for committing alongside R-D results (RD_REPORT.md) without
shipping full TensorBoard event files.

Usage:
  python scripts/collect_train_curves.py --workdirs_glob 'train_xms_rd/*/mshyper-*' \
      --out results/rd_deadleaves/train_curves.json [--every 1000]
"""

import argparse
import glob
import json
import os


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--workdirs_glob", required=True)
  p.add_argument("--out", required=True)
  p.add_argument("--every", type=int, default=1000,
                 help="Keep points whose step is a multiple of this.")
  args = p.parse_args()

  curves = []
  for wd in sorted(glob.glob(args.workdirs_glob)):
    rec = os.path.join(wd, "train", "record.jsonl")
    if not os.path.isfile(rec):
      continue
    points = []
    with open(rec) as f:
      for line in f:
        r = json.loads(line)
        if r["step"] % args.every == 0 or not points:
          points.append(
              {k: round(float(r[k]), 5)
               for k in ("step", "bpp", "psnr", "rd_loss") if k in r}
          )
    curves.append({"runname": os.path.basename(wd), "points": points})

  if not curves:
    raise SystemExit(f"No record.jsonl under {args.workdirs_glob!r}")
  os.makedirs(os.path.dirname(args.out), exist_ok=True)
  with open(args.out, "w") as f:
    json.dump(curves, f, indent=1)
  print(f"wrote {args.out} ({len(curves)} curves)")


if __name__ == "__main__":
  main()
