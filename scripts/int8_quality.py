#!/usr/bin/env python
"""Quality cost of the int8 decode path on a trained checkpoint.

Runs the full end-to-end eval (rate from the real entropy models, PSNR /
MS-SSIM from the decoded images) on the dead-leaves eval set twice -- float
path vs SNTC_INT8_DECODE -- and writes the per-image and mean deltas to
results/int8_quality.json. The int8 path quantizes every phase-space decode
GEMM (ops/int8ops.py); rate shifts too because the hyper-decoder's mu/sigma
feed the conditional entropy model.

  python scripts/int8_quality.py \
      [--workdir train_xms_rd/201b91d1/mshyper-lmbda=0.01-num_steps=30000] \
      [--dataset deadleaves_eval] [--out results/int8_quality.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
  p = argparse.ArgumentParser()
  p.add_argument(
      "--workdir",
      default="train_xms_rd/201b91d1/mshyper-lmbda=0.01-num_steps=30000")
  p.add_argument("--dataset", default="deadleaves_eval")
  p.add_argument("--out", default="results/int8_quality.json")
  p.add_argument("--max_images", type=int, default=0)
  args = p.parse_args()

  from shallow_ntc_tpu.utils.jax_setup import setup_jax
  setup_jax(matmul_precision="default")

  from shallow_ntc_tpu import data as data_lib
  from shallow_ntc_tpu import eval_lib
  from shallow_ntc_tpu.ops import int8ops

  model, params, _ = eval_lib.load_latest_ckpt(args.workdir)
  images = list(
      data_lib.get_dataset(
          args.dataset, split="test", batchsize=1, patchsize=None,
          normalize=True,
      )
  )
  if args.max_images:
    images = images[: args.max_images]

  def run(decode_mode, encode_on=False):
    os.environ["SNTC_INT8_DECODE"] = decode_mode
    os.environ["SNTC_INT8_ENCODE"] = "1" if encode_on else ""
    # Fresh generator => fresh jit closure per mode (the int8 gate is read
    # at trace time; reusing one jitted fn across modes would be stale).
    return [m for m in eval_lib.evaluate_images(model, params, list(images))]

  arms = {
      "f32": run(""),
      "syn": run("syn"),
      "all": run("all"),
      "enc": run("", encode_on=True),
      "enc_syn": run("syn", encode_on=True),
  }
  del int8ops  # gate handled via env above

  keys = ("psnr", "bpp", "msssim", "rd_loss")
  per_image = []
  for i in range(len(arms["f32"])):
    per_image.append({
        f"{arm}_{k}": arms[arm][i][k]
        for arm in arms for k in keys if k in arms[arm][i]
    })
  mean = lambda xs: sum(xs) / max(len(xs), 1)
  summary = {}
  for k in keys:
    fa = mean([r[f"f32_{k}"] for r in per_image])
    summary[k] = {"f32": fa}
    for arm in arms:
      if arm == "f32":
        continue
      v = mean([r[f"{arm}_{k}"] for r in per_image])
      summary[k][arm] = v
      summary[k][f"{arm}_delta"] = v - fa
  out = {
      "workdir": args.workdir,
      "dataset": args.dataset,
      "num_images": len(per_image),
      "summary": summary,
      "per_image": per_image,
  }
  os.makedirs(os.path.dirname(args.out), exist_ok=True)
  with open(args.out, "w") as f:
    json.dump(out, f, indent=1)
  print(json.dumps({"int8_quality": summary}, indent=1))


if __name__ == "__main__":
  main()
