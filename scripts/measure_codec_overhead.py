#!/usr/bin/env python
"""Measure real-bitstream bpp vs the likelihood bound on a trained model.

SURVEY.md section 4 budgets the rANS bitstream at <= 0.5% over the
likelihood-bound bpp (goal +0.1%). This script loads a trained workdir,
compresses eval images, verifies lossless round-trips, and attributes the
gap: header bytes, rANS flush/stream overhead, CDF quantization.

Usage:
  python scripts/measure_codec_overhead.py --workdir <trained workdir> \
      --dataset deadleaves_eval [--out results/codec_overhead.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--workdir", required=True)
  p.add_argument("--dataset", default="deadleaves_eval")
  p.add_argument("--max_images", type=int, default=8)
  p.add_argument("--out", default=None)
  p.add_argument("--cpu", action="store_true",
                 help="Force the CPU backend (this measurement needs no TPU; "
                      "the JAX_PLATFORMS env var is ignored in this image).")
  args = p.parse_args()

  import jax

  if args.cpu:
    jax.config.update("jax_platforms", "cpu")
  import jax.numpy as jnp

  from shallow_ntc_tpu import data as data_lib
  from shallow_ntc_tpu import eval_lib
  from shallow_ntc_tpu.codec import api as codec_api

  model, params, _ = eval_lib.load_latest_ckpt(args.workdir)
  codec = codec_api.make_codec(model, params)

  rows = []
  ds = data_lib.get_dataset(args.dataset, "test", 1, None)
  for i, batch in enumerate(ds):
    if i >= args.max_images:
      break
    img = np.asarray(batch)[0]
    h, w = img.shape[:2]
    result = codec.compress(img)
    rec = codec.decompress(result.bitstring)
    lossless = np.array_equal(rec, result.reconstruction)

    _, metrics, _ = model.apply(
        {"params": params}, jnp.asarray(img[None]), training=False, rng=None,
        step=10**9, method=type(model).end_to_end_frame_loss,
    )
    like_bpp = float(metrics["bpp"])
    real_bpp = result.bpp
    n_px = h * w
    rows.append(dict(
        instance_id=i, h=h, w=w,
        likelihood_bpp=like_bpp,
        real_bpp=real_bpp,
        overhead_pct=100.0 * (real_bpp - like_bpp) / like_bpp,
        header_bpp=8.0 * 18 / n_px,  # magic+version+family+H+W (10) + 2 chunk lengths
        psnr=float(metrics["psnr"]),
        roundtrip_lossless=bool(lossless),
    ))
    print(rows[-1], flush=True)

  agg = dict(
      workdir=os.path.abspath(args.workdir),
      dataset=args.dataset,
      mean_likelihood_bpp=float(np.mean([r["likelihood_bpp"] for r in rows])),
      mean_real_bpp=float(np.mean([r["real_bpp"] for r in rows])),
      mean_overhead_pct=float(np.mean([r["overhead_pct"] for r in rows])),
      max_overhead_pct=float(np.max([r["overhead_pct"] for r in rows])),
      all_lossless=all(r["roundtrip_lossless"] for r in rows),
      per_image=rows,
  )
  print(json.dumps({k: v for k, v in agg.items() if k != "per_image"}, indent=2))
  if args.out:
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
      json.dump(agg, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
  main()
