#!/usr/bin/env python
"""End-to-end codec latency: image->bitstream and bitstream->image, wall ms.

VERDICT r3 item 4: the 2 Gpx/s decode headline is device-compute-only; the
real product surface (compress.py / codec/api.py) pays host rANS, tunnel
RPCs, and transfers. This measures the honest numbers on the real chip:

  * per-image compress()/decompress() latency (the strict sequential chain),
  * compress_batch()/decompress_batch() amortized per image (the pipelined
    path: chunked device calls dispatched async, uint8 fetches),

and cross-checks on-TPU that the batch reconstructions equal the per-image
path. Writes results/codec_e2e.json. Idle chip only (host load skews the
wall clock; see .claude/skills/verify/SKILL.md).

  python scripts/codec_e2e_bench.py --workdir <trained workdir>
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, repeats):
  best = []
  for _ in range(repeats):
    t0 = time.perf_counter()
    out = fn()
    best.append(time.perf_counter() - t0)
  return out, min(best), float(np.mean(best))


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--workdir", required=True)
  p.add_argument("--images", default="data/deadleaves/eval/*.png")
  p.add_argument("--num_images", type=int, default=24)
  p.add_argument("--chunk_size", type=int, default=8)
  p.add_argument("--repeats", type=int, default=3)
  p.add_argument("--out", default="results/codec_e2e.json")
  args = p.parse_args()

  from shallow_ntc_tpu import data as data_lib, eval_lib
  from shallow_ntc_tpu.codec import api as codec_api
  from shallow_ntc_tpu.models.base import normalize_image
  from shallow_ntc_tpu.utils.jax_setup import setup_jax

  setup_jax()
  import jax

  print("device:", jax.devices()[0].device_kind, flush=True)

  paths = sorted(glob.glob(args.images))[: args.num_images]
  assert paths, f"no images match {args.images}"
  imgs = [normalize_image(data_lib.read_png(f).astype(np.float32))
          for f in paths]
  h, w = imgs[0].shape[:2]
  n = len(imgs)

  model, params, _ = eval_lib.load_latest_ckpt(args.workdir)
  codec = codec_api.make_codec(model, params)

  # Warm every compile path (single, full chunk, remainder chunk).
  single = codec.compress(imgs[0])
  codec.decompress(single.bitstring)
  warm = codec.compress_batch(imgs, chunk_size=args.chunk_size)
  blobs = [r.bitstring for r in warm]
  recs_batch = codec.decompress_batch(blobs, chunk_size=args.chunk_size)

  # On-TPU equivalence of the pipelined paths vs the sequential path.
  # The codec contract: y_hat is bit-identical across paths (both compute
  # the coding tables with the canonical batch-1 hyper-synthesis program;
  # see codec/api.py hyper_dec), so reconstructions agree up to the odd
  # +-1 uint8 flip where the batched synthesis tiling rounds differently.
  # A wrong index stream shows up as +-hundreds over ~15% of pixels
  # (observed before the determinism fix: 18.6 dB vs 30.5 dB).
  bitstreams_equal = blobs[0] == single.bitstring
  rec_single = codec.decompress(blobs[0])
  d = recs_batch[0].astype(np.int32) - rec_single.astype(np.int32)
  max_abs, frac = int(np.abs(d).max()), float((d != 0).mean())
  assert max_abs <= 1 and frac < 0.05, (
      f"batch decode diverges from single: max|d|={max_abs}, frac={frac}")

  # Per-image sequential latency (averaged across distinct images).
  k = min(8, n)
  _, t_enc1_min, t_enc1 = timed(
      lambda: [codec.compress(im) for im in imgs[:k]], args.repeats)
  _, t_dec1_min, t_dec1 = timed(
      lambda: [codec.decompress(b) for b in blobs[:k]], args.repeats)

  # Pipelined batch latency.
  _, t_encb_min, t_encb = timed(
      lambda: codec.compress_batch(imgs, chunk_size=args.chunk_size),
      args.repeats)
  _, t_decb_min, t_decb = timed(
      lambda: codec.decompress_batch(blobs, chunk_size=args.chunk_size),
      args.repeats)

  bpp = float(np.mean([r.bpp for r in warm]))
  record = {
      "images": n, "height": h, "width": w, "bpp_mean": round(bpp, 4),
      "chunk_size": args.chunk_size, "repeats": args.repeats,
      "e2e_encode_ms_single": round(t_enc1 / k * 1e3, 2),
      "e2e_decode_ms_single": round(t_dec1 / k * 1e3, 2),
      "e2e_encode_ms_batch": round(t_encb / n * 1e3, 2),
      "e2e_decode_ms_batch": round(t_decb / n * 1e3, 2),
      "e2e_encode_ms_batch_min": round(t_encb_min / n * 1e3, 2),
      "e2e_decode_ms_batch_min": round(t_decb_min / n * 1e3, 2),
      "decode_Mpx_per_s_batch": round(n * h * w / t_decb / 1e6, 1),
      "encode_Mpx_per_s_batch": round(n * h * w / t_encb / 1e6, 1),
      "recon_batch_vs_single_max_abs": max_abs,
      "recon_batch_vs_single_frac": round(frac, 5),
      "bitstream_batch_equals_single": bool(bitstreams_equal),
  }
  os.makedirs(os.path.dirname(args.out), exist_ok=True)
  with open(args.out, "w") as f:
    json.dump(record, f, indent=2)
  print(json.dumps(record, indent=2))


if __name__ == "__main__":
  main()
