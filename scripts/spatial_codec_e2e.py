#!/usr/bin/env python
"""High-resolution spatial codec end-to-end (VERDICT r4 item 8).

Drives the one composition no other artifact exercises: pad + spatial
sharding (halo exchange) + real bitstream codec together, on a CLIC-sized
(>= 2000 px) image.

Two modes (separate invocations; results merge into one JSON):

  --mode chip   single-device roundtrip on the real TPU: compress ->
                decompress at 2048x1536, wall-clock + bpp/psnr.
  --mode mesh   8-virtual-CPU-device mesh: make_codec(spatial_devices=8)
                self-roundtrip (bit-exact) + cross-setting interop vs the
                single-device CPU codec (recon |d| <= 1 uint8, same bpp).

Bitstream portability contract: bitstreams interoperate across
spatial_devices settings ON THE SAME PLATFORM (the coding-table program is
canonical single-device batch-1 on both sides). Cross-PLATFORM portability
(CPU<->TPU) is out of contract: the canonical program compiles to different
conv tilings per platform and a low-bit sigma difference at a scale-bucket
boundary can flip an index (codec/api.py determinism contract).

  python scripts/spatial_codec_e2e.py --mode chip \
      --workdir train_xms_rd/201b91d1/mshyper-lmbda=0.01-num_steps=30000
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--mode", choices=["chip", "mesh"], required=True)
  p.add_argument("--workdir", required=True)
  p.add_argument("--height", type=int, default=2048)
  p.add_argument("--width", type=int, default=1536)
  p.add_argument("--spatial_devices", type=int, default=8)
  p.add_argument("--out", default="results/spatial_codec_e2e.json")
  args = p.parse_args()

  if args.mode == "mesh":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
  else:
    import jax

  from shallow_ntc_tpu.utils.jax_setup import setup_jax

  setup_jax(matmul_precision=None)
  print("devices:", jax.devices(), flush=True)

  from shallow_ntc_tpu import eval_lib
  from shallow_ntc_tpu.codec import api as codec_api

  sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
  from make_deadleaves_dataset import deadleaves_image

  model, params, _ = eval_lib.load_latest_ckpt(args.workdir)
  img_u8 = deadleaves_image(777000, args.height, args.width)
  img = img_u8.astype(np.float32) / 255.0 - 0.5

  rec = {}
  if args.mode == "chip":
    codec = codec_api.make_codec(model, params)
    t0 = time.perf_counter()
    result = codec.compress(img)
    t_enc = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = codec.decompress(result.bitstring)
    t_dec = time.perf_counter() - t0
    # warm second shot (first includes compiles)
    t0 = time.perf_counter()
    result = codec.compress(img)
    t_enc = min(t_enc, time.perf_counter() - t0)
    t0 = time.perf_counter()
    out2 = codec.decompress(result.bitstring)
    t_dec = min(t_dec, time.perf_counter() - t0)
    np.testing.assert_array_equal(out, result.reconstruction)
    np.testing.assert_array_equal(out, out2)
    mse = float(np.mean((out.astype(np.float32) - img_u8) ** 2))
    rec["chip_single_device"] = {
        "height": args.height, "width": args.width,
        "bpp": round(result.bpp, 4),
        "psnr_vs_source": round(10 * np.log10(255.0**2 / mse), 3),
        "encode_wall_s_warm": round(t_enc, 3),
        "decode_wall_s_warm": round(t_dec, 3),
        "roundtrip_bit_exact": True,
    }
  else:
    plain = codec_api.make_codec(model, params)
    spatial = codec_api.make_codec(
        model, params, spatial_devices=args.spatial_devices)
    r_sp = spatial.compress(img)
    rec_sp = spatial.decompress(r_sp.bitstring)
    np.testing.assert_array_equal(rec_sp, r_sp.reconstruction)
    # cross-setting interop on the same platform
    rec_pl_of_sp = plain.decompress(r_sp.bitstring)
    r_pl = plain.compress(img)
    rec_sp_of_pl = spatial.decompress(r_pl.bitstring)
    d1 = np.abs(rec_pl_of_sp.astype(np.int32) - r_sp.reconstruction.astype(np.int32))
    d2 = np.abs(rec_sp_of_pl.astype(np.int32) - r_pl.reconstruction.astype(np.int32))
    mse = float(np.mean((rec_sp.astype(np.float32) - img_u8) ** 2))
    rec["cpu_mesh_spatial"] = {
        "height": args.height, "width": args.width,
        "spatial_devices": args.spatial_devices,
        "bpp_spatial": round(r_sp.bpp, 4),
        "bpp_single": round(r_pl.bpp, 4),
        "psnr_vs_source": round(10 * np.log10(255.0**2 / mse), 3),
        "self_roundtrip_bit_exact": True,
        "cross_decode_max_abs": int(max(d1.max(), d2.max())),
        "cross_decode_frac_diff": round(float(((d1 != 0).mean() + (d2 != 0).mean()) / 2), 6),
    }

  merged = {}
  if os.path.exists(args.out):
    with open(args.out) as f:
      merged = json.load(f)
  merged.update(rec)
  os.makedirs(os.path.dirname(args.out), exist_ok=True)
  with open(args.out, "w") as f:
    json.dump(merged, f, indent=1)
  print(json.dumps(rec, indent=1), flush=True)


if __name__ == "__main__":
  main()
