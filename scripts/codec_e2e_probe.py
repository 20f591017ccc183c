#!/usr/bin/env python
"""Stage-by-stage attribution of end-to-end codec latency on the real chip.

results/codec_e2e.json (scripts/codec_e2e_bench.py) measures the product
surface; THIS script explains it: per-stage wall times for one image through
compress()/decompress(), raw tunnel transfer probes (H2D/D2H bandwidth and
the RPC floor), and the payload sizes each stage moves. Writes
results/codec_e2e_probe.json. Idle chip only.

  python scripts/codec_e2e_probe.py --workdir <trained workdir>
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def t(fn, n=5):
  """Median wall ms of fn() over n runs."""
  xs = []
  for _ in range(n):
    t0 = time.perf_counter()
    fn()
    xs.append((time.perf_counter() - t0) * 1e3)
  return round(float(np.median(xs)), 2)


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--workdir", required=True)
  p.add_argument("--images", default="data/deadleaves/eval/*.png")
  p.add_argument("--out", default="results/codec_e2e_probe.json")
  args = p.parse_args()

  from shallow_ntc_tpu import data as data_lib, eval_lib
  from shallow_ntc_tpu.codec import api as codec_api
  from shallow_ntc_tpu.models.base import normalize_image
  from shallow_ntc_tpu.utils.jax_setup import setup_jax

  setup_jax()
  import jax
  import jax.numpy as jnp

  dev = jax.devices()[0]
  print("device:", dev.device_kind, flush=True)

  path = sorted(glob.glob(args.images))[0]
  img = normalize_image(data_lib.read_png(path).astype(np.float32))
  h, w = img.shape[:2]
  x = img[None]

  model, params, _ = eval_lib.load_latest_ckpt(args.workdir)
  codec = codec_api.make_codec(model, params)

  rec = {"height": h, "width": w}

  # ---- Raw tunnel probes -------------------------------------------------
  small = np.zeros((8, 8), np.float32)
  buf_f32 = np.zeros((1, h // 16, w // 16, 320), np.float32)  # ~mu-sized
  buf_u8 = np.zeros((h, w, 3), np.uint8)  # ~recon-sized
  tiny = jnp.zeros((8, 8))
  _ = jax.device_put(small, dev).block_until_ready()

  rec["probe_null_rpc_ms"] = t(
      lambda: jnp.add(tiny, 1.0).block_until_ready())  # dispatch+wait floor
  rec["probe_tiny_fetch_ms"] = t(
      lambda: np.asarray(jnp.add(tiny, 1.0)))  # + D2H floor
  a = jax.device_put(buf_f32, dev)
  a.block_until_ready()
  rec["probe_d2h_f32_MB"] = round(buf_f32.nbytes / 1e6, 2)
  rec["probe_d2h_f32_ms"] = t(lambda: np.asarray(a))
  rec["probe_h2d_f32_ms"] = t(
      lambda: jax.device_put(buf_f32, dev).block_until_ready())
  b = jax.device_put(buf_u8, dev)
  b.block_until_ready()
  rec["probe_d2h_u8_MB"] = round(buf_u8.nbytes / 1e6, 2)
  rec["probe_d2h_u8_ms"] = t(lambda: np.asarray(b))

  # ---- Encode stages (one image) ----------------------------------------
  # Warm everything once via the public API.
  res = codec.compress(img)
  blob = res.bitstring
  codec.decompress(blob)

  xj = jnp.asarray(x)
  xj.block_until_ready()
  rec["enc_analysis_compute_ms"] = t(
      lambda: jax.block_until_ready(codec._analyze(codec.params, xj)))
  zy = codec._analyze(codec.params, xj)
  rec["enc_analysis_fetch_ms"] = t(lambda: jax.device_get(zy))
  z, y = jax.device_get(zy)
  rec["enc_payload_zy_MB"] = round((z.nbytes + y.nbytes) / 1e6, 2)

  rec["enc_z_host_rans_ms"] = t(lambda: codec._encode_z_host(z))
  z_chunks, z_hat = codec._encode_z_host(z)

  zj = jnp.asarray(z_hat, jnp.float32)
  zj.block_until_ready()
  rec["hyper_compute_ms"] = t(
      lambda: jax.block_until_ready(codec._hyper_dec(codec.params, zj)))
  hyp = codec._hyper_dec(codec.params, zj)
  rec["hyper_fetch_ms"] = t(lambda: jax.device_get(hyp))
  mu, indexes = jax.device_get(hyp)
  rec["hyper_payload_MB"] = round((mu.nbytes + indexes.nbytes) / 1e6, 2)
  rec["hyper_dtypes"] = f"mu={mu.dtype}, indexes={indexes.dtype}"

  rec["enc_y_host_rans_ms"] = t(
      lambda: codec._encode_y_host(z_chunks, y, mu, indexes, h, w))
  _, y_hat = codec._encode_y_host(z_chunks, y, mu, indexes, h, w)

  # ---- Decode stages -----------------------------------------------------
  rec["dec_z_host_rans_ms"] = t(lambda: codec._decode_z_host(blob))
  st = codec._decode_z_host(blob)
  rec["dec_y_host_rans_ms"] = t(
      lambda: codec._decode_y_host(st[3], mu, indexes))

  rec["dec_yhat_h2d_ms"] = t(
      lambda: jnp.asarray(y_hat, jnp.float32).block_until_ready())
  rec["dec_yhat_MB"] = round(y_hat.nbytes / 1e6, 2)
  yj = jnp.asarray(y_hat, jnp.float32)
  yj.block_until_ready()
  rec["dec_synth_u8_compute_ms"] = t(
      lambda: codec._synth_u8(codec.params, yj).block_until_ready())
  ru = codec._synth_u8(codec.params, yj)
  rec["dec_synth_u8_fetch_ms"] = t(lambda: np.asarray(ru))

  # ---- Composed public-API singles, for cross-checking the sum ----------
  rec["e2e_compress_ms"] = t(lambda: codec.compress(img), 3)
  rec["e2e_decompress_ms"] = t(lambda: codec.decompress(blob), 3)

  os.makedirs(os.path.dirname(args.out), exist_ok=True)
  with open(args.out, "w") as f:
    json.dump(rec, f, indent=2)
  print(json.dumps(rec, indent=2))


if __name__ == "__main__":
  main()
