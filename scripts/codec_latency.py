#!/usr/bin/env python
"""End-to-end compress/decompress latency breakdown (VERDICT r2 item 4).

Times the full decode path of a real bitstream — host rANS (striped,
threaded/ILP-interleaved) + device hyper-synthesis/synthesis — for a
Kodak-sized image, against a trained checkpoint. Also reports the bpp
overhead vs the likelihood bound so the parallel-stream framing is shown to
stay inside the 0.5% budget.

  python scripts/codec_latency.py --workdir train_xms_rd/201b91d1/mshyper-... \
      [--image data/deadleaves/eval/dle000.png] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--workdir", required=True)
  p.add_argument("--image", default="data/deadleaves/eval/dle000.png")
  p.add_argument("--cpu", action="store_true")
  p.add_argument("--reps", type=int, default=5)
  args = p.parse_args()

  import jax

  if args.cpu:
    jax.config.update("jax_platforms", "cpu")

  import jax.numpy as jnp

  from shallow_ntc_tpu import data as data_lib, eval_lib
  from shallow_ntc_tpu.codec import api as codec_api, bindings, tables

  model, params, _ = eval_lib.load_latest_ckpt(args.workdir)
  codec = codec_api.make_codec(model, params)

  img = data_lib.read_png(args.image).astype(np.float32) / 255.0 - 0.5
  h, w = img.shape[:2]

  res = codec.compress(img)
  blob = res.bitstring
  counts = codec_api.stream_counts(blob)
  print(f"image {h}x{w}: {len(blob)} bytes = {res.bpp:.4f} bpp, "
        f"streams per tensor: {counts}")

  # Likelihood-bound bpp from the eval path.
  _, metrics, _ = model.apply(
      {"params": params}, jnp.asarray(img[None]), training=False, rng=None,
      step=10**9, method=type(model).end_to_end_frame_loss)
  bound = float(metrics["bpp"])
  print(f"likelihood bound {bound:.4f} bpp -> overhead "
        f"{(res.bpp / bound - 1) * 100:.3f}% (budget <= 0.5%)")

  # Whole-decode wall time (host entropy decode + device synthesis).
  rec = codec.decompress(blob)
  ts = []
  for _ in range(args.reps):
    t0 = time.perf_counter()
    rec = codec.decompress(blob)
    ts.append(time.perf_counter() - t0)
  print(f"decompress wall: {min(ts)*1e3:.1f} ms "
        f"(median {sorted(ts)[len(ts)//2]*1e3:.1f})")
  np.testing.assert_array_equal(rec, res.reconstruction)

  # Host-only entropy decode (the round-2 floor was ~15 ms sequential).
  version, family_id, hh, ww, rest = codec_api._unpack_header(blob)
  if family_id == 1:
    z_chunks, y_chunks = codec_api._unpack_tensors(rest, 2)
    z_shape, (b, yh, yw, _) = codec._latent_shapes(hh, ww)
    z_idx = codec.z_tables.channel_indexes(z_shape)
    z_syms = bindings.rans_decode_striped(z_chunks, z_idx, codec.z_tables.tables)
    z_hat = codec.z_tables.latent_from_symbols(z_syms)
    mu, indexes = jax.device_get(
        codec._hyper_dec(codec.params, jnp.asarray(z_hat, jnp.float32)))
    y_idx = codec.y_tables.snap_indexes(indexes)

    n_sym = int(np.prod(y_idx.shape))
    for label, fn in (
        ("striped", lambda: bindings.rans_decode_striped(
            y_chunks, y_idx, codec.y_tables.tables)),
    ):
      fn()
      best = min(
          _timeit(fn) for _ in range(args.reps)
      )
      print(f"host y-decode [{label}]: {best*1e3:.2f} ms "
            f"({n_sym/best/1e6:.1f} Msym/s, {len(y_chunks)} streams)")
    # Single-stream comparison on a re-encoded single stream.
    y_syms = bindings.rans_decode_striped(y_chunks, y_idx, codec.y_tables.tables)
    single = bindings.rans_encode(y_syms, y_idx, codec.y_tables.tables)
    fn1 = lambda: bindings.rans_decode(single, y_idx, codec.y_tables.tables)
    fn1()
    best = min(_timeit(fn1) for _ in range(args.reps))
    print(f"host y-decode [single-stream]: {best*1e3:.2f} ms "
          f"({n_sym/best/1e6:.1f} Msym/s)")


def _timeit(fn):
  t0 = time.perf_counter()
  fn()
  return time.perf_counter() - t0


if __name__ == "__main__":
  main()
