#!/usr/bin/env python
"""Visualize shallow-decoder basis functions (reference: notebooks/vis_syn_filters.ipynb).

For a (near-)linear decoder g, the learned basis functions are g(e_i) - g(0)
for unit latent vectors e_i -- for the JPEG-like decoder these are the
learned analogue of DCT basis patches. Saves a tiled PNG grid.

Usage:
  python scripts/vis_syn_filters.py --workdir <trained workdir> \
      --out filters.png [--num 64]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument("--workdir", required=True)
  parser.add_argument("--out", default="filters.png")
  parser.add_argument("--num", type=int, default=64, help="number of basis fns")
  parser.add_argument("--scale", type=float, default=8.0, help="latent magnitude")
  parser.add_argument("--model_family", default=None)
  args = parser.parse_args()

  import jax
  import jax.numpy as jnp

  from shallow_ntc_tpu import data as data_lib
  from shallow_ntc_tpu import eval_lib
  from shallow_ntc_tpu.ops.metrics_ops import visualize_image_batch
  from shallow_ntc_tpu.utils.jax_setup import setup_jax

  setup_jax()
  model, params, config = eval_lib.load_latest_ckpt(args.workdir, args.model_family)
  cls = type(model)

  # Latent depth from the analysis config.
  from shallow_ntc_tpu.models.transforms import config_output_depth

  tc = config["model_config"]["transform_config"]
  c = config_output_depth(tc["analysis"])
  n = min(args.num, c)

  # g(e_i) and g(0) on a small latent canvas; crop the center patch.
  canvas = 8
  zeros = jnp.zeros((1, canvas, canvas, c), jnp.float32)
  synth = jax.jit(
      lambda p, v: model.apply({"params": p}, v, method=cls.synthesize)
  )
  g0 = np.asarray(synth(params, zeros))

  basis = []
  for i in range(n):
    z = zeros.at[0, canvas // 2, canvas // 2, i].set(args.scale)
    gi = np.asarray(synth(params, z))
    basis.append((gi - g0)[0])
  basis = np.stack(basis)  # [n, H, W, 3]

  # Normalize each basis function to [0, 255] and crop around the impulse.
  up = basis.shape[1] // canvas
  k = min(3 * up, basis.shape[1])
  c0 = basis.shape[1] // 2 - k // 2
  crops = basis[:, c0 : c0 + k, c0 : c0 + k, :]
  lo = crops.min(axis=(1, 2, 3), keepdims=True)
  hi = crops.max(axis=(1, 2, 3), keepdims=True)
  imgs = (crops - lo) / np.maximum(hi - lo, 1e-9) * 255.0

  grid = visualize_image_batch(imgs.astype(np.uint8))
  data_lib.write_png(args.out, np.asarray(grid))
  print(f"Wrote {args.out}: {n} basis functions, patch {k}x{k}")


if __name__ == "__main__":
  main()
