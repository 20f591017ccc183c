#!/usr/bin/env python
"""FLOPs/params accounting for every architecture (the notebooks/get_flops
analogue; reference: notebooks/get_flops.ipynb -> results/all_fpp.csv).

Computes XLA-compiled FLOPs per pixel at 512x768 for the paper's transforms
and prints a CSV. Note: XLA counts post-fusion executed FLOPs, which can
differ slightly from the reference's TF-graph-profiler counts (analytic
conv FLOPs); the big ratios (ELIC encoder ~0.5M vs shallow decoders ~10-40K
FLOPs/px) are directly comparable to results/flops_per_pixel.csv.

Usage: python scripts/get_flops.py [--height 512 --width 768]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

TRANSFORMS = {
    # name: (config, input kind)  kind: image | latent320 | latent_hyper
    "ElicAnalysis(192,192,192,320) [f]": (
        dict(cls="ElicAnalysis", channels=(192, 192, 192, 320)), "image"),
    "HyperAnalysis(320) [f_h]": (
        dict(cls="HyperAnalysis", bottleneck_size=320), "latent320"),
    "HyperSynthesis(320) [g_h]": (
        dict(cls="HyperSynthesis", bottleneck_size=320), "hyper320"),
    "JPEGLikeHyperSynthesis(320)": (
        dict(cls="JPEGLikeHyperSynthesis", bottleneck_size=320), "hyper320"),
    "JPEGLikeSynthesis(k18,s16) [g jpegl]": (
        dict(cls="JPEGLikeSynthesis", kernel_size=18, strides=16), "latent320"),
    "TwoLayerResSynthesis(12,3) [g 2layer]": (
        dict(cls="TwoLayerResSynthesis", channels=(12, 3)), "latent320"),
    "TwoLayerSynthesis(24,3) [g 2layer syn2]": (
        dict(cls="TwoLayerSynthesis", channels=(24, 3)), "latent320"),
    "BLS2017Analysis(256)": (
        dict(cls="BLS2017Analysis", num_filters=256), "image"),
    "BLS2017Synthesis(256)": (
        dict(cls="BLS2017Synthesis", num_filters=256), "latent256"),
    "MBT2018Analysis(192,320)": (
        dict(cls="MBT2018Analysis", channels_base=192, output_channels=320), "image"),
    "MBT2018Synthesis(192)": (
        dict(cls="MBT2018Synthesis", channels_base=192), "latent320"),
    "CNNAnalysis(256,320)": (
        dict(cls="CNNAnalysis", channels_base=256, output_channels=320), "image"),
    "ElicSynthesis(192,160,128,3)": (
        dict(cls="ElicSynthesis", channels=(192, 160, 128, 3)), "latent320"),
}


def input_for(kind, h, w):
  if kind == "image":
    return jnp.zeros((1, h, w, 3), jnp.float32)
  if kind == "latent320":
    return jnp.zeros((1, h // 16, w // 16, 320), jnp.float32)
  if kind == "latent256":
    return jnp.zeros((1, h // 16, w // 16, 256), jnp.float32)
  if kind == "hyper320":
    return jnp.zeros((1, h // 64, w // 64, 320), jnp.float32)
  raise ValueError(kind)


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument("--height", type=int, default=512)
  parser.add_argument("--width", type=int, default=768)
  args = parser.parse_args()

  jax.config.update("jax_platforms", "cpu")
  from shallow_ntc_tpu.models import transforms as T
  from shallow_ntc_tpu.utils import profiling

  h, w = args.height, args.width
  n_pixels = h * w
  print("transform,flops_per_pixel,params")
  for name, (cfg, kind) in TRANSFORMS.items():
    mod = T.build_transform(cfg)
    x = input_for(kind, h, w)
    params = mod.init(jax.random.PRNGKey(0), x)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    flops = profiling.get_flops(
        lambda p, v: mod.apply(p, v), params, x
    )
    print(f"{name},{flops / n_pixels:.0f},{n_params}")


if __name__ == "__main__":
  main()
