#!/usr/bin/env python
"""Convert public LPIPS-VGG weights to the shallow_ntc_tpu .npz format.

Sources (either works; both need network access or pre-downloaded files):
  * torchvision VGG16 (features) + richzhang/PerceptualSimilarity vgg.pth
    linear heads, or
  * the `lpips` pip package (bundles both).

Usage:
  python scripts/convert_lpips_weights.py --out lpips_vgg_weights.npz

The output feeds shallow_ntc_tpu/models/lpips.py (keys conv{i}_w/b, lin{l}_w).
Torch conv weights [out, in, kh, kw] are transposed to HWIO.
"""

import argparse

import numpy as np


def convert_from_lpips_package(out_path: str):
  import lpips  # type: ignore
  import torch

  net = lpips.LPIPS(net="vgg")
  vgg = net.net  # lpips.pretrained_networks.vgg16
  convs = []
  for stage in [vgg.slice1, vgg.slice2, vgg.slice3, vgg.slice4, vgg.slice5]:
    for layer in stage:
      if isinstance(layer, torch.nn.Conv2d):
        convs.append(layer)
  assert len(convs) == 13, f"expected 13 VGG16 convs, got {len(convs)}"

  weights = {}
  for i, conv in enumerate(convs):
    w = conv.weight.detach().numpy()  # [out, in, kh, kw]
    weights[f"conv{i}_w"] = np.transpose(w, (2, 3, 1, 0)).astype(np.float32)
    weights[f"conv{i}_b"] = conv.bias.detach().numpy().astype(np.float32)
  for l, lin in enumerate(net.lins):
    w = lin.model[-1].weight.detach().numpy()  # [1, C, 1, 1]
    weights[f"lin{l}_w"] = w.reshape(-1).astype(np.float32)

  np.savez(out_path, **weights)
  print(f"Wrote {out_path} with {len(weights)} arrays")


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument("--out", default="lpips_vgg_weights.npz")
  args = parser.parse_args()
  try:
    convert_from_lpips_package(args.out)
  except ImportError as e:
    raise SystemExit(
        f"Needs the `lpips` + `torch` packages with downloaded weights: {e}"
    )


if __name__ == "__main__":
  main()
