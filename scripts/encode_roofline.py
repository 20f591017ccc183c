#!/usr/bin/env python
"""Encode-path roofline: measured time vs minimum HBM bytes per stage.

VERDICT r3 item 6: turn the "RB chains run at ~73% HBM bandwidth" prose
into an artifact. For every stage of the flagship ELIC analysis (+ hyper
analysis) this measures marginal wall time at the real stage shapes and
computes the MINIMUM HBM traffic (read input once + write output once +
read weights once; for the fused RB chain the whole 3-block chain counts
one input + one output, for the unfused path each block re-reads/rewrites
the full tensor). achieved_GBps / peak gives how close each stage is to
speed-of-light; FLOP counts mark which stages are compute- vs DMA-bound.

Writes results/encode_roofline.json. Idle chip only.

  python scripts/encode_roofline.py [--batch 8]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scripts.bench_suite import loop_marginal_time

PEAK_HBM_GBPS = 819.0  # TPU v5e
PEAK_BF16_TFLOPS = 197.0


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument("--batch", type=int, default=8)
  parser.add_argument("--out", default="results/encode_roofline.json")
  args = parser.parse_args()

  import jax
  import jax.numpy as jnp

  from shallow_ntc_tpu.utils.jax_setup import setup_jax

  setup_jax(matmul_precision=None)
  print("device:", jax.devices()[0].device_kind, flush=True)

  import flax.linen as nn

  from shallow_ntc_tpu.models import elic

  B, H, W = args.batch, 512, 768
  bf16 = jnp.bfloat16
  rng = np.random.default_rng(0)
  dsize = 2  # bf16 bytes

  def rand(shape):
    return jnp.asarray(rng.normal(0, 1, shape), bf16)

  def module_stage(mod, in_shape):
    """Init `mod` at `in_shape`, return (callable, params, out_shape)."""
    x0 = rand(in_shape)
    params = mod.init(jax.random.PRNGKey(0), x0)["params"]
    params = jax.tree_util.tree_map(lambda a: a.astype(bf16), params)
    out_shape = jax.eval_shape(
        lambda v: mod.apply({"params": params}, v), x0).shape
    return (lambda v: mod.apply({"params": params}, v)), params, out_shape, x0

  def nbytes(shape):
    return int(np.prod(shape)) * dsize

  def pbytes(params):
    return sum(int(np.prod(p.shape)) * dsize
               for p in jax.tree_util.tree_leaves(params))

  stages = []

  def add_rb_chain_stage(name, c, hw):
    """The 3-ResidualBlock chain at channel c, spatial hw (dense formulation,
    the shipping path after three Pallas fusions lost; PERF_NOTES r3)."""
    from shallow_ntc_tpu.ops.pallas import rb_chain

    x0 = rand((B, hw[0], hw[1], c))
    pr = np.random.default_rng(1)
    mk = lambda *s: jnp.asarray(pr.normal(0, 0.1, s), bf16)
    chain = tuple(
        (mk(c, c // 2), mk(c // 2), mk(3, 3, c // 2, c // 2), mk(c // 2),
         mk(c // 2, c), mk(c)) for _ in range(3))
    wbytes = sum(int(np.prod(w.shape)) * dsize
                 for blk in chain for w in blk)
    # Minimum traffic: chain input read once, output written once, weights
    # once. The unfused XLA path re-materializes the full tensor between
    # blocks (~3x the activation traffic); both bounds are recorded.
    act = nbytes(x0.shape)
    n = B * hw[0] * hw[1]
    flops = 3 * 2 * n * (c * (c // 2) + 9 * (c // 2) * (c // 2)
                         + (c // 2) * c)
    stages.append((
        name, lambda v: rb_chain.dense_rb_chain(v, chain, jax.nn.relu), x0,
        dict(min_bytes=2 * act + wbytes, unfused_bytes=6 * act + wbytes,
             flops=flops)))

  def add_module_stage(name, mod, in_shape, flops_fn):
    fn, params, out_shape, x0 = module_stage(mod, in_shape)
    stages.append((name, fn, x0, dict(
        min_bytes=nbytes(in_shape) + nbytes(out_shape) + pbytes(params),
        flops=flops_fn(out_shape))))

  def conv_flops(k, cin):
    return lambda out: 2 * int(np.prod(out[:3])) * out[3] * k * k * cin

  # Flagship ElicAnalysis: channels (192, 192, 192, 320), k5 s2 each,
  # 3 RBs after conv0/1/2, SimpleAttention after stage 2 and 4.
  add_module_stage("conv0_s2", elic._conv(192, 5, 2, dtype=bf16),
                   (B, H, W, 3), conv_flops(5, 3))
  add_rb_chain_stage("rb_chain1", 192, (H // 2, W // 2))
  add_module_stage("conv1_s2", elic._conv(192, 5, 2, dtype=bf16),
                   (B, H // 2, W // 2, 192), conv_flops(5, 192))
  add_rb_chain_stage("rb_chain2", 192, (H // 4, W // 4))
  def attn_flops(c):
    # SimpleAttention = trunk (3 RBs) + branch (3 RBs) + 1x1 gate conv:
    # 6 bottleneck RBs (1x1 c->c/2, 3x3 c/2->c/2, 1x1 c/2->c) + one c->c 1x1.
    per_rb = 2 * (c * (c // 2) + 9 * (c // 2) ** 2 + (c // 2) * c)
    return lambda out: int(np.prod(out[:3])) * (6 * per_rb + 2 * c * c)

  add_module_stage("attn1", elic.SimpleAttention(dtype=bf16),
                   (B, H // 4, W // 4, 192), attn_flops(192))
  add_module_stage("conv2_s2", elic._conv(192, 5, 2, dtype=bf16),
                   (B, H // 4, W // 4, 192), conv_flops(5, 192))
  add_rb_chain_stage("rb_chain3", 192, (H // 8, W // 8))
  add_module_stage("conv3_s2", elic._conv(320, 5, 2, dtype=bf16),
                   (B, H // 8, W // 8, 192), conv_flops(5, 192))
  add_module_stage("attn2", elic.SimpleAttention(dtype=bf16),
                   (B, H // 16, W // 16, 320), attn_flops(320))
  # Hyper-analysis (HyperAnalysis: conv k3s1, k5s2, k5s2 at 320ch).
  from shallow_ntc_tpu.models import transforms as transforms_lib

  add_module_stage("hyper_analysis",
                   transforms_lib.HyperAnalysis(bottleneck_size=320,
                                                dtype=bf16),
                   (B, H // 16, W // 16, 320),
                   lambda out: 0)  # small; traffic-dominated

  records = []
  total_ms = 0.0
  for name, fn, x0, meta in stages:
    t = loop_marginal_time(fn, x0)
    ms = t * 1e3
    total_ms += ms
    gb = meta["min_bytes"] / 1e9
    rec = dict(
        stage=name, ms=round(ms, 3), min_GB=round(gb, 4),
        achieved_GBps=round(gb / t, 1),
        pct_peak_bw=round(100 * gb / t / PEAK_HBM_GBPS, 1),
        GFLOP=round(meta.get("flops", 0) / 1e9, 2),
        pct_peak_flops=round(
            100 * meta.get("flops", 0) / t / 1e12 / PEAK_BF16_TFLOPS, 1),
    )
    if "unfused_bytes" in meta:
      rec["unfused_GB"] = round(meta["unfused_bytes"] / 1e9, 4)
    records.append(rec)
    print(rec, flush=True)

  out = dict(batch=B, height=H, width=W, dtype="bfloat16",
             peak_hbm_GBps=PEAK_HBM_GBPS, peak_bf16_TFLOPS=PEAK_BF16_TFLOPS,
             sum_stage_ms=round(total_ms, 2),
             Mpx_per_s_stage_sum=round(B * H * W / (total_ms / 1e3) / 1e6, 1),
             stages=records)
  os.makedirs(os.path.dirname(args.out), exist_ok=True)
  with open(args.out, "w") as f:
    json.dump(out, f, indent=2)
  print(json.dumps({k: v for k, v in out.items() if k != "stages"}))


if __name__ == "__main__":
  main()
