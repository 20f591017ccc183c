#!/usr/bin/env python
"""Compile/time probe for the fused RB chain at one shape + row tile.

  python scripts/rb_chain_probe.py --rows 16 [--h 256 --w 384 --batch 8]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--rows", default="")
  p.add_argument("--h", type=int, default=256)
  p.add_argument("--w", type=int, default=384)
  p.add_argument("--batch", type=int, default=8)
  p.add_argument("--c", type=int, default=192)
  p.add_argument("--blocks", type=int, default=3)
  p.add_argument("--dense", action="store_true")
  args = p.parse_args()
  if args.rows:
    os.environ["SNTC_RB_ROWS"] = args.rows

  import jax
  import jax.numpy as jnp

  from shallow_ntc_tpu.utils.jax_setup import setup_jax

  setup_jax(matmul_precision=None)
  from scripts.bench_suite import loop_marginal_time
  from shallow_ntc_tpu.ops.pallas import rb_chain

  c = args.c
  rng = np.random.default_rng(0)
  x = jnp.asarray(
      rng.normal(0, 1, (args.batch, args.h, args.w, c)), jnp.bfloat16)
  pr = np.random.default_rng(1)
  mk = lambda *s: jnp.asarray(pr.normal(0, 0.1, s), jnp.bfloat16)
  chain = tuple(
      (mk(c, c // 2), mk(c // 2), mk(3, 3, c // 2, c // 2), mk(c // 2),
       mk(c // 2, c), mk(c))
      for _ in range(args.blocks)
  )
  if args.dense:
    fn = lambda v: rb_chain.dense_rb_chain(v, chain, jax.nn.relu)
    label = "dense"
  else:
    fn = lambda v: rb_chain.fused_rb_chain(v, chain)
    label = f"fused rows={os.environ.get('SNTC_RB_ROWS', 'auto')}"
  t = loop_marginal_time(fn, x)
  px = args.batch * args.h * args.w
  print(f"{label}: {t*1e3:.3f} ms ({px/t/1e6:.0f} Mpx-latent/s) "
        f"shape {x.shape}")


if __name__ == "__main__":
  main()
