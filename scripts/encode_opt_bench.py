#!/usr/bin/env python
"""A/B bench for the encode path: XLA per-block ResidualBlocks vs the fused
Pallas RB-chain kernel (ops/pallas/rb_chain.py), plus per-stage attribution.

Run on the TPU only when the host/chip are otherwise idle (tunnel fetch
methodology from PERF_NOTES.md; numbers are garbage under load):

  python scripts/encode_opt_bench.py            # full A/B
  python scripts/encode_opt_bench.py --stages   # stage attribution only
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scripts.bench_suite import loop_marginal_time


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument("--stages", action="store_true")
  parser.add_argument("--batch", type=int, default=8)
  args = parser.parse_args()

  import jax
  import jax.numpy as jnp

  from shallow_ntc_tpu.utils.jax_setup import setup_jax

  setup_jax(matmul_precision=None)
  print("device:", jax.devices()[0].device_kind)

  from shallow_ntc_tpu.models import mshyper as mshyper_models

  flagship = dict(
      scheduled_num_steps=10_000,
      rd_lambda=0.01,
      transform_config=dict(
          analysis=dict(cls="ElicAnalysis", channels=(192, 192, 192, 320)),
          synthesis=dict(
              cls="TwoLayerResSynthesis", channels=(12, 3), strides=(8, 2),
              kernel_sizes=(13, 5), activation_type="igdn", res_type="conv",
          ),
      ),
  )
  model = mshyper_models.Model(dtype=jnp.bfloat16, **flagship)
  cls = type(model)
  rng = np.random.default_rng(0)
  x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
  params = model.init(
      jax.random.PRNGKey(0), x0, training=False, rng=None, step=0)["params"]
  params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)

  B, h, w = args.batch, 512, 768
  x_img = jnp.asarray(rng.uniform(-0.5, 0.5, (B, h, w, 3)), jnp.bfloat16)
  px = B * h * w

  def encode(x):
    latents = model.apply({"params": params}, x, method=cls.infer_latent_rvs)
    return latents.uq[0].loc, latents.uq[1].loc

  for fused in ("0", "1"):
    os.environ["SNTC_FUSED_RB_CHAIN"] = fused
    t = loop_marginal_time(encode, x_img)
    print(f"fused={fused}: encode {t*1e3:.2f} ms/batch{B} "
          f"= {px/t/1e6:.1f} Mpx/s")

  if args.stages:
    # Stage attribution with the fused path on: stage-1 chain alone.
    from shallow_ntc_tpu.ops.pallas import rb_chain

    os.environ["SNTC_FUSED_RB_CHAIN"] = "1"
    c = 192
    xs1 = jnp.asarray(rng.normal(0, 1, (B, h // 2, w // 2, c)), jnp.bfloat16)
    pr = np.random.default_rng(1)
    mk = lambda *s: jnp.asarray(pr.normal(0, 0.1, s), jnp.bfloat16)
    chain = tuple(
        (mk(c, c // 2), mk(c // 2), mk(3, 3, c // 2, c // 2), mk(c // 2),
         mk(c // 2, c), mk(c))
        for _ in range(3)
    )
    t = loop_marginal_time(lambda v: rb_chain.fused_rb_chain(v, chain), xs1)
    print(f"stage1 fused chain: {t*1e3:.2f} ms")
    t = loop_marginal_time(
        lambda v: rb_chain.dense_rb_chain(v, chain, jax.nn.relu), xs1)
    print(f"stage1 dense chain: {t*1e3:.2f} ms")


if __name__ == "__main__":
  main()
