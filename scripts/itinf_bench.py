#!/usr/bin/env python
"""SGA iterative-inference step-rate bench (VERDICT r2 item 3).

Measures optimization steps/s of the real itinf scan on a Kodak-sized image
against a trained (or randomly initialized) flagship checkpoint. Run only on
an idle host/chip.

  python scripts/itinf_bench.py [--workdir train_xms_rd/201b91d1/mshyper-...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--workdir", default=None)
  p.add_argument("--steps", type=int, default=1000)
  p.add_argument("--batch", type=int, default=1)
  p.add_argument("--rng_impl", default=None, choices=[None, "threefry2x32", "rbg"])
  args = p.parse_args()

  import jax
  import jax.numpy as jnp

  from shallow_ntc_tpu.utils.jax_setup import setup_jax

  setup_jax(matmul_precision=None)
  if args.rng_impl:
    jax.config.update("jax_default_prng_impl", args.rng_impl)
  print("device:", jax.devices()[0].device_kind, "rng:", args.rng_impl)

  from shallow_ntc_tpu import itinf_lib, train_lib

  if args.workdir:
    from shallow_ntc_tpu import eval_lib

    model, params, _ = eval_lib.load_latest_ckpt(
        args.workdir,
        update_model_config=dict(
            latent_config=dict(
                uq=dict(method="sga", tau_r=5e-4, tau_ub=0.5, tau_t0=200)),
            scheduled_num_steps=3000,
        ),
    )
  else:
    from shallow_ntc_tpu.models import mshyper as mshyper_models

    model = mshyper_models.Model(
        scheduled_num_steps=3000,
        rd_lambda=0.01,
        transform_config=dict(
            analysis=dict(cls="ElicAnalysis", channels=(192, 192, 192, 320)),
            synthesis=dict(
                cls="TwoLayerResSynthesis", channels=(12, 3), strides=(8, 2),
                kernel_sizes=(13, 5), activation_type="igdn", res_type="conv",
            ),
        ),
        latent_config=dict(
            uq=dict(method="sga", tau_r=5e-4, tau_ub=0.5, tau_t0=200)),
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32),
        training=False, rng=None, step=0)["params"]

  opt_cfg = dict(learning_rate=5e-3, reduce_lr_after=0.9, reduce_lr_factor=0.1,
                 global_clipnorm=None, warmup_until=0.0)
  init_fn, scan_fn, eval_fn, *_ = itinf_lib.make_itinf_functions(
      model, opt_cfg, args.steps)
  init_jit = jax.jit(init_fn)
  scan_jit = jax.jit(scan_fn, static_argnames=("n_steps", "log_every"))

  rng = np.random.default_rng(0)
  batch = jnp.asarray(
      rng.uniform(-0.5, 0.5, (args.batch, 512, 768, 3)), jnp.float32)
  key = jax.random.PRNGKey(0)
  latents, opt_state = init_jit(params, batch)

  def run(n):
    lat, opt, bufs = scan_jit(params, batch, latents, opt_state, 0,
                              n_steps=n, rng=key, log_every=300)
    return float(jnp.sum(bufs["rd_loss"][-1]))

  run(64)  # warm both loop lengths
  run(256)
  ts = {}
  for n in (64, 256):
    best = float("inf")
    for _ in range(2):
      t0 = time.perf_counter()
      run(n)
      best = min(best, time.perf_counter() - t0)
    ts[n] = best
  per_step = (ts[256] - ts[64]) / (256 - 64)
  rate = 1.0 / per_step
  print(f"marginal {per_step*1e3:.2f} ms/step -> {rate:.1f} steps/s "
        f"(batch {args.batch}; {rate*args.batch:.1f} image-steps/s)")


if __name__ == "__main__":
  main()
