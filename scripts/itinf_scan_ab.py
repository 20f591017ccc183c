#!/usr/bin/env python
"""A/B the SGA scan step: full metrics vs loss-only vs bf16 transforms.

Round-4 instrumentation for the wall-clock directive: the round-3 profile
put the step *pieces* at 1.745 ms (573 steps/s) but the real scan marginal
was ~4.3 ms (233 steps/s). This script measures where the gap lives by
building the SAME scan with pieces removed. Idle chip only.

  python scripts/itinf_scan_ab.py --workdir train_xms_rd/201b91d1/mshyper-lmbda=0.01-num_steps=30000
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
  p.add_argument("--batch", type=int, default=1)
  p.add_argument("--variants", default="full,nometrics,lastmetrics,bf16,bf16_nometrics")
  args = p.parse_args()

  import jax
  import jax.numpy as jnp

  from shallow_ntc_tpu.utils.jax_setup import setup_jax

  setup_jax(matmul_precision=None)
  print("device:", jax.devices()[0].device_kind, flush=True)

  from shallow_ntc_tpu import eval_lib, itinf_lib, train_lib

  upd = dict(
      latent_config=dict(
          uq=dict(method="sga", tau_r=5e-4, tau_ub=0.5, tau_t0=200)),
      scheduled_num_steps=3000,
      offset_heuristic=False,
  )
  opt_cfg = dict(learning_rate=5e-3, reduce_lr_after=0.9, reduce_lr_factor=0.1,
                 global_clipnorm=None, warmup_until=0.0)

  rng = np.random.default_rng(0)
  batch = jnp.asarray(
      rng.uniform(-0.5, 0.5, (args.batch, 512, 768, 3)), jnp.float32)
  key = jax.random.PRNGKey(0)

  def build(transforms_dtype, metrics_mode):
    model, params, _ = eval_lib.load_latest_ckpt(
        args.workdir, update_model_config=upd,
        transforms_dtype=transforms_dtype)
    tx, lr_fn = train_lib.make_optimizer(opt_cfg, 3000)
    model_cls = type(model)

    def init_fn(params, batch):
      latents = model.apply({"params": params}, batch,
                            method=model_cls.infer_latent_rvs)
      latents = jax.tree_util.tree_map(
          lambda a: a.astype(jnp.float32)
          if jnp.issubdtype(a.dtype, jnp.floating) else a, latents)
      return latents, tx.init(latents)

    offset = jax.jit(lambda p: model.apply(
        {"params": p}, method=model_cls.prior_quantization_offset))

    def loss_fn(latents, params, batch, rng_, step, off):
      loss, metrics, _ = model.apply(
          {"params": params}, batch, latents, training=True, rng=rng_,
          step=step, itinf=True, frozen_offset=off,
          method=model_cls.frame_loss_given_latent_rvs)
      return loss, metrics

    def scan_fn(params, batch, latents, opt_state, n_steps):
      off = offset.__wrapped__(params) if False else model.apply(
          {"params": params}, method=model_cls.prior_quantization_offset)

      def body(carry, i):
        latents, opt_state = carry
        step_rng = jax.random.fold_in(key, i)
        step = 1000 if metrics_mode == "statictau" else i
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(latents, params, batch, step_rng, step, off)
        updates, opt_state = tx.update(grads, opt_state, latents)
        latents = jax.tree_util.tree_map(lambda a, u: a + u, latents, updates)
        if metrics_mode == "full":
          out = metrics
        elif metrics_mode == "loss":
          out = loss
        else:  # none/statictau/fori: emit nothing per step
          out = ()
        return (latents, opt_state), out

      if metrics_mode == "fori":
        def fbody(i, carry):
          return body(carry, i)[0]
        latents, opt_state = jax.lax.fori_loop(
            0, n_steps, fbody, (latents, opt_state))
        seq = None
      elif metrics_mode.startswith("unroll"):
        # scan with an unrolled body: amortizes the while-loop region's
        # per-iteration cost (carry layout pinning / scheduling barriers)
        # that the pystep arm showed to be ~1 ms/step, while keeping the
        # ONE-dispatch-per-image property of the fused itinf path.
        (latents, opt_state), seq = jax.lax.scan(
            lambda c, i: (body(c, i)[0], ()),
            (latents, opt_state), jnp.arange(n_steps),
            unroll=int(metrics_mode[len("unroll"):]))
        seq = None
      elif metrics_mode == "pystep":
        raise AssertionError("pystep does not go through scan_fn")
      else:
        (latents, opt_state), seq = jax.lax.scan(
            body, (latents, opt_state), jnp.arange(n_steps))
      if seq is None or metrics_mode in ("none", "statictau"):
        # still need a fetched value with a data dependence on the result
        seq = jax.tree_util.tree_map(lambda a: jnp.sum(a.astype(jnp.float32)),
                                     latents.uq[1].loc)
      return latents, opt_state, seq

    latents, opt_state = jax.jit(init_fn)(params, batch)

    if metrics_mode == "pystep":
      # VERDICT r4 item 5 arm (a): the SAME composed step as the scan body,
      # jitted alone and chained from Python (dispatch pipelining hides the
      # tunnel RTT; ONE fetch at the end). If this matches the scan/fori
      # marginal, the lax loop construct is not the 1.7x factor -- the
      # round-3 sum-of-pieces (1.745 ms) was optimistic because isolated
      # pieces schedule with the whole chip to themselves.
      off_const = jax.jit(lambda p: model.apply(
          {"params": p}, method=model_cls.prior_quantization_offset))(params)

      @jax.jit
      def step_jit(latents, opt_state, i, off):
        step_rng = jax.random.fold_in(key, i)
        (loss, _), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(latents, params, batch, step_rng, i, off)
        updates, opt_state = tx.update(grads, opt_state, latents)
        latents = jax.tree_util.tree_map(lambda a, u: a + u, latents, updates)
        return latents, opt_state

      def run(n):
        lat, opt = latents, opt_state
        for i in range(n):
          lat, opt = step_jit(lat, opt, jnp.int32(i), off_const)
        return float(jnp.sum(lat.uq[1].loc, dtype=jnp.float32))

      return run

    scan_jit = jax.jit(scan_fn, static_argnames=("n_steps",))

    def run(n):
      lat, opt, seq = scan_jit(params, batch, latents, opt_state, n_steps=n)
      leaf = jax.tree_util.tree_leaves(seq)[0]
      return float(jnp.sum(leaf, dtype=jnp.float32) if leaf.ndim else leaf)

    return run

  variants = {
      "full": (None, "full"),
      "nometrics": (None, "none"),
      "lastmetrics": (None, "loss"),
      "bf16": (jnp.bfloat16, "full"),
      "bf16_nometrics": (jnp.bfloat16, "none"),
      "statictau": (None, "statictau"),
      "fori": (None, "fori"),
      "bf16_fori": (jnp.bfloat16, "fori"),
      "pystep": (None, "pystep"),
      "bf16_pystep": (jnp.bfloat16, "pystep"),
      "unroll4": (None, "unroll4"),
      "unroll8": (None, "unroll8"),
      "bf16_unroll8": (jnp.bfloat16, "unroll8"),
  }
  for name in args.variants.split(","):
    tdtype, mmode = variants[name]
    run = build(tdtype, mmode)
    run(64); run(256)  # compile both
    ts = {}
    for n in (64, 256):
      best = float("inf")
      for _ in range(3):
        t0 = time.perf_counter(); run(n)
        best = min(best, time.perf_counter() - t0)
      ts[n] = best
    per_step = (ts[256] - ts[64]) / 192
    print(f"{name:16s} {per_step*1e3:7.3f} ms/step -> {1.0/per_step:7.1f} steps/s",
          flush=True)


if __name__ == "__main__":
  main()
