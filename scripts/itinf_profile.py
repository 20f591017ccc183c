#!/usr/bin/env python
"""Component-level attribution of the SGA itinf step (VERDICT r2 item 3).

Times each piece of the itinf scan body with the marginal-time fori_loop
methodology (PERF_NOTES.md): the full value_and_grad, forward only, the
distortion branch (synthesis fwd+bwd), the y entropy branch, the z/hyper
branch, SGA sampling alone, and the Adam update. Run only on an idle chip.

  python scripts/itinf_profile.py [--batch 1] [--pieces full,vag,...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def marginal_time(fn, x, n_lo=32, n_hi=128):
  """Marginal sec/call of fn(i, x)->pytree via chained fori_loop + fetch."""
  import jax
  import jax.numpy as jnp

  def mkloop(n):
    def loop(v):
      def body(i, chk):
        out = fn(i, jax.tree_util.tree_map(
            lambda a: a + (chk * 1e-20).astype(a.dtype), v))
        return sum(jnp.sum(o, dtype=jnp.float32)
                   for o in jax.tree_util.tree_leaves(out))

      return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    return jax.jit(loop)

  f_lo, f_hi = mkloop(n_lo), mkloop(n_hi)
  float(f_lo(x)); float(f_hi(x))
  t_lo, t_hi = [], []
  for _ in range(2):
    t0 = time.perf_counter(); float(f_lo(x)); t_lo.append(time.perf_counter() - t0)
    t0 = time.perf_counter(); float(f_hi(x)); t_hi.append(time.perf_counter() - t0)
  return (min(t_hi) - min(t_lo)) / (n_hi - n_lo)


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--batch", type=int, default=1)
  p.add_argument("--size", type=int, nargs=2, default=(512, 768))
  p.add_argument("--cpu", action="store_true", help="smoke-test on host CPU")
  p.add_argument("--pieces", default="step,vag,fwd,syn,yent,zside,sample,adam")
  args = p.parse_args()

  import jax
  import jax.numpy as jnp

  from shallow_ntc_tpu.utils.jax_setup import setup_jax

  setup_jax(matmul_precision=None)
  if args.cpu:
    jax.config.update("jax_platforms", "cpu")
  print("device:", jax.devices()[0].device_kind)

  from shallow_ntc_tpu import itinf_lib, train_lib
  from shallow_ntc_tpu.models import base as models_base
  from shallow_ntc_tpu.models import mshyper as mshyper_models
  from shallow_ntc_tpu.ops import entropy, metrics_ops

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
  init_fn, scan_fn, *_ = itinf_lib.make_itinf_functions(model, opt_cfg, 3000)
  tx, _ = train_lib.make_optimizer(opt_cfg, 3000)

  rng = np.random.default_rng(0)
  batch = jnp.asarray(
      rng.uniform(-0.5, 0.5, (args.batch,) + tuple(args.size) + (3,)),
      jnp.float32)
  key = jax.random.PRNGKey(0)
  latents, opt_state = jax.jit(init_fn)(params, batch)
  z_rv, y_rv = latents.uq

  offset = jax.jit(lambda p: model.apply(
      {"params": p}, method=type(model).prior_quantization_offset))(params)
  uq_cfg = models_base.resolve_uq_config(model.latent_config, 1000, itinf=True)

  # Fixed mu/indexes for the isolated y-side measurement.
  def hyper_path(p, z_loc):
    z_hat = z_rv.replace(loc=z_loc).sample(
        jax.random.PRNGKey(1), True, offset=offset, **uq_cfg)
    return model.apply({"params": p}, z_hat,
                       method=type(model).hyper_synthesize)

  mu, indexes = jax.jit(hyper_path)(params, z_rv.loc)
  num_pixels = float(batch.shape[1] * batch.shape[2])

  def full_loss(lat, step_rng):
    loss, _, _ = model.apply(
        {"params": params}, batch, lat, training=True, rng=step_rng,
        step=1000, itinf=True, frozen_offset=offset,
        method=type(model).frame_loss_given_latent_rvs)
    return loss

  pieces = {}

  def piece_step(i, lat_and_opt):
    lat, opt = lat_and_opt
    step_rng = jax.random.fold_in(key, i)
    grads = jax.grad(full_loss)(lat, step_rng)
    updates, opt = tx.update(grads, opt, lat)
    lat = jax.tree_util.tree_map(lambda a, u: a + u, lat, updates)
    return lat, opt

  pieces["step"] = (piece_step, (latents, opt_state))

  def piece_vag(i, lat):
    return jax.grad(full_loss)(lat, jax.random.fold_in(key, i))

  pieces["vag"] = (piece_vag, latents)

  def piece_fwd(i, lat):
    return full_loss(lat, jax.random.fold_in(key, i))

  pieces["fwd"] = (piece_fwd, latents)

  def syn_mse(y_hat):
    rec = model.apply(
        {"params": params}, y_hat,
        method=lambda m, y: m._synthesis(y, training=True))
    rec = metrics_ops.unpad_images(rec, batch.shape)
    mse, _, _, _ = models_base.distortion_metrics(batch, rec, training=True)
    return mse

  def piece_syn(i, y_hat):
    del i
    return jax.grad(syn_mse)(y_hat)

  y_hat0 = y_rv.sample(jax.random.PRNGKey(2), True, offset=mu, **uq_cfg)
  pieces["syn"] = (piece_syn, y_hat0)

  def y_entropy(y_loc, step_rng):
    y_hat = y_rv.replace(loc=y_loc).sample(
        step_rng, True, offset=mu, **uq_cfg)
    bits = entropy.bits_from_log_prob(
        entropy.indexed_em_log_prob_centered(y_hat, indexes, mu))
    return jnp.mean(bits) / num_pixels

  def piece_yent(i, y_loc):
    return jax.grad(y_entropy)(y_loc, jax.random.fold_in(key, i))

  pieces["yent"] = (piece_yent, y_rv.loc)

  def z_side(z_loc, step_rng):
    z_hat = z_rv.replace(loc=z_loc).sample(
        step_rng, True, offset=offset, **uq_cfg)
    z_bits = entropy.bits_from_log_prob(
        model.apply({"params": params}, z_hat,
                    method=lambda m, z: m._prior.log_prob_noisy(z)))
    mu2, idx2 = model.apply({"params": params}, z_hat,
                            method=type(model).hyper_synthesize)
    # Pseudo-loss pulling grads through the hyper-synthesis like the real
    # loss does (mu enters the y bits and the y sample offset).
    return jnp.mean(z_bits) / num_pixels + 1e-6 * (
        jnp.sum(mu2 * y_rv.loc) + jnp.sum(idx2))

  def piece_zside(i, z_loc):
    return jax.grad(z_side)(z_loc, jax.random.fold_in(key, i))

  pieces["zside"] = (piece_zside, z_rv.loc)

  def piece_sample(i, locs):
    z_loc, y_loc = locs
    r = jax.random.fold_in(key, i)
    rz, ry = jax.random.split(r)
    return (
        z_rv.replace(loc=z_loc).sample(rz, True, offset=offset, **uq_cfg),
        y_rv.replace(loc=y_loc).sample(ry, True, offset=mu, **uq_cfg),
    )

  pieces["sample"] = (piece_sample, (z_rv.loc, y_rv.loc))

  grads0 = jax.jit(jax.grad(full_loss))(latents, jax.random.PRNGKey(3))

  def piece_adam(i, lat_and_opt):
    del i
    lat, opt = lat_and_opt
    updates, opt = tx.update(grads0, opt, lat)
    lat = jax.tree_util.tree_map(lambda a, u: a + u, lat, updates)
    return lat, opt

  pieces["adam"] = (piece_adam, (latents, opt_state))

  want = args.pieces.split(",")
  results = {}
  for name in want:
    fn, x = pieces[name]
    t = marginal_time(fn, x)
    results[name] = t * 1e3
    print(f"{name:8s} {t*1e3:7.3f} ms/call", flush=True)

  print({k: round(v, 3) for k, v in results.items()})


if __name__ == "__main__":
  main()
