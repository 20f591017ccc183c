#!/usr/bin/env python
"""Extended benchmark suite (bench.py stays single-metric for the driver).

Measures, on the current default device (TPU chip):
  * decode throughput (hyper-synthesis + synthesis), two_layer_syn flagship
  * encode throughput (ELIC analysis + hyper-analysis)
  * training step rate, flagship config, batch 8 @ 256x256
  * SGA itinf optimization step rate (jitted lax.scan), one Kodak-size image
  * host rANS encode/decode throughput (C++, single core)

Writes results/bench_suite.json and prints it.

Usage: python scripts/bench_suite.py [--fast]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def loop_marginal_time(stage_fn, x, n_lo=8, n_hi=32):
  """Marginal seconds/call via a chained on-device fori_loop + value fetch.

  The only reliable methodology on this tunnel (PERF_NOTES.md):
  block_until_ready can return early, single fetches pay ~25ms, and repeated
  identical dispatches can be runtime-cached.
  """
  import jax
  import jax.numpy as jnp

  def mkloop(n):
    def loop(v):
      def body(i, chk):
        out = stage_fn(v + (chk * 1e-20).astype(v.dtype))
        return sum(jnp.sum(o, dtype=jnp.float32) for o in jax.tree_util.tree_leaves(out))

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
  parser = argparse.ArgumentParser()
  parser.add_argument("--fast", action="store_true")
  args = parser.parse_args()

  import jax
  import jax.numpy as jnp

  from shallow_ntc_tpu import train_lib
  from shallow_ntc_tpu.utils.jax_setup import setup_jax

  setup_jax(matmul_precision=None)
  results = {
      "device": jax.devices()[0].device_kind,
      "matmul_precision": "default (bf16 passes; also the train CLI default"
                          " -- see PERF_NOTES.md precision study)",
  }
  rng = np.random.default_rng(0)
  iters = 8 if args.fast else 16

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

  # --- decode / encode throughput (bf16) ---------------------------------
  from shallow_ntc_tpu.models import mshyper as mshyper_models

  model_bf16 = mshyper_models.Model(dtype=jnp.bfloat16, **flagship)
  cls = type(model_bf16)
  x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
  params = model_bf16.init(jax.random.PRNGKey(0), x0, training=False, rng=None, step=0)["params"]
  params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)

  B, h, w = 8, 512, 768

  y_hat = jnp.asarray(rng.integers(-8, 8, (B, h // 16, w // 16, 320)), jnp.bfloat16)
  z_hat = jnp.asarray(rng.integers(-8, 8, (B, h // 64, w // 64, 320)), jnp.bfloat16)

  def decode(y):
    mu, idx = model_bf16.apply(
        {"params": params}, z_hat + jnp.sum(y, dtype=jnp.bfloat16) * 1e-20,
        method=cls.hyper_synthesize,
    )
    rec = model_bf16.apply({"params": params}, y, method=cls.synthesize)
    return rec, mu, idx

  t = loop_marginal_time(decode, y_hat)
  results["decode_Mpx_per_s"] = round(B * h * w / t / 1e6, 1)

  # int8 decode variants (ops/int8ops.py). Quality cost is measured per
  # checkpoint in results/int8_quality.json (syn: rate bit-identical,
  # PSNR -0.08 dB); this records the speed side of that trade.
  for int8_mode in ("syn", "all"):
    os.environ["SNTC_INT8_DECODE"] = int8_mode

    def decode_int8(y):
      mu, idx = model_bf16.apply(
          {"params": params}, z_hat + jnp.sum(y, dtype=jnp.bfloat16) * 1e-20,
          method=cls.hyper_synthesize,
      )
      rec = model_bf16.apply({"params": params}, y, method=cls.synthesize)
      return rec, mu, idx

    t = loop_marginal_time(decode_int8, y_hat)
    results[f"decode_int8_{int8_mode}_Mpx_per_s"] = round(B * h * w / t / 1e6, 1)
  os.environ.pop("SNTC_INT8_DECODE", None)

  x_img = jnp.asarray(rng.uniform(-0.5, 0.5, (B, h, w, 3)), jnp.bfloat16)

  def encode(x):
    latents = model_bf16.apply({"params": params}, x, method=cls.infer_latent_rvs)
    return latents.uq[0].loc, latents.uq[1].loc

  t = loop_marginal_time(encode, x_img, n_lo=4, n_hi=16)
  results["encode_Mpx_per_s"] = round(B * h * w / t / 1e6, 1)

  os.environ["SNTC_INT8_ENCODE"] = "1"

  def encode_int8(x):
    latents = model_bf16.apply({"params": params}, x, method=cls.infer_latent_rvs)
    return latents.uq[0].loc, latents.uq[1].loc

  t = loop_marginal_time(encode_int8, x_img, n_lo=4, n_hi=16)
  results["encode_int8_Mpx_per_s"] = round(B * h * w / t / 1e6, 1)
  os.environ.pop("SNTC_INT8_ENCODE", None)

  # --- training step rate (f32 params, default precision) ----------------
  model = mshyper_models.Model(**flagship)
  state, tx, lr_fn = train_lib.create_train_state(
      model, dict(learning_rate=1e-4, warmup_until=0.0, global_clipnorm=1.0),
      jax.random.PRNGKey(0), (256, 256, 3),
  )
  train_step = jax.jit(train_lib.make_train_step(model, tx, lr_fn))
  batches = [
      jnp.asarray(rng.uniform(-0.5, 0.5, (8, 256, 256, 3)), jnp.float32)
      for _ in range(4)
  ]
  state, m = train_step(state, batches[0])
  float(m["rd_loss"])  # force completion
  n = iters
  t0 = time.perf_counter()
  for i in range(n):
    state, metrics = train_step(state, batches[i % 4])
  # Steps chain through `state`, so fetching the LAST loss forces the whole
  # sequence to really execute (block_until_ready alone is insufficient on
  # this tunnel -- see PERF_NOTES.md).
  float(metrics["rd_loss"])
  dt = (time.perf_counter() - t0) / n
  results["train_steps_per_s_b8_256"] = round(1.0 / dt, 2)
  results["train_img_per_s"] = round(8.0 / dt, 1)

  # --- itinf (SGA) step rate ---------------------------------------------
  from shallow_ntc_tpu import itinf_lib

  itinf_model = mshyper_models.Model(
      latent_config={"uq": dict(method="sga", tau_r=5e-4, tau_ub=0.5, tau_t0=200)},
      offset_heuristic=False,
      **{k: v for k, v in flagship.items()},
  )
  init_fn, scan_fn, *_ = itinf_lib.make_itinf_functions(
      itinf_model, dict(learning_rate=5e-3, warmup_until=0.0), 3000
  )
  img = jnp.asarray(rng.uniform(-0.5, 0.5, (1, 512, 768, 3)), jnp.float32)
  latents, opt_state = jax.jit(init_fn)(params_f32 := state.params, img)
  scan_jit = jax.jit(scan_fn, static_argnames=("n_steps", "log_every"))
  def run_itinf(n_steps, key):
    out = scan_jit(params_f32, img, latents, opt_state, 0, n_steps=n_steps,
                   rng=jax.random.PRNGKey(key), log_every=300)
    # Fetch a latent value to force completion (see PERF_NOTES.md).
    return float(out[0].uq[0].loc.reshape(-1)[0])

  n_lo, n_hi = (50, 200) if args.fast else (100, 400)
  run_itinf(n_lo, 0)
  run_itinf(n_hi, 0)
  t0 = time.perf_counter(); run_itinf(n_lo, 1); t_lo = time.perf_counter() - t0
  t0 = time.perf_counter(); run_itinf(n_hi, 1); t_hi = time.perf_counter() - t0
  results["itinf_sga_steps_per_s_kodak"] = round((n_hi - n_lo) / (t_hi - t_lo), 1)

  # --- host rANS throughput ----------------------------------------------
  from shallow_ntc_tpu.codec import bindings, tables as tables_lib

  gt = tables_lib.build_gaussian_tables()
  n_sym = 1_000_000
  sym = rng.integers(-5, 6, n_sym).astype(np.int32)
  idx = np.full(n_sym, 30, np.int32)
  sym_local = sym - gt.kmin[30]
  t0 = time.perf_counter()
  blob = bindings.rans_encode(sym_local, idx, gt.tables)
  t_enc = time.perf_counter() - t0
  t0 = time.perf_counter()
  out = bindings.rans_decode(blob, idx, gt.tables)
  t_dec = time.perf_counter() - t0
  assert np.array_equal(out, sym_local)
  results["rans_encode_Msym_per_s"] = round(n_sym / t_enc / 1e6, 1)
  results["rans_decode_Msym_per_s"] = round(n_sym / t_dec / 1e6, 1)

  out_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "results", "bench_suite.json")
  with open(out_path, "w") as f:
    json.dump(results, f, indent=2)
  print(json.dumps(results, indent=2))


if __name__ == "__main__":
  main()
