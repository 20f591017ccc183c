"""Decode-throughput benchmark: two_layer_syn decoder on one chip.

Measures the full decode-side compute of the flagship model (BASELINE.json):
hyper-synthesis (z_hat -> mu/sigma, the g_h ~30.4K FLOPs/px term) plus the
two-layer synthesis (y_hat -> image, g ~10.7K FLOPs/px), on Kodak-shaped
(512x768) images. The reference publishes no wall-clock numbers (BASELINE.md);
the north star is >= 2 Gpixel/s/chip.

Methodology (see memory/axon notes): on this remote-TPU tunnel,
block_until_ready can return before execution finishes and single fetches pay
a ~25ms polling floor, so K decode iterations run inside ONE jitted
lax.fori_loop with a data-dependence chain (no hoisting possible), a single
scalar is fetched, and the *marginal* time between two loop lengths removes
the fixed overhead.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 2000 Mpixel/s (the north-star target).

`--repeat N` (or env BENCH_REPEAT=N) repeats the whole marginal measurement
N times and reports the MEAN as the headline value plus "std"/"min"/"max"/
"n" fields — single-shot numbers on this tunneled chip carry a few percent
of run-to-run noise (VERDICT r3 weak #3), so rounds should quote mean±std.
"""

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

NORTH_STAR_MPS = 2000.0  # 2 Gpixel/s in Mpixel/s


def build_model(dtype=jnp.bfloat16):
  from shallow_ntc_tpu.models import mshyper as mshyper_models

  model = mshyper_models.Model(
      scheduled_num_steps=1000,
      rd_lambda=0.01,
      transform_config=dict(
          analysis=dict(cls="ElicAnalysis", channels=(192, 192, 192, 320)),
          synthesis=dict(
              cls="TwoLayerResSynthesis", channels=(12, 3), strides=(8, 2),
              kernel_sizes=(13, 5), activation_type="igdn", res_type="conv",
          ),
      ),
      dtype=dtype,
  )
  rng = jax.random.PRNGKey(0)
  x = jnp.zeros((1, 64, 64, 3), jnp.float32)
  variables = model.init(rng, x, training=False, rng=None, step=0)
  params = jax.tree_util.tree_map(
      lambda a: a.astype(dtype), variables["params"]
  )
  return model, params


def build_decode_loop(model, params, batch, h, w, n_iters, dtype):
  """One jitted program: n_iters chained decodes, returns a checksum scalar."""
  cls = type(model)

  def decode(z_hat, y_hat):
    mu, idx = model.apply({"params": params}, z_hat, method=cls.hyper_synthesize)
    rec = model.apply({"params": params}, y_hat, method=cls.synthesize)
    return (
        jnp.sum(rec, dtype=jnp.float32)
        + jnp.sum(mu, dtype=jnp.float32)
        + jnp.sum(idx, dtype=jnp.float32)
    )

  def loop(z_hat, y_hat):
    def body(i, chk):
      # Chain the checksum into the inputs: every iteration depends on the
      # previous one, so XLA cannot hoist or elide any decode.
      eps = (chk * 1e-20).astype(dtype)
      return decode(z_hat + eps, y_hat + eps)

    return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))

  return jax.jit(loop)


def timed_loop(loop_fn, z_hat, y_hat, repeats=3):
  float(loop_fn(z_hat, y_hat))  # compile + warm
  best = float("inf")
  for _ in range(repeats):
    t0 = time.perf_counter()
    float(loop_fn(z_hat, y_hat))  # value fetch forces real completion
    best = min(best, time.perf_counter() - t0)
  return best


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument(
      "--repeat", type=int, default=int(os.environ.get("BENCH_REPEAT", "3")),
      help="Repeat the whole marginal measurement N times; report mean+-std.")
  args = parser.parse_args()

  batch = int(os.environ.get("BENCH_BATCH", "8"))
  h, w = 512, 768  # Kodak landscape
  dtype = (
      jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16"
      else jnp.float32
  )
  k_small = int(os.environ.get("BENCH_K_SMALL", "16"))
  k_large = int(os.environ.get("BENCH_K_LARGE", "64"))

  model, params = build_model(dtype)
  rng = np.random.default_rng(0)
  y_hat = jnp.asarray(rng.integers(-8, 8, (batch, h // 16, w // 16, 320)), dtype)
  z_hat = jnp.asarray(rng.integers(-8, 8, (batch, h // 64, w // 64, 320)), dtype)

  loop_small = build_decode_loop(model, params, batch, h, w, k_small, dtype)
  loop_large = build_decode_loop(model, params, batch, h, w, k_large, dtype)

  samples = []
  for _ in range(max(1, args.repeat)):
    t_small = timed_loop(loop_small, z_hat, y_hat)
    t_large = timed_loop(loop_large, z_hat, y_hat)
    marginal = (t_large - t_small) / (k_large - k_small)  # sec per decode
    samples.append(batch * h * w / marginal / 1e6)

  mps = float(np.mean(samples))
  record = {
      "metric": "decode_throughput_two_layer_syn_kodak",
      "value": round(mps, 2),
      "unit": "Mpixel/s/chip",
      "vs_baseline": round(mps / NORTH_STAR_MPS, 4),
  }
  if len(samples) > 1:
    record.update(
        std=round(float(np.std(samples, ddof=1)), 2),
        min=round(min(samples), 2),
        max=round(max(samples), 2),
        n=len(samples),
    )
  print(json.dumps(record))


if __name__ == "__main__":
  main()
