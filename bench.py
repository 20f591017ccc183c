"""Decode-throughput benchmark: two_layer_syn decoder on one chip.

Measures the full decode-side compute of the flagship model (BASELINE.json):
hyper-synthesis (z_hat -> mu/sigma, the g_h ~30.4K FLOPs/px term) plus the
two-layer synthesis (y_hat -> image, g ~10.7K FLOPs/px), on Kodak-shaped
(512x768) images. The reference publishes no wall-clock numbers (BASELINE.md);
the north star is >= 2 Gpixel/s/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 2000 Mpixel/s (the north-star target).
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

NORTH_STAR_MPS = 2000.0  # 2 Gpixel/s in Mpixel/s


def build_decode_fn(dtype=jnp.bfloat16):
  """Jitted z_hat,y_hat -> reconstructed image for the flagship decoder."""
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
  params = variables["params"]

  def decode(params, z_hat, y_hat):
    mu, sigma = model.apply(
        {"params": params}, z_hat, method=type(model).hyper_synthesize
    )
    rec = model.apply({"params": params}, y_hat, method=type(model).synthesize)
    # mu/sigma feed the (host-side) entropy decoder; reduce over ALL elements
    # so XLA cannot dead-code-eliminate any part of the hyper-synthesis.
    return rec, jnp.sum(mu, dtype=jnp.float32), jnp.sum(sigma, dtype=jnp.float32)

  return model, params, jax.jit(decode)


def main():
  batch = int(os.environ.get("BENCH_BATCH", "8"))
  iters = int(os.environ.get("BENCH_ITERS", "20"))
  h, w = 512, 768  # Kodak landscape
  dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16" else jnp.float32

  model, params, decode = build_decode_fn(dtype)

  rng = np.random.default_rng(0)
  params = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)
  # Rotate over distinct inputs so runtime-level caching of identical calls
  # cannot fake the measurement.
  n_bufs = 8
  ys = [
      jnp.asarray(rng.integers(-8, 8, (batch, h // 16, w // 16, 320)), dtype)
      for _ in range(n_bufs)
  ]
  zs = [
      jnp.asarray(rng.integers(-8, 8, (batch, h // 64, w // 64, 320)), dtype)
      for _ in range(n_bufs)
  ]

  # Warmup / compile.
  jax.block_until_ready(decode(params, zs[0], ys[0]))

  times = []
  for _ in range(3):
    t0 = time.perf_counter()
    outs = [
        decode(params, zs[i % n_bufs], ys[i % n_bufs]) for i in range(iters)
    ]
    jax.block_until_ready(outs)
    times.append(time.perf_counter() - t0)
  dt = sorted(times)[1]  # median of 3 trials

  pixels = batch * h * w * iters
  mps = pixels / dt / 1e6
  print(
      json.dumps(
          {
              "metric": "decode_throughput_two_layer_syn_kodak",
              "value": round(mps, 2),
              "unit": "Mpixel/s/chip",
              "vs_baseline": round(mps / NORTH_STAR_MPS, 4),
          }
      )
  )


if __name__ == "__main__":
  main()
