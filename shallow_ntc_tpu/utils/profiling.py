"""Profiling: FLOP counting and wall-clock timing of jitted functions.

Replaces /root/reference/common/profile_utils.py:

  get_flops      <- tf.compat.v1.profiler on a frozen graph (:16-59); here
                    XLA's own compiled-cost analysis, which reflects what the
                    hardware will actually execute after fusion.
  with_timing    <- wall-clock wrapper (:62-77); here with block_until_ready
                    so async dispatch can't fake the numbers (the reference
                    README warns its graph-mode timings are unreliable).
  trace          <- jax.profiler-based TensorBoard trace context (the analogue
                    of the commented-out CLU Profile hook, train_lib.py:198).
"""

import contextlib
import time
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp


def get_flops(fn: Callable, *args, **kwargs) -> float:
  """FLOPs of `fn(*args)` as compiled by XLA for the current backend."""
  lowered = jax.jit(fn).lower(*args, **kwargs)
  analysis = lowered.compile().cost_analysis()
  return float(analysis.get("flops", 0.0))


def get_flops_per_pixel(fn: Callable, image_hw: Tuple[int, int], *args) -> float:
  return get_flops(fn, *args) / float(image_hw[0] * image_hw[1])


def with_timing(fn: Callable) -> Callable:
  """Wrap fn to return (result, wall_time_seconds), blocking on completion."""

  def timed(*args, **kwargs):
    t0 = time.perf_counter()
    result = fn(*args, **kwargs)
    jax.block_until_ready(result)
    return result, time.perf_counter() - t0

  return timed


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 2) -> float:
  """Median wall time per call of a jitted fn (seconds)."""
  for _ in range(warmup):
    jax.block_until_ready(fn(*args))
  times = []
  for _ in range(iters):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    times.append(time.perf_counter() - t0)
  times.sort()
  return times[len(times) // 2]


def transform_timings(model, params, x, iters: int = 5) -> Dict[str, float]:
  """Per-transform wall times (seconds) for one eval pass.

  The analogue of the reference's profile=True mode, which wrapped each
  transform in a timing decorator (mshyper/models.py:142-149). Each stage is
  timed as its own jitted call with block_until_ready.
  """
  cls = type(model)
  x = jnp.asarray(x)

  def analysis(p, v):
    return model.apply({"params": p}, v, method=cls.infer_latent_rvs)

  latents = analysis(params, x)
  out: Dict[str, float] = {}
  out["analysis_time"] = time_fn(jax.jit(analysis), params, x, iters=iters)

  if hasattr(cls, "hyper_synthesize"):
    z_hat = jnp.round(latents.uq[0].loc)

    def hyper_syn(p, v):
      return model.apply({"params": p}, v, method=cls.hyper_synthesize)

    out["hyper_synthesis_time"] = time_fn(
        jax.jit(hyper_syn), params, z_hat, iters=iters
    )
    y_loc = latents.uq[1].loc
  else:
    y_loc = latents.uq[0].loc

  def syn(p, v):
    return model.apply({"params": p}, v, method=cls.synthesize)

  out["synthesis_time"] = time_fn(
      jax.jit(syn), params, jnp.round(y_loc), iters=iters
  )
  return out


@contextlib.contextmanager
def trace(logdir: str):
  """jax.profiler TensorBoard trace around a code block."""
  jax.profiler.start_trace(logdir)
  try:
    yield
  finally:
    jax.profiler.stop_trace()
