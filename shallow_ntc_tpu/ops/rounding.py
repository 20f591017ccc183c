"""Differentiable quantization ops.

TPU-native (pure JAX) equivalents of the quantization primitives the reference
pulls from tensorflow_compression / its own SGA library:

  round_st      <- tfc.round_st (straight-through rounding; used by
                   UQLatentRV.quantize, /root/reference/common/latent_rvs_lib.py:77-78,
                   and the `mixedq` training branch, mshyper/models.py:259,283)
  soft_round    <- tfc.soft_round (latent_rvs_lib.py:111-114)
  sga_round     <- common/latent_rvs_utils.py:8-48 (Stochastic Gumbel Annealing,
                   Yang et al. 2020, "Improving Inference for Neural Image
                   Compression")
  sample_unoise <- additive U(-.5,.5) noise (latent_rvs_lib.py:104-107)
  quantize_eval <- hard round about an offset grid (latent_rvs_lib.py:95-102)

All functions are jit/vmap/scan-safe; randomness is explicit via jax PRNG keys
(the TPU-friendly, reproducible replacement for TF's stateful RNG).
"""

from typing import Optional

import jax
import jax.numpy as jnp


def round_st(x: jax.Array, offset: Optional[jax.Array] = None) -> jax.Array:
  """Straight-through rounding: forward rounds (about `offset`), grad is identity."""
  if offset is None:
    rounded = jnp.round(x)
  else:
    rounded = jnp.round(x - offset) + offset
  return x + jax.lax.stop_gradient(rounded - x)


def _soft_round_no_offset(x: jax.Array, alpha) -> jax.Array:
  # tfc.soft_round: s(x) = m + tanh(alpha * r) / (2 tanh(alpha/2)), with
  # m = floor(x) + .5 and r = x - m. alpha -> 0 gives identity, alpha -> inf round.
  alpha = jnp.asarray(alpha, dtype=x.dtype)
  # Guard tiny alpha (identity limit) to avoid 0/0.
  alpha_bounded = jnp.maximum(alpha, 1e-4)
  m = jnp.floor(x) + 0.5
  r = x - m
  z = jnp.tanh(alpha_bounded / 2.0) * 2.0
  y = m + jnp.tanh(alpha_bounded * r) / z
  return jnp.where(alpha < 1e-4, x, y)


def _apply_with_offset(op, x, offset):
  if offset is None:
    return op(x)
  return op(x - offset) + offset


def soft_round(x: jax.Array, alpha, offset: Optional[jax.Array] = None) -> jax.Array:
  """Differentiable approximation of rounding (optionally about an offset grid)."""
  return _apply_with_offset(lambda v: _soft_round_no_offset(v, alpha), x, offset)


def sample_unoise(rng: jax.Array, loc: jax.Array) -> jax.Array:
  """Additive uniform noise U(-.5, .5): the Balle-2017 proxy for quantization."""
  u = jax.random.uniform(rng, loc.shape, loc.dtype, minval=-0.5, maxval=0.5)
  return loc + u


def quantize_eval(loc: jax.Array, offset: Optional[jax.Array] = None) -> jax.Array:
  """Hard (non-straight-through) rounding about an offset grid: the eval-time sample."""
  return _apply_with_offset(jnp.round, loc, offset)


def _sga_round_no_offset(rng: jax.Array, mu: jax.Array, tau, epsilon: float = 1e-5):
  """One stochastic-Gumbel-annealing rounding sample.

  Mirrors /root/reference/common/latent_rvs_utils.py:8-37: the rounding
  direction (down to floor / up to ceil) is a relaxed one-hot categorical
  (Concrete) sample at temperature `tau` whose logits are
  -atanh(distance-to-grid)/tau; the returned value is the logits-weighted
  combination of floor and ceil, so tau -> 0 recovers hard rounding.
  """
  tau = jnp.asarray(tau, dtype=mu.dtype)
  mu_floor = jnp.floor(mu)
  mu_ceil = jnp.ceil(mu)
  # Distances to the two grid points, clipped into atanh's domain.
  d_floor = jnp.clip(mu - mu_floor, -1.0 + epsilon, 1.0 - epsilon)
  d_ceil = jnp.clip(mu_ceil - mu, -1.0 + epsilon, 1.0 - epsilon)
  # With two categories, RelaxedOneHotCategorical(tau, logits).sample()
  # == softmax((logits + G)/tau) collapses to a sigmoid of the logit
  # difference, and the difference of two i.i.d. Gumbels is a standard
  # Logistic draw -- so sample one logistic per element instead of two
  # gumbels and never materialize the stacked 2-category axis. Identical in
  # distribution to the reference sampler (latent_rvs_utils.py:19-37);
  # roughly halves the SGA sampling's elementwise + RNG work per itinf step.
  logit_diff = (jnp.arctanh(d_floor) - jnp.arctanh(d_ceil)) / tau
  logistic = jax.random.logistic(rng, mu.shape, dtype=mu.dtype)
  w_ceil = jax.nn.sigmoid((logit_diff + logistic) / tau)
  return mu_floor + (mu_ceil - mu_floor) * w_ceil


def sga_round(
    rng: jax.Array,
    mu: jax.Array,
    tau,
    offset: Optional[jax.Array] = None,
    epsilon: float = 1e-5,
) -> jax.Array:
  """SGA rounding, optionally to an integer grid shifted by `offset`."""
  return _apply_with_offset(
      lambda v: _sga_round_no_offset(rng, v, tau, epsilon), mu, offset
  )


def sga_schedule_at_step(t, r, ub, lb=1e-8, t0=200.0, scheme="exp"):
  """SGA temperature at step t, clipped to [lb, ub].

  Mirrors /root/reference/common/latent_rvs_utils.py:55-85 (both the 'exp'
  closed form the models consume, ub * exp(-r * (t - t0)), and the 'linear'
  cooling variant ub - r * (t - t0)). Safe to call with a traced step
  inside jit/scan; `scheme` must be static.
  """
  t = jnp.asarray(t, jnp.float32)
  if scheme == "exp":
    tau = ub * jnp.exp(-r * (t - t0))
  elif scheme == "linear":
    tau = -r * (t - t0) + ub
  else:
    raise NotImplementedError(f"unknown SGA schedule scheme {scheme!r}")
  return jnp.minimum(jnp.maximum(tau, lb), ub)
