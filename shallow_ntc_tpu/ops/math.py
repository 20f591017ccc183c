"""Bounding ops with compression-friendly gradients.

These replicate the semantics of tensorflow_compression's `lower_bound` /
`upper_bound` ops with the default "identity_if_towards" gradient: the gradient
is passed through iff it would push the (clipped) value back towards the
feasible region. The reference relies on these inside its entropy models
(e.g. scale-index clipping in tfc.LocationScaleIndexedEntropyModel; see
/root/reference/mshyper/models.py:246 and tfc continuous_indexed internals).

Implemented as jax.custom_vjp so XLA sees a plain max/min in the forward pass
(fusable on the VPU) while the backward pass keeps the useful gradient.
"""

import jax
import jax.numpy as jnp


@jax.custom_vjp
def lower_bound(x, bound):
  """max(x, bound) with identity-if-towards gradient."""
  return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
  return jnp.maximum(x, bound), (x, bound)


def _lower_bound_bwd(res, g):
  x, bound = res
  # Pass gradient iff x >= bound (unclipped) OR the gradient pushes x up
  # (towards the feasible region). `g < 0` increases x under gradient descent.
  pass_through = jnp.logical_or(x >= bound, g < 0)
  dx = jnp.where(pass_through, g, 0.0)
  return dx, None


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


@jax.custom_vjp
def upper_bound(x, bound):
  """min(x, bound) with identity-if-towards gradient."""
  return jnp.minimum(x, bound)


def _upper_bound_fwd(x, bound):
  return jnp.minimum(x, bound), (x, bound)


def _upper_bound_bwd(res, g):
  x, bound = res
  pass_through = jnp.logical_or(x <= bound, g > 0)
  dx = jnp.where(pass_through, g, 0.0)
  return dx, None


upper_bound.defvjp(_upper_bound_fwd, _upper_bound_bwd)
