"""Latent-variable abstraction for variational compression models.

JAX port of /root/reference/common/latent_rvs_lib.py. Latent RVs are pytree
dataclasses whose fields are the variational parameters; because pytrees ARE
the unit of differentiation in JAX, the reference's `get_trainable_copy`
machinery (latent_rvs_lib.py:46-56, wrapping params in tf.Variables for
iterative inference) is unnecessary: itinf simply takes grads w.r.t. the
latents pytree and optimizes it with optax inside a jitted lax.scan
(see shallow_ntc_tpu/itinf_lib.py).
"""

from typing import Any, Mapping, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from shallow_ntc_tpu.ops import rounding


class UQLatentRV(flax.struct.PyTreeNode):
  """A continuous latent expected to be uniformly quantized (latent_rvs_lib.py:59-116)."""

  loc: jax.Array

  @property
  def shape(self):
    return self.loc.shape

  def quantize(self, offset: Optional[jax.Array] = None) -> jax.Array:
    """Straight-through hard quantization (test-time value)."""
    return rounding.round_st(self.loc, offset=offset)

  def sample(
      self,
      rng: Optional[jax.Array],
      training: bool,
      method: Optional[str] = None,
      offset: Optional[jax.Array] = None,
      **kwargs,
  ) -> jax.Array:
    """Sample via the configured relaxation (latent_rvs_lib.py:81-116).

    training=False: hard round about `offset`.
    training=True: 'unoise' | 'sga' (needs kwargs['tau']) | 'soft_round'
    (needs kwargs['alpha']).
    """
    if not training:
      return rounding.quantize_eval(self.loc, offset)
    if method == "unoise":
      return rounding.sample_unoise(rng, self.loc)
    if method == "sga":
      return rounding.sga_round(rng, self.loc, tau=kwargs["tau"], offset=offset)
    if method == "soft_round":
      return rounding.soft_round(self.loc, alpha=kwargs["alpha"], offset=offset)
    raise NotImplementedError(f"Unknown sampling method: {method}")


class CategoricalLatentRV(flax.struct.PyTreeNode):
  """Placeholder mirroring the reference's empty stub (latent_rvs_lib.py:119-120)."""


class LatentRVCollection(flax.struct.PyTreeNode):
  """Container for a collection of latent rvs (latent_rvs_lib.py:130-166).

  Being a PyTreeNode, the collection is directly: differentiable (itinf takes
  grad w.r.t. it), optimizable (optax state over it), and shardable
  (jax.device_put with a NamedSharding).
  """

  uq: Tuple[UQLatentRV, ...] = ()
  categorical: Tuple[CategoricalLatentRV, ...] = ()

  def sample(
      self,
      rng: Optional[jax.Array],
      training: bool,
      latent_config: Mapping[str, Any] = flax.core.FrozenDict(),
  ):
    """Sample every rv with its per-kind config; returns a tuple per kind."""
    uq_cfg = dict(latent_config.get("uq", {}))
    rngs = (
        jax.random.split(rng, max(len(self.uq), 1))
        if rng is not None
        else [None] * len(self.uq)
    )
    uq_samples = tuple(
        rv.sample(k, training, **uq_cfg) for rv, k in zip(self.uq, rngs)
    )
    return uq_samples

  @property
  def locs(self):
    return tuple(rv.loc for rv in self.uq)
