"""Mean-scale hyperprior model (Minnen 2018), TPU-native.

Functional re-design of /root/reference/mshyper/models.py: the model is a flax
module whose methods are pure functions of (params, inputs, rng, step). The
three quantization-relaxation branches (unoise / mixedq / sga+soft_round,
reference models.py:253-291) are preserved branch-for-branch; entropy models
are the stateless functions in shallow_ntc_tpu/ops/entropy.py instead of
objects rebuilt per call.

Forward pass (two_layer_syn config; cf. SURVEY.md section 3.4):
  x -> pad -> ElicAnalysis -> y -> HyperAnalysis -> z
  z -> [side EM: deep-factorized prior] -> z_hat, bits(z)
  z_hat -> HyperSynthesis -> (mu, sigma); sigma = exp(.) as scale *index*
  y -> [main EM: 64-scale indexed noisy Gaussian, loc=mu] -> y_hat, bits(y)
  y_hat -> TwoLayerResSynthesis -> x_hat -> unpad
  rd_loss = bpp + scheduled_lambda * mse(255-scale)
"""

from typing import Any, Mapping, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from shallow_ntc_tpu.latents import LatentRVCollection, UQLatentRV
from shallow_ntc_tpu.models import base
from shallow_ntc_tpu.models.transforms import (
    build_transform,
    transform_output_depth,
)
from shallow_ntc_tpu.ops import entropy
from shallow_ntc_tpu.ops import metrics_ops

# Initialization dummy dim (reference mshyper/models.py:37); only used for
# parameter initialization shapes, never traced at runtime.
DUMMY_IMG_DIM = 64


class Model(nn.Module):
  """Mean-scale hyperprior model. Constructor args mirror the reference's
  model_config schema (mshyper/models.py:46-51) minus optimizer_config, which
  configures the optax optimizer in train_lib instead."""

  scheduled_num_steps: int = 1_500_000
  rd_lambda: float = 0.01
  offset_heuristic: bool = True
  transform_config: Mapping[str, Any] = base.EMPTY_DICT
  latent_config: Mapping[str, Any] = base.DEFAULT_LATENT_CONFIG
  dtype: Optional[Any] = None

  def setup(self):
    tc = base.to_plain_dict(self.transform_config)
    self._analysis = build_transform(tc["analysis"], dtype=self.dtype)
    self._synthesis = build_transform(tc["synthesis"], dtype=self.dtype)
    bottleneck_size = transform_output_depth(self._analysis)
    self._bottleneck_size = bottleneck_size

    if "hyper_analysis" in tc:
      ha_cfg = tc["hyper_analysis"]
    else:
      ha_cfg = dict(cls="HyperAnalysis", bottleneck_size=bottleneck_size)
    self._hyper_analysis = build_transform(ha_cfg, dtype=self.dtype)
    if "hyper_synthesis" in tc:
      hs_cfg = tc["hyper_synthesis"]
    else:
      hs_cfg = dict(cls="HyperSynthesis", bottleneck_size=bottleneck_size)
    self._hyper_synthesis = build_transform(hs_cfg, dtype=self.dtype)

    hyper_bottleneck = transform_output_depth(self._hyper_analysis)
    self._prior = entropy.DeepFactorizedPrior(channels=hyper_bottleneck)

  @property
  def downsample_factor(self) -> int:
    """Static total downsampling of analysis + hyper-analysis (ref :137-140)."""
    from shallow_ntc_tpu.models.transforms import config_scale_factor

    tc = base.to_plain_dict(self.transform_config)
    f = config_scale_factor(tc["analysis"])
    ha_cfg = tc.get("hyper_analysis", dict(cls="HyperAnalysis"))
    return f * config_scale_factor(ha_cfg)

  # --- inference path (reference models.py:212-232) -----------------------
  def infer_latent_rvs(self, x: jax.Array) -> LatentRVCollection:
    x = metrics_ops.pad_images(x, self.downsample_factor)
    y = self._analysis(x)
    z = self._hyper_analysis(y)
    return LatentRVCollection(uq=(UQLatentRV(loc=z), UQLatentRV(loc=y)))

  # --- decode-side helpers (exposed for the codec and the bench) ----------
  def hyper_synthesize(self, z_hat: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """z_hat -> (mu, scale_indexes); sigma made positive via exp (ref :274-276)."""
    from shallow_ntc_tpu.ops import int8ops

    if int8ops.hyper_exempt():
      # int8 'syn' mode: mu/sigma feed the entropy model, so the hyper
      # decoder stays float to keep the RATE bit-identical to the f32 path.
      with int8ops.force(False):
        out = self._hyper_synthesis(z_hat)
    else:
      out = self._hyper_synthesis(z_hat)
    mu, raw = jnp.split(out, 2, axis=-1)
    return mu, jnp.exp(raw)

  def synthesize(self, y_hat: jax.Array) -> jax.Array:
    return self._synthesis(y_hat, training=False)

  def prior_quantization_offset(self) -> Optional[jax.Array]:
    return self._prior.quantization_offset() if self.offset_heuristic else None

  def prior_log_prob_noisy(self, z: jax.Array) -> jax.Array:
    return self._prior.log_prob_noisy(z)

  # --- generative path + loss (reference models.py:234-359) ---------------
  def frame_loss_given_latent_rvs(
      self,
      image_batch: jax.Array,
      latent_rvs: LatentRVCollection,
      training: bool,
      rng: Optional[jax.Array] = None,
      step=0,
      itinf: bool = False,
      frozen_offset: Optional[jax.Array] = None,
  ):
    uq_cfg = base.resolve_uq_config(self.latent_config, step, itinf)
    uq_method = uq_cfg.get("method", "unoise")
    rng_z, rng_y = (
        jax.random.split(rng) if rng is not None else (None, None)
    )

    z_rv, y_rv = latent_rvs.uq
    # The offset-heuristic grid is a 60-iteration bisection over the prior
    # CDF -- a pure function of the prior params. During iterative inference
    # the params are FROZEN, so the caller precomputes it once per scan
    # segment (itinf_lib) instead of paying the sequential bisection chain
    # inside every SGA step; `frozen_offset` short-circuits the recompute.
    if frozen_offset is not None:
      z_offset = frozen_offset if self.offset_heuristic else None
    else:
      z_offset = self.prior_quantization_offset()

    # Side (hyper) entropy model -- three relaxation branches (ref :253-268).
    if uq_method == "unoise":
      z_hat, z_bits = entropy.batched_em_call(
          self._prior, z_rv.loc, training, rng_z, z_offset
      )
    elif uq_method == "mixedq":
      _, z_bits = entropy.batched_em_call(
          self._prior, z_rv.loc, training, rng_z, z_offset
      )
      z_hat = entropy.batched_em_quantize(z_rv.loc, z_offset)
    else:  # explicit sampling (sga / soft_round) for itinf
      z_hat = z_rv.sample(rng_z, training, offset=z_offset, **uq_cfg)
      z_bits = entropy.bits_from_log_prob(self._prior.log_prob_noisy(z_hat))

    mu, indexes = self.hyper_synthesize(z_hat)

    # Main (scale-indexed Gaussian) entropy model (ref :277-291).
    if uq_method == "unoise":
      y_hat, y_bits = entropy.indexed_em_call(
          y_rv.loc, indexes, mu, training, rng_y
      )
    elif uq_method == "mixedq":
      _, y_bits = entropy.indexed_em_call(
          y_rv.loc, indexes, mu, training, rng_y
      )
      y_hat = entropy.indexed_em_quantize(y_rv.loc, mu)
    else:
      y_hat = y_rv.sample(rng_y, training, offset=mu, **uq_cfg)
      # Center the sample before evaluating under the loc=0 prior (ref :288-291).
      y_bits = entropy.bits_from_log_prob(
          entropy.indexed_em_log_prob_centered(y_hat, indexes, mu)
      )

    reconstruction = self._synthesis(y_hat, training=training)
    reconstruction = metrics_ops.unpad_images(reconstruction, image_batch.shape)

    num_pixels = float(image_batch.shape[1] * image_batch.shape[2])
    bpp_terms = {
        "hyper_latent": jnp.mean(z_bits) / num_pixels,
        "latent": jnp.mean(y_bits) / num_pixels,
    }

    mse, psnr, extra, rec255 = base.distortion_metrics(
        image_batch, reconstruction, training
    )
    rd_loss, metrics = base.assemble_rd_loss(
        bpp_terms, mse, psnr, self.rd_lambda, step, self.scheduled_num_steps,
        itinf, uq_cfg, extra,
    )
    return rd_loss, metrics, rec255

  def end_to_end_frame_loss(
      self,
      image_batch: jax.Array,
      training: bool,
      rng: Optional[jax.Array] = None,
      step=0,
      itinf: bool = False,
  ):
    latent_rvs = self.infer_latent_rvs(image_batch)
    return self.frame_loss_given_latent_rvs(
        image_batch, latent_rvs, training, rng=rng, step=step, itinf=itinf
    )

  def __call__(self, image_batch, training=False, rng=None, step=0):
    """Default apply: end-to-end loss (used for parameter initialization)."""
    return self.end_to_end_frame_loss(image_batch, training, rng=rng, step=step)
