"""Shared model-family machinery: loss assembly, metrics, model factory.

The reference couples model, optimizer and step counter inside a tf.Module
(mshyper/models.py:45-109). TPU-native design splits these: models here are
pure flax modules exposing loss *functions* of (params, batch, rng, step);
the optimizer and step live in an explicit TrainState (train_lib.py). This
keeps every step a single jit-compiled XLA program and lets the same loss run
under lax.scan (SGA itinf) and data-parallel sharding unchanged.
"""

import math
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp

from shallow_ntc_tpu import schedule
from shallow_ntc_tpu.ops import metrics_ops
from shallow_ntc_tpu.ops import rounding

import flax.core

# Immutable mapping defaults (the reference used a vendored immutabledict for
# the same purpose, common/immutabledict; flax's FrozenDict is the JAX-native
# equivalent and is a legal frozen-dataclass default).
EMPTY_DICT: Mapping = flax.core.FrozenDict()
DEFAULT_LATENT_CONFIG: Mapping = flax.core.FrozenDict(
    {"uq": {"method": "unoise"}}
)


# --- pixel-domain conversion (reference: common/data_lib.py:24-52) ----------
def normalize_image(image):
  return image / 255.0 - 0.5


def unnormalize_image(x):
  return (x + 0.5) * 255.0


def floats_to_pixels(x, training: bool):
  """Map normalized floats back to [0, 255]; quantize to uint8 grid in eval."""
  x = unnormalize_image(x)
  if not training:
    x = metrics_ops.quantize_image(x).astype(jnp.float32)
  return x


def resolve_uq_config(latent_config: Mapping, step, itinf: bool = False) -> Dict:
  """Copy of latent_config['uq'] with the SGA temperature injected dynamically.

  Mirrors the reference's `latent_config` property (mshyper/models.py:187-210):
  for method='sga', tau = sga_schedule_at_step(step, r, ub, lb, t0).
  """
  cfg = dict(latent_config.get("uq", {"method": "unoise"}))
  if cfg.get("method", "unoise") == "sga":
    cfg["tau"] = rounding.sga_schedule_at_step(
        step,
        r=cfg["tau_r"],
        ub=cfg["tau_ub"],
        lb=cfg.get("tau_lb", 1e-8),
        t0=cfg["tau_t0"],
        scheme=cfg.get("tau_scheme", "exp"),
    )
    cfg.pop("tau_scheme", None)
  return cfg


def distortion_metrics(
    image_batch: jax.Array, reconstruction: jax.Array, training: bool
) -> Tuple[jax.Array, jax.Array, Dict[str, jax.Array], jax.Array]:
  """255-scale MSE/PSNR (+ MS-SSIM in eval), mirroring mshyper/models.py:312-332.

  Returns (mse, psnr, extra_metrics, reconstruction_255).
  """
  img255 = floats_to_pixels(image_batch, training)
  rec255 = floats_to_pixels(reconstruction, training)
  batch_mse, batch_psnr = metrics_ops.mse_psnr(img255, rec255)
  mse = jnp.mean(batch_mse)
  psnr = jnp.mean(batch_psnr)
  extra: Dict[str, jax.Array] = {}
  if not training:
    batch_msssim = metrics_ops.msssim_or_ssim(img255, rec255)
    extra["msssim"] = jnp.mean(batch_msssim)
    extra["msssim_db"] = jnp.mean(
        -10.0 * jnp.log(1.0 - batch_msssim) / math.log(10.0)
    )
  return mse, psnr, extra, rec255


def assemble_rd_loss(
    bpp_terms: Dict[str, jax.Array],
    mse: jax.Array,
    psnr: jax.Array,
    rd_lambda_value: float,
    step,
    scheduled_num_steps: int,
    itinf: bool,
    uq_cfg: Mapping,
    extra_metrics: Optional[Dict[str, jax.Array]] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
  """rd_loss = bpp + scheduled_lambda * mse, plus the reference's scalar set."""
  bpp = sum(bpp_terms.values())
  sched_lambda = schedule.scheduled_rd_lambda(
      rd_lambda_value, step, scheduled_num_steps, itinf=itinf
  )
  rd_loss = bpp + sched_lambda * mse
  metrics = {
      "rd_loss": rd_loss,
      "bpp": bpp,
      "mse": mse,
      "psnr": psnr,
      "sched_rd_lambda": sched_lambda,
  }
  metrics.update({f"{k}_bpp": v for k, v in bpp_terms.items() if len(bpp_terms) > 1})
  if uq_cfg.get("method") == "sga":
    metrics["tau"] = jnp.asarray(uq_cfg["tau"], jnp.float32)
  if extra_metrics:
    metrics.update(extra_metrics)
  return rd_loss, metrics


def effective_offset_heuristic(model_config: Mapping) -> bool:
  """mixedq training disables the offset heuristic (mshyper/models.py:69-76)."""
  offset_heuristic = model_config.get("offset_heuristic", True)
  uq_method = (
      model_config.get("latent_config", DEFAULT_LATENT_CONFIG)
      .get("uq", {})
      .get("method", "unoise")
  )
  if uq_method == "mixedq" and offset_heuristic:
    import logging

    logging.warning(
        "modifying offset_heuristic from True to False, as it doesn't make "
        "sense for mixedq training."
    )
    return False
  return offset_heuristic


def to_plain_dict(cfg: Any) -> Any:
  """Recursively convert ml_collections ConfigDicts / FrozenDicts to dicts."""
  if hasattr(cfg, "to_dict"):
    cfg = cfg.to_dict()
  if hasattr(cfg, "unfreeze"):
    cfg = cfg.unfreeze()
  if isinstance(cfg, Mapping):
    return {k: to_plain_dict(v) for k, v in cfg.items()}
  return cfg
