"""Evaluation: checkpoint loading + per-image R-D metrics -> JSON results.

Port of /root/reference/common/eval_lib.py. The reference re-instantiates the
model by importing a snapshotted models.py (eval_lib.py:24-27); here models
are pure functions of their config, so `config.json` alone reconstructs the
model (the source snapshot saved by train_lib is provenance only).
"""

import glob
import os
from typing import Any, Dict, Iterable, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from absl import logging

from shallow_ntc_tpu import train_lib
from shallow_ntc_tpu.models import base as models_base
from shallow_ntc_tpu.utils import runname as runname_utils


def _deep_update(base: Dict, upd: Mapping) -> Dict:
  for k, v in upd.items():
    if isinstance(v, Mapping) and isinstance(base.get(k), dict):
      base[k] = _deep_update(base[k], v)
    else:
      base[k] = v
  return base


def infer_model_family(workdir: str, config: Mapping) -> str:
  """Family from config.json's model_family key, else the runname prefix."""
  if "model_family" in config:
    return config["model_family"]
  name = os.path.basename(os.path.normpath(workdir))
  for fam in ("mshyper", "factorized"):
    if fam in name:
      return fam
  # Heuristic: hyper transforms present or defaulted -> mshyper.
  return "mshyper"


def load_model_class(models_path: str):
  """Import a user-supplied model module and return its Model class.

  The reference's eval.py --models_path equivalent (eval.py:46-49): the
  module must define a flax `Model` class with the family method surface
  (end_to_end_frame_loss / infer_latent_rvs / ...).
  """
  import importlib.util

  spec = importlib.util.spec_from_file_location("_user_models", models_path)
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  return mod.Model


def load_latest_ckpt(
    workdir: str,
    model_family: Optional[str] = None,
    update_model_config: Optional[Mapping] = None,
    model_cls: Optional[type] = None,
    transforms_dtype=None,
) -> Tuple[Any, Any, Dict]:
  """Rebuild the model from <workdir>/config.json and restore latest params.

  Returns (model, params, config). Mirrors reference eval_lib.py:11-53,
  including the update_model_config override used by itinf (configs/itinf.py).
  `model_cls` overrides the family class (the --models_path path).
  `transforms_dtype` sets the computation dtype of the model's transforms
  (analysis/synthesis/hyper pair) only -- the entropy-model math stays f32;
  itinf uses bfloat16 here for the latency-bound SGA scan.
  """
  config = runname_utils.load_json(os.path.join(workdir, "config.json"))
  model_config = models_base.to_plain_dict(config["model_config"])
  # The restore target's opt_state must match what training SAVED, so the
  # abstract state is built with the checkpoint's original optimizer_config
  # even when update_model_config overrides it (e.g. itinf's optimizer).
  saved_optimizer_config = dict(model_config.get("optimizer_config", {}))
  if update_model_config:
    model_config = _deep_update(
        model_config, models_base.to_plain_dict(update_model_config)
    )
  if model_cls is not None:
    cfg = dict(model_config)
    cfg.pop("optimizer_config", None)
    cfg["offset_heuristic"] = models_base.effective_offset_heuristic(cfg)
    # --models_path classes may not take a dtype; only pass it when set.
    if transforms_dtype is not None:
      cfg["dtype"] = transforms_dtype
    model = model_cls(**cfg)
  else:
    family = model_family or infer_model_family(workdir, config)
    model, _ = train_lib.build_model_from_config(
        model_config, family, dtype=transforms_dtype)

  # Abstract restore target: no device compute / XLA compile needed to load.
  state = train_lib.create_abstract_state(model, saved_optimizer_config, (64, 64, 3))
  ckpt_dir = os.path.join(workdir, "train", "checkpoints")
  state = train_lib.restore_params_from_dir(ckpt_dir, state)
  config["model_config"] = model_config
  config["_restored_step"] = int(state.step)
  return model, state.params, config


def find_workdir_by_wid(experiment_dir: str, wid) -> str:
  """Locate the work-unit dir `wid=<wid>-*` (reference itinf_lib.py:167-174).

  Falls back to a sole un-prefixed workdir (runs launched without a
  scheduler have no wid= prefix). A workdir passed directly (it contains
  train/checkpoints itself) is returned as-is, mirroring
  train_lib.resolve_warm_start_dir."""
  matches = sorted(glob.glob(os.path.join(experiment_dir, f"wid={wid}-*")))
  if (not matches
      and not glob.glob(os.path.join(experiment_dir, "wid=*"))
      and os.path.isdir(os.path.join(experiment_dir, "train", "checkpoints"))):
    # The dir is itself a workdir (and holds no wid=* work units at all):
    # take the direct-workdir shortcut only in that unambiguous case.
    return experiment_dir
  if not matches:
    candidates = [
        d for d in sorted(glob.glob(os.path.join(experiment_dir, "*")))
        if os.path.isdir(os.path.join(d, "train", "checkpoints"))
    ]
    if len(candidates) == 1:
      logging.warning(
          "No wid=%s-* under %s; using the only workdir %s",
          wid, experiment_dir, candidates[0],
      )
      return candidates[0]
    raise FileNotFoundError(
        f"No work unit wid={wid} under {experiment_dir}"
    )
  return matches[0]


def load_latest_ckpt_from_experiment(
    experiment_dir: str,
    wid,
    model_family: Optional[str] = None,
    update_model_config: Optional[Mapping] = None,
    transforms_dtype=None,
):
  workdir = find_workdir_by_wid(experiment_dir, wid)
  return load_latest_ckpt(workdir, model_family, update_model_config,
                          transforms_dtype=transforms_dtype)


def evaluate_images(
    model, params, images: Iterable, lpips_fn=None, step=0, spatial_devices=1
):
  """Per-image eval generator (reference mshyper/models.py:415-433).

  `images` yields [1, H, W, 3] normalized arrays (or a [B, ...] array, which
  is split to singles). Yields one metrics dict per image.

  spatial_devices > 1 shards the image height over a 'spatial' mesh axis for
  very-high-resolution inputs; XLA SPMD inserts the conv halo exchanges
  (SURVEY.md section 2.8's sequence-parallel analogue; the reference handles
  large images only by per-image eval + padding).
  """
  for out, _ in _eval_generator(model, params, images, lpips_fn, step,
                                spatial_devices):
    yield out


def _eval_generator(model, params, images, lpips_fn, step, spatial_devices):
  model_cls = type(model)
  eval_fn = jax.jit(
      lambda p, x: model.apply(
          {"params": p}, x, training=False, rng=None, step=step,
          method=model_cls.end_to_end_frame_loss,
      )
  )
  mesh = None
  if spatial_devices > 1:
    from shallow_ntc_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh(
        spatial_devices, axis_names=("data", "spatial"),
        axis_sizes=(1, spatial_devices),
    )
    params = jax.device_put(jax.device_get(params), mesh_lib.replicated(mesh))

  if hasattr(images, "shape"):
    images = [images[i : i + 1] for i in range(images.shape[0])]
  for img in images:
    img = jnp.asarray(img)
    if img.ndim == 3:
      img = img[None]
    if mesh is not None:
      from shallow_ntc_tpu.parallel import mesh as mesh_lib

      img = jax.device_put(
          jax.device_get(img), mesh_lib.spatial_sharding(mesh)
      )
    _, metrics, rec = eval_fn(params, img)
    out = {k: float(v) for k, v in jax.device_get(metrics).items()}
    if lpips_fn is not None:
      img255 = models_base.floats_to_pixels(img, training=False)
      out["lpips"] = float(lpips_fn(img255, jnp.asarray(rec, jnp.float32)))
    yield out, tuple(img.shape)


def eval_workdir(
    workdir: str,
    eval_data,
    dataset_name: str,
    results_dir: str,
    skip_existing: bool = False,
    model_family: Optional[str] = None,
    lpips_fn=None,
    profile: bool = False,
    model_cls: Optional[type] = None,
    spatial_devices: int = 1,
) -> Optional[str]:
  """Evaluate a trained workdir on a dataset; dump a flat JSON list of
  per-image metrics (reference eval_lib.py:56-105). With profile=True,
  per-transform wall times are attached to each record (the reference's
  profile mode, mshyper/models.py:142-149 / eval.py:22)."""
  model, params, config = load_latest_ckpt(
      workdir, model_family, model_cls=model_cls
  )
  step = config.get("_restored_step", 0)

  wu_name = os.path.basename(os.path.normpath(workdir))
  xid = os.path.basename(os.path.dirname(os.path.normpath(workdir)))
  runname = wu_name.split("-", 1)[1] if wu_name.startswith("wid=") else wu_name
  results_name = f"{runname}-step={step}-xid={xid}.json"
  results_path = os.path.join(results_dir, results_name)
  if skip_existing and os.path.exists(results_path):
    logging.info("Skipping existing results %s", results_path)
    return results_path

  hparams = dict(runname_utils.parse_runname(wu_name))
  timing_cache: Dict[tuple, Dict[str, float]] = {}
  all_metrics: List[Dict] = []
  for instance_id, (metrics, img_shape) in enumerate(
      _eval_generator(model, params, eval_data, lpips_fn, step,
                      spatial_devices)
  ):
    record = dict(metrics)
    if profile:
      if img_shape not in timing_cache:
        from shallow_ntc_tpu.utils import profiling

        dummy = jnp.zeros(img_shape, jnp.float32)
        timing_cache[img_shape] = profiling.transform_timings(model, params, dummy)
      record.update(timing_cache[img_shape])
    record["instance_id"] = instance_id
    record.update(hparams)
    all_metrics.append(record)
    logging.info("img %d: %s", instance_id, record if profile else metrics)

  runname_utils.dump_json(all_metrics, results_path)
  logging.info("Wrote %s", results_path)
  return results_path
