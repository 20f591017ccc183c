#!/usr/bin/env python
"""Recompute final itinf (SGA) eval metrics from saved itinf_vars.npz.

The SGA runs before the MS-SSIM precision fix (ops/metrics_ops.py: the
moment-filter convs now pin HIGHEST precision) logged corrupted msssim
values under --matmul_precision default (trajectories > 1.0, relu-collapsed
images). The optimized latents themselves are unaffected -- they were saved
per batch as itinf_vars.npz -- so the correct metrics are recoverable
without re-running the 3000-step optimizations: rebuild the model from the
warm-start checkpoint, reload the latents, and evaluate once at full
precision.

Rewrites <itinf_workdir>/metrics.json (the per-batch val list consumed by
itinf_to_results.py) and each batch_id=N/metrics.json val section in place.
Runs on host CPU; the chip is not needed for a single eval pass.

  python scripts/recompute_itinf_metrics.py --itinf_glob 'itinf_xms_rd24/*/*'
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--itinf_glob", required=True)
  p.add_argument("--tpu", action="store_true",
                 help="run on the default device instead of forcing CPU")
  args = p.parse_args()

  import jax

  if not args.tpu:
    jax.config.update("jax_platforms", "cpu")
  jax.config.update("jax_default_matmul_precision", "highest")

  import numpy as np

  from shallow_ntc_tpu import data as data_lib
  from shallow_ntc_tpu import eval_lib, itinf_lib, latents as latents_lib
  from shallow_ntc_tpu.models import base as models_base
  from shallow_ntc_tpu.utils import runname as runname_utils

  workdirs = sorted(
      d for d in glob.glob(args.itinf_glob)
      if os.path.isfile(os.path.join(d, "config.json"))
  )
  if not workdirs:
    raise SystemExit(f"no itinf workdirs match {args.itinf_glob!r}")

  for wd in workdirs:
    cfg = runname_utils.load_json(os.path.join(wd, "config.json"))
    te_cfg = dict(cfg["train_eval_config"])
    model_family = cfg.get("model_family", "mshyper")
    model, params, _ = eval_lib.load_latest_ckpt_from_experiment(
        te_cfg["warm_start_exp_dir"], te_cfg.get("warm_start_wid", 0),
        model_family=model_family,
        update_model_config=cfg.get("model_config"),
    )
    optimizer_config = dict(cfg.get("model_config", {}).get("optimizer_config", {}))
    num_steps = te_cfg.get("num_steps", 3000)
    _, _, eval_fn, *_ = itinf_lib.make_itinf_functions(
        model, optimizer_config, num_steps
    )
    eval_jit = jax.jit(eval_fn)

    data_cfg = dict(cfg["data_config"])
    dataset = data_lib.get_dataset(
        data_cfg["dataset"], "test", data_cfg["batchsize"],
        data_cfg.get("patchsize"),
    )

    all_metrics = []
    for batch_id, batch in enumerate(dataset):
      batch_dir = os.path.join(wd, f"batch_id={batch_id}")
      npz_path = os.path.join(batch_dir, "itinf_vars.npz")
      if not os.path.isfile(npz_path):
        print(f"{wd}: no itinf_vars for batch {batch_id}; stopping")
        break
      with np.load(npz_path) as z:
        locs = [z[f"uq_{i}_loc"] for i in range(len(z.files))]
      latents = latents_lib.LatentRVCollection(
          uq=tuple(latents_lib.UQLatentRV(loc=l) for l in locs)
      )
      val_m, _ = eval_jit(params, batch, latents, num_steps)
      val_m = {k: float(v) for k, v in jax.device_get(val_m).items()}
      mpath = os.path.join(batch_dir, "metrics.json")
      if os.path.isfile(mpath):
        per_batch = runname_utils.load_json(mpath)
        old = (per_batch.get("val") or {}).get("msssim")
        per_batch["val"] = val_m
        runname_utils.dump_json(per_batch, mpath)
        print(f"{wd} batch {batch_id}: msssim {old} -> {val_m['msssim']:.5f}")
      all_metrics.append({"batch_id": batch_id, **val_m})

    if all_metrics:
      runname_utils.dump_json(all_metrics, os.path.join(wd, "metrics.json"))


if __name__ == "__main__":
  main()
