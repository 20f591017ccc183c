"""Config: SGA iterative-inference encoding on a trained checkpoint.

Schema-compatible with /root/reference/mshyper/configs/itinf.py: point
warm_start_exp_dir at a training experiment dir; the sweep runs one SGA
encoding job per warm_start_wid to trace out an R-D curve.
"""

import ml_collections

NUM_WIDS = 7


def get_config():
  config = ml_collections.ConfigDict()
  config.model_family = "mshyper"

  config.data_config = dict(
      dataset="kodak_landscape",
      batchsize=1,  # >1 speeds SGA but requires equal image shapes
      patchsize=None,
  )
  config.train_eval_config = dict(
      num_steps=3000,
      # Segment length = eval_every_steps: each segment boundary pays a scan
      # dispatch, a log-buffer fetch, and a val pass over the remote-TPU
      # tunnel (~2x25 ms RPC floors + an MS-SSIM eval). Default = num_steps:
      # the whole optimization is ONE jitted scan whose logged metric rows
      # accumulate in the carry, fetched once, with a single final val pass
      # (PERF_NOTES.md "SGA itinf"). Lower it to recover the reference's
      # mid-run validation cadence. 300-step logging still gives 10 curve
      # points per 3000-step optimization.
      log_metrics_every_steps=300,
      eval_every_steps=3000,
      warm_start_exp_dir="project_dir/train_xms/my_xid",
      warm_start_wid=0,
      # Computation dtype for the frozen transforms inside the SGA scan
      # ("bfloat16" / "float32" / "none"); entropy math and the optimized
      # latents stay f32 either way. bf16 is quality-neutral for SGA
      # (Delta rd_loss <= 2.2e-4, itinf_dtype_ab/) and faster in the fused
      # scan; in stream mode (below) f32 measures fastest -- set
      # transforms_dtype="float32" for minimum single-image latency.
      transforms_dtype="bfloat16",
      # Dispatch shape for the no-mid-eval fast path: "fused" = the whole
      # optimization as ONE device program; "stream" = per-step dispatches
      # (async, one fetch) whose standalone step is ~1.5x faster than the
      # same body inside a lax loop region (scripts/itinf_scan_ab.py);
      # "auto" = stream for batchsize 1 (latency), fused otherwise
      # (throughput).
      step_dispatch="auto",
  )

  config.model_config = dict(
      # Unspecified settings are loaded from the checkpoint's config.json.
      scheduled_num_steps=config.train_eval_config["num_steps"],
      optimizer_config=dict(
          learning_rate=5e-3, reduce_lr_after=0.9, reduce_lr_factor=0.1,
          global_clipnorm=None, warmup_until=0.0,
      ),
      latent_config=dict(
          uq=dict(method="sga", tau_r=5e-4, tau_ub=0.5, tau_t0=200),
      ),
      offset_heuristic=False,  # set False if training used mixedq
  )
  return config


def get_cfg_str(config):
  from collections import OrderedDict

  from shallow_ntc_tpu.utils import runname

  d = OrderedDict()
  d["wwid"] = config.train_eval_config["warm_start_wid"]
  d["uq_method"] = config.model_config["latent_config"]["uq"]["method"]
  return runname.config_dict_to_str(d, skip_falsy=False)


def get_hyper():
  from shallow_ntc_tpu.utils import hyper

  return hyper.sweep("train_eval_config.warm_start_wid", list(range(NUM_WIDS)))
