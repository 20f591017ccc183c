"""Shared CLI machinery for the train/itinf entry points.

The reference has four nearly-identical CLI files (SURVEY.md section 2.1);
the flag handling lives here once and the family entry modules stay thin.
Flag surface parity: --config (ml_collections config file with dot
overrides), --hid (sweep index into get_hyper()), --experiments_dir.
"""

import importlib.util
import sys

import jax
from absl import app, flags, logging
from ml_collections import config_flags


def define_common_flags(default_experiments_dir: str):
  config_flags.DEFINE_config_file(
      "config", None, "Path to the hyperparameter configuration file.",
      lock_config=True,
  )
  flags.DEFINE_integer(
      "hid", None,
      "Index into the config's get_hyper() sweep (one work unit per entry).",
  )
  flags.DEFINE_string(
      "experiments_dir", default_experiments_dir, "Directory to store experiments."
  )
  flags.DEFINE_integer(
      "dp_devices", None,
      "Number of devices for data-parallel training (default: all).",
  )
  flags.DEFINE_string(
      "matmul_precision", "default",
      "jax default_matmul_precision for training. 'default' (bf16 passes, "
      "f32 accumulation) is ~3x faster on TPU than 'highest' (full f32) and "
      "costs a measured 0.026 dB / 0.3% rd_loss on a same-seed 10k-step "
      "pair (results/precision_study, PERF_NOTES.md) -- well inside the "
      "0.05 dB parity tolerance. Use 'highest' for exact-parity work.",
  )
  # Multi-host (pod slice / multi-process) bring-up: SURVEY section 2.8's
  # jax.distributed disposition. On TPU pod slices only --coordinator is
  # needed (process layout is auto-detected); CPU/manual bring-up also
  # passes --num_processes/--process_id.
  flags.DEFINE_string(
      "coordinator", None,
      "host:port of process 0; enables jax.distributed multi-host init.",
  )
  flags.DEFINE_integer("num_processes", None, "Total process count.")
  flags.DEFINE_integer("process_id", None, "This process's index.")


def load_config_module(config_filename: str):
  """Import the config script as a module (to reach get_cfg_str/get_hyper)."""
  spec = importlib.util.spec_from_file_location("_user_config", config_filename)
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  return mod


def resolve_config(FLAGS):
  """Apply the --hid sweep entry on top of the base config."""
  cfg = FLAGS.config
  config_filename = FLAGS["config"].config_filename
  with cfg.unlocked():
    cfg.config_filename = config_filename
  if FLAGS.hid is not None:
    mod = load_config_module(config_filename)
    hparam_cfg = mod.get_hyper()[FLAGS.hid]
    logging.info("hid=%d, overrides=%s", FLAGS.hid, hparam_cfg)
    with cfg.unlocked():
      cfg.update_from_flattened_dict(hparam_cfg)
  return cfg, config_filename


def get_runname(cfg, config_filename: str, family: str) -> str:
  mod = load_config_module(config_filename)
  return family + "-" + mod.get_cfg_str(cfg)


def make_mesh_from_flags(FLAGS):
  from shallow_ntc_tpu.parallel import mesh as mesh_lib

  n = FLAGS.dp_devices
  if n is None:
    n = len(jax.devices())
  if n <= 1:
    return None
  return mesh_lib.make_mesh(n)


def run_train_main(family: str):
  """Body of the train CLIs (reference mshyper/train.py:55-66)."""
  FLAGS = flags.FLAGS

  def main(argv):
    if len(argv) > 1:
      raise app.UsageError("Too many command-line arguments.")
    if FLAGS.coordinator:
      from shallow_ntc_tpu.parallel import distributed

      distributed.initialize(
          FLAGS.coordinator, FLAGS.num_processes, FLAGS.process_id)
    from shallow_ntc_tpu.ops import int8ops
    from shallow_ntc_tpu.utils.jax_setup import setup_jax

    int8ops.assert_training_safe()
    setup_jax(FLAGS.matmul_precision)
    cfg, config_filename = resolve_config(FLAGS)
    runname = get_runname(cfg, config_filename, family)
    from shallow_ntc_tpu import train_lib

    train_lib.train_and_eval(
        cfg,
        model_family=family,
        experiments_dir=FLAGS.experiments_dir,
        runname=runname,
        config_script=config_filename,
        mesh=make_mesh_from_flags(FLAGS),
    )

  flags.mark_flags_as_required(["config"])
  app.run(main)


def run_itinf_main(family: str):
  """Body of the itinf CLIs (reference mshyper/itinf.py:54-65)."""
  FLAGS = flags.FLAGS

  def main(argv):
    if len(argv) > 1:
      raise app.UsageError("Too many command-line arguments.")
    from shallow_ntc_tpu.ops import int8ops
    from shallow_ntc_tpu.utils.jax_setup import setup_jax

    int8ops.assert_training_safe()
    setup_jax(FLAGS.matmul_precision)
    cfg, config_filename = resolve_config(FLAGS)
    runname = get_runname(cfg, config_filename, family)
    from shallow_ntc_tpu import itinf_lib

    itinf_lib.itinf_eval(
        cfg,
        model_family=family,
        experiments_dir=FLAGS.experiments_dir,
        runname=runname,
        config_script=config_filename,
    )

  flags.mark_flags_as_required(["config"])
  app.run(main)
