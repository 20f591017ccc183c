"""Sweep launcher: fan out get_hyper() work units (reference: launch.py).

Modes:
  --backend slurm  render + submit an sbatch array job (one task per hid),
                   freezing a copy of the config at submit time;
  --backend local  run work units as local subprocesses, sequentially or with
                   --parallel N (useful on a single multi-chip host).

Example:
  ./launch.py --main shallow_ntc_tpu.mshyper.train \
      --config shallow_ntc_tpu/mshyper/configs/two_layer_syn.py
"""

import os
import shutil
import subprocess
import sys
import uuid

from absl import app, flags, logging

FLAGS = flags.FLAGS
flags.DEFINE_string("main", None, "Module to run, e.g. shallow_ntc_tpu.mshyper.train.")
flags.DEFINE_string("config", None, "Path to the config script with get_hyper().")
flags.DEFINE_string("backend", "local", "slurm | local")
flags.DEFINE_integer("parallel", 1, "Local backend: concurrent work units.")
flags.DEFINE_string("extra_args", "", "Extra flags forwarded to the main module.")
flags.DEFINE_string("gres", "tpu:1", "Slurm generic resource per task.")


def load_config_module(path):
  from shallow_ntc_tpu.utils.cli import load_config_module as _load

  return _load(path)


def main(argv):
  del argv
  from shallow_ntc_tpu import project_configs

  cfg_module = load_config_module(FLAGS.config)
  num_units = len(cfg_module.get_hyper())
  logging.info("Sweep has %d work units", num_units)

  # Freeze the config at submit time (reference launch.py:40-44).
  jobs_dir = project_configs.slurm_jobs_dir
  os.makedirs(jobs_dir, exist_ok=True)
  frozen = os.path.join(
      jobs_dir, f"{uuid.uuid4().hex[:8]}_{os.path.basename(FLAGS.config)}"
  )
  shutil.copy(FLAGS.config, frozen)

  base_cmd = (
      f"{sys.executable} -m {FLAGS.main} --config {frozen} {FLAGS.extra_args}"
  )

  if FLAGS.backend == "slurm":
    import slurm_template

    script = slurm_template.render(
        job_name=FLAGS.main.split(".")[-1],
        last_hid=num_units - 1,
        jobs_dir=jobs_dir,
        project_dir=project_configs.project_dir,
        srun_command=f"srun {base_cmd} --hid $SLURM_ARRAY_TASK_ID",
        gres=FLAGS.gres,
    )
    script_path = frozen.replace(".py", ".sbatch")
    with open(script_path, "w") as f:
      f.write(script)
    job_id = subprocess.check_output(
        ["sbatch", "--parsable", script_path]
    ).decode().strip()
    logging.info("Submitted sbatch job %s", job_id)
    # Symlink <jobid>_config.py for later lookup (reference launch.py:70).
    os.symlink(
        os.path.basename(frozen), os.path.join(jobs_dir, f"{job_id}_config.py")
    )
  elif FLAGS.backend == "local":
    procs = []
    xid = os.environ.get("SLURM_ARRAY_JOB_ID", uuid.uuid4().hex[:8])
    logging.info("Experiment id (xid): %s", xid)
    for hid in range(num_units):
      cmd = f"{base_cmd} --hid {hid}"
      logging.info("Launching: %s", cmd)
      env = dict(
          os.environ, SLURM_ARRAY_TASK_ID=str(hid), SLURM_ARRAY_JOB_ID=xid
      )
      procs.append(subprocess.Popen(cmd.split(), env=env))
      while len([p for p in procs if p.poll() is None]) >= FLAGS.parallel:
        procs[0].wait()
    for p in procs:
      rc = p.wait()
      if rc:
        raise RuntimeError(f"Work unit failed with exit code {rc}")
  else:
    raise ValueError(FLAGS.backend)


if __name__ == "__main__":
  flags.mark_flags_as_required(["main", "config"])
  app.run(main)
