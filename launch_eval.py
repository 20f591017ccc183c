"""Eval launcher: one job per trained workdir (reference: launch_eval.py).

Example:
  ./launch_eval.py --workdirs 'train_xms/*/wid=*' --dataset kodak
"""

import glob
import os
import subprocess
import sys
import uuid

from absl import app, flags, logging

FLAGS = flags.FLAGS
flags.DEFINE_string("workdirs", None, "Glob of workdirs to evaluate.")
flags.DEFINE_string("dataset", None, "Dataset to eval.")
flags.DEFINE_string("backend", "local", "slurm | local")
flags.DEFINE_string("extra_args", "", "Extra flags forwarded to eval.py.")
flags.DEFINE_string("gres", "tpu:1", "Slurm generic resource per task.")


def main(argv):
  del argv
  workdirs = sorted(glob.glob(FLAGS.workdirs))
  if not workdirs:
    raise RuntimeError(f"No workdirs match {FLAGS.workdirs!r}")
  logging.info("Evaluating %d workdirs", len(workdirs))

  for wd in workdirs:
    cmd = (
        f"{sys.executable} eval.py --workdir {wd} --dataset {FLAGS.dataset} "
        f"{FLAGS.extra_args}"
    )
    if FLAGS.backend == "slurm":
      from shallow_ntc_tpu import project_configs
      import slurm_template

      jobs_dir = project_configs.slurm_jobs_dir
      os.makedirs(jobs_dir, exist_ok=True)
      script = slurm_template.render(
          job_name="eval",
          last_hid=0,
          jobs_dir=jobs_dir,
          project_dir=project_configs.project_dir,
          srun_command=f"srun {cmd}",
          gres=FLAGS.gres,
      )
      path = os.path.join(jobs_dir, f"eval_{uuid.uuid4().hex[:8]}.sbatch")
      with open(path, "w") as f:
        f.write(script)
      subprocess.check_call(["sbatch", path])
    else:
      logging.info("Running: %s", cmd)
      subprocess.check_call(cmd.split())


if __name__ == "__main__":
  flags.mark_flags_as_required(["workdirs", "dataset"])
  app.run(main)
