"""sbatch array-job template for sweep fan-out (reference: slurm_template.py).

Each array task is an independent work unit running one get_hyper() entry
(`--hid $SLURM_ARRAY_TASK_ID`) -- the reference's only parallelism model,
preserved here for cluster users. On TPU pods the same script shape works
with one task per host; in-process data parallelism over chips is handled by
the framework itself (shallow_ntc_tpu/parallel).
"""

template = """#!/bin/bash
#SBATCH --job-name={job_name}
#SBATCH --array=0-{last_hid}
#SBATCH --output={jobs_dir}/%A_%a.out
#SBATCH --nodes=1
#SBATCH --ntasks=1
#SBATCH --cpus-per-task=8
#SBATCH --mem=16G
{gres_line}

set -euo pipefail
echo "host: $(hostname); job: $SLURM_ARRAY_JOB_ID; task: $SLURM_ARRAY_TASK_ID"

cd {project_dir}
{srun_command}
"""


def render(job_name, last_hid, jobs_dir, project_dir, srun_command, gres="tpu:1"):
  gres_line = f"#SBATCH --gres={gres}" if gres else ""
  return template.format(
      job_name=job_name,
      last_hid=last_hid,
      jobs_dir=jobs_dir,
      project_dir=project_dir,
      srun_command=srun_command,
      gres_line=gres_line,
  )
