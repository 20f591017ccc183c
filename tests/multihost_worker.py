"""Worker process for the multi-host integration test (not a test module).

Each invocation is one JAX process of a 2-process CPU cluster (gloo
collectives, 4 virtual devices per process -> 8 global devices). It runs
real windowed train steps through train_lib.simple_train_eval_loop over a
global 8-device 'data' mesh and writes the final rd_loss for the test to
compare against a single-process 8-device run.

Usage: python tests/multihost_worker.py <process_id> <num_processes> \
           <coordinator_port> <workdir>
"""

import json
import os
import sys

# 8 global devices regardless of process count (must be set pre-jax-import).
_NPROCS = int(sys.argv[2])
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={8 // _NPROCS}"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
  pid, nprocs, port, workdir = (
      int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

  from shallow_ntc_tpu.parallel import distributed

  if nprocs > 1:
    distributed.initialize(f"127.0.0.1:{port}", nprocs, pid)
  assert jax.device_count() == 8, jax.device_count()

  import numpy as np

  from shallow_ntc_tpu import data as data_lib, train_lib
  from shallow_ntc_tpu.parallel import mesh as mesh_lib

  model_config = dict(
      scheduled_num_steps=20,
      rd_lambda=0.01,
      optimizer_config=dict(learning_rate=1e-3, warmup_until=0.0,
                            global_clipnorm=1.0),
      transform_config=dict(
          analysis=dict(cls="CNNAnalysis", channels_base=8, output_channels=12),
          synthesis=dict(cls="CNNSynthesis", channels_base=8),
      ),
      latent_config=dict(uq=dict(method="unoise")),
  )
  model, optimizer_config = train_lib.build_model_from_config(
      model_config, "factorized")

  train_iter = data_lib.get_dataset("synthetic", "train", 8, 64)
  val_iter_factory = lambda: data_lib.get_dataset("synthetic", "test", 8, 64)  # noqa: E731

  mesh = mesh_lib.make_mesh(8)
  state = train_lib.simple_train_eval_loop(
      dict(num_steps=20, log_metrics_every_steps=5, checkpoint_every_steps=20,
           eval_every_steps=20, max_validation_steps=1, steps_per_dispatch=5),
      workdir, model, optimizer_config, train_iter, val_iter_factory,
      input_shape=(64, 64, 3), mesh=mesh,
  )

  if pid == 0:
    with open(os.path.join(workdir, "train", "record.jsonl")) as f:
      records = [json.loads(line) for line in f]
    final = records[-1]
    psum = float(
        sum(np.asarray(x, np.float64).sum()
            for x in jax.tree_util.tree_leaves(jax.device_get(state.params))))
    out = dict(final_rd_loss=final["rd_loss"], step=final["step"],
               param_sum=psum)
    with open(os.path.join(workdir, "result.json"), "w") as f:
      json.dump(out, f)
    print("WORKER_OK", json.dumps(out), flush=True)


if __name__ == "__main__":
  main()
