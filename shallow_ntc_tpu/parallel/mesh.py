"""Mesh construction and sharding rules.

The reference has no model-level parallelism (SURVEY.md section 2.8: its only
parallelism is Slurm-array hyperparameter sweeps). The TPU-native framework
adds:

  * data parallelism: batch sharded over a 'data' mesh axis, params
    replicated; jit + NamedSharding let XLA insert the gradient all-reduce
    over ICI (no hand-written collectives needed for DP).
  * spatial parallelism (the image-codec analogue of sequence parallelism):
    for high-resolution inference the image H axis is sharded over a
    'spatial' mesh axis; XLA's SPMD partitioner inserts halo exchanges for
    the overlapping conv/deconv windows (k13s8, k16/18s16) automatically.

Sweep parallelism stays process-level (launch.py), exactly like the
reference's Slurm array-job model.
"""

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    axis_sizes: Optional[Tuple[int, ...]] = None,
    devices=None,
) -> Mesh:
  """Create a mesh over the first n devices. 1D 'data' mesh by default."""
  devices = list(devices if devices is not None else jax.devices())
  if n_devices is None:
    n_devices = len(devices)
  devices = devices[:n_devices]
  if axis_sizes is None:
    axis_sizes = (n_devices,) + (1,) * (len(axis_names) - 1)
  assert int(np.prod(axis_sizes)) == n_devices, (axis_sizes, n_devices)
  dev_array = np.asarray(devices).reshape(axis_sizes)
  return Mesh(dev_array, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
  """Shard the leading (batch) dim of [B, H, W, C] arrays."""
  return NamedSharding(mesh, P(axis))


def spatial_sharding(mesh: Mesh, data_axis="data", spatial_axis="spatial"):
  """Shard batch over 'data' and image height over 'spatial'.

  XLA SPMD inserts halo exchanges for convolution windows that straddle the
  shard boundary, so the same model code runs unmodified.
  """
  return NamedSharding(mesh, P(data_axis, spatial_axis))


def _replicate_state(state, repl):
  """Replicate a host-resident pytree onto the mesh.

  Multi-host: device_put cannot target non-addressable shardings, but for a
  fully-replicated sharding every process holds the complete value, so
  make_array_from_process_local_data assembles it (all processes initialize
  identically from the same seed).
  """
  host = jax.device_get(state)
  if jax.process_count() > 1:
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(repl, np.asarray(x)),
        host)
  return jax.device_put(host, repl)


def shard_train_functions(mesh: Mesh, train_step, eval_step, state):
  """jit train/eval steps with DP shardings; returns (train, eval, state)."""
  repl = replicated(mesh)
  batch_sh = batch_sharding(mesh)
  state = _replicate_state(state, repl)
  train_jit = jax.jit(
      train_step, in_shardings=(repl, batch_sh), out_shardings=(repl, None),
      donate_argnums=(0,),
  )
  eval_jit = jax.jit(eval_step, in_shardings=(repl, batch_sh))
  return train_jit, eval_jit, state


def window_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
  """Shard the per-step batch dim of a [W, B, H, W, C] scan window."""
  return NamedSharding(mesh, P(None, axis))


def shard_window_functions(mesh: Mesh, window_step, eval_step, state):
  """jit a windowed (scan-of-steps) train fn + eval step with DP shardings.

  The window is [W, B, ...]: W consumed sequentially by lax.scan, B sharded
  over the 'data' axis; params replicated, gradient all-reduce inserted by
  XLA per scanned step.
  """
  repl = replicated(mesh)
  wsh = window_sharding(mesh)
  state = _replicate_state(state, repl)
  train_jit = jax.jit(
      window_step, in_shardings=(repl, wsh), out_shardings=(repl, None),
      donate_argnums=(0,),
  )
  eval_jit = jax.jit(eval_step, in_shardings=(repl, batch_sharding(mesh)))
  return train_jit, eval_jit, state


def _put_local_shard(local, sharding):
  """Assemble a global array from this process's batch rows (multi-host)."""
  return jax.make_array_from_process_local_data(sharding, local)


def put_window(window, mesh: Optional[Mesh]):
  """Transfer a [W, B, ...] window, per-step batch sharded over 'data'.

  In multi-process mode `window` holds only this process's batch rows
  (parallel.distributed.shard_batches); the global array is assembled from
  the per-process shards.
  """
  if mesh is None:
    return jax.device_put(window)
  sh = window_sharding(mesh)
  if jax.process_count() > 1:
    return _put_local_shard(window, sh)
  return jax.device_put(window, sh)


def put_batch(batch, mesh: Optional[Mesh]):
  """Transfer a host batch to device(s), sharded over 'data' if mesh given.

  Multi-process: `batch` is the process-local rows; see put_window.
  """
  if mesh is None:
    return jax.device_put(batch)
  sh = batch_sharding(mesh)
  if jax.process_count() > 1:
    return _put_local_shard(batch, sh)
  return jax.device_put(batch, sh)
