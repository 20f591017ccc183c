"""Multi-host (multi-process) initialization and data plumbing.

SURVEY.md section 2.8 names the TPU-native disposition for scaling beyond one
host: `jax.distributed` + XLA collectives over ICI/DCN. This module wires it:

  * `initialize()` wraps jax.distributed.initialize; afterwards
    `jax.devices()` is the GLOBAL device list, so parallel.mesh.make_mesh
    builds a pod-slice-wide mesh with no further changes and jit inserts
    cross-host collectives (gradient all-reduce over DCN/ICI) automatically.
  * `shard_batches()` adapts a globally-seeded host data stream to the
    process-local portion of each batch; `mesh.put_batch`/`put_window`
    assemble the global array from the local shards via
    jax.make_array_from_process_local_data.
  * `is_primary()` gates workdir bookkeeping / metric writers to process 0.

Every host runs the identical training program: same config, same data seed
(so the global batch order is a pure function of the seed), same jitted
step. Each host decodes the full global batch and keeps its slice — exact
and simple; corpus-scale runs can move the slicing into the loader's path
list without changing the array plumbing.

The 2-process x 4-virtual-CPU-device integration test is
tests/test_multihost.py (gloo backend; no TPU pod needed).
"""

from typing import Iterator, Optional

import jax


def initialize(
    coordinator_address: str,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> None:
  """Join (or start) a multi-process JAX cluster.

  coordinator_address: "host:port" of process 0. num_processes/process_id
  may be omitted in environments JAX can auto-detect (TPU pod slices via
  the metadata server); both are required for manual/CPU bring-up.
  """
  kwargs = {}
  if num_processes is not None:
    kwargs["num_processes"] = num_processes
  if process_id is not None:
    kwargs["process_id"] = process_id
  if local_device_ids is not None:
    kwargs["local_device_ids"] = local_device_ids
  jax.distributed.initialize(coordinator_address=coordinator_address, **kwargs)


def is_multiprocess() -> bool:
  return jax.process_count() > 1


def is_primary() -> bool:
  """True on the process that owns bookkeeping (workdir files, writers)."""
  return jax.process_index() == 0


def local_batch_slice(global_batchsize: int):
  """This process's [start, stop) rows of a globally-seeded batch."""
  count = jax.process_count()
  if global_batchsize % count:
    raise ValueError(
        f"global batchsize {global_batchsize} not divisible by "
        f"process count {count}"
    )
  per = global_batchsize // count
  start = jax.process_index() * per
  return start, start + per


def shard_batches(batches: Iterator) -> Iterator:
  """Slice each globally-identical host batch to this process's rows.

  The data stream must be seeded identically on every process (the default:
  seeds are pure functions of the config), so every host sees the same
  global batch and keeps a disjoint slice of it.
  """
  if not is_multiprocess():
    yield from batches
    return
  for batch in batches:
    start, stop = local_batch_slice(batch.shape[0])
    yield batch[start:stop]
