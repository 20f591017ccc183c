"""Iterative inference (SGA encoding) as a jitted on-device scan.

TPU-native re-design of /root/reference/common/itinf_lib.py. The reference
runs 3000 Python-side optimizer steps per batch, each a tf.function call
(itinf_lib.py:48-67). Here the whole SGA optimization is ONE jitted call:
per logging segment a metric-free jax.lax.fori_loop over the latents pytree
(optax.adam updates on device, SGA temperature computed from the traced
step index, the aux metrics dead-code-eliminated) plus a single
metric-keeping step that fills that segment's log row -- zero host
round-trips inside the hot loop and one small log-buffer fetch per call.
Optional eval segments restore the reference's mid-run validation cadence
(itinf_lib.py:69-86).
"""

import functools
import os
from typing import Any, Dict, Mapping, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from absl import logging

from shallow_ntc_tpu import train_lib
from shallow_ntc_tpu.models import base as models_base
from shallow_ntc_tpu.utils import runname as runname_utils
from shallow_ntc_tpu.utils import writers as writers_lib


def make_itinf_functions(model, optimizer_config, num_steps: int):
  """Build (init_fn, scan_fn, eval_fn) for SGA optimization of latents.

  init_fn(params, batch, rng)         -> (latents, opt_state)
  scan_fn(params, batch, latents, opt_state, start_step, n, rng, log_every)
                                       -> (latents, opt_state, log_bufs)
  eval_fn(params, batch, latents, step)-> metrics dict (training=False)

  log_bufs is a dict of [ceil(n/log_every)]-shaped buffers: the metric rows
  at logging steps, produced on device inside the one jitted call so one
  small fetch per call replaces a per-step [n]-shaped stacked output. On
  the tunneled chip every extra fetch costs a ~25 ms polling floor, and
  the wall-clock target (VERDICT r3 item 1) is set by how little the host
  touches the device between loop start and finish.
  """
  tx, lr_fn = train_lib.make_optimizer(optimizer_config, num_steps)
  model_cls = type(model)

  def init_fn(params, batch):
    latents = model.apply(
        {"params": params}, batch, method=model_cls.infer_latent_rvs
    )
    # The optimized variables (and hence Adam state) stay f32 even when the
    # model's transforms compute in bfloat16 (configs/itinf.py
    # transforms_dtype): reduced precision is a computation dtype for the
    # frozen convs, not a storage dtype for the latents being optimized.
    latents = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32) if jnp.issubdtype(a.dtype, jnp.floating)
        else a, latents)
    return latents, tx.init(latents)

  def frozen_offset_fn(params):
    """The offset-heuristic grid (a 60-iteration CDF bisection) is a pure
    function of the FROZEN prior params: compute it once per jitted scan
    call instead of inside every SGA step (it otherwise dominates the step:
    a sequential chain of tiny per-channel matmuls that XLA cannot hoist
    out of the scan body)."""
    return model.apply(
        {"params": params}, method=model_cls.prior_quantization_offset
    )

  def loss_fn(latents, params, batch, rng, step, offset):
    loss, metrics, _ = model.apply(
        {"params": params},
        batch,
        latents,
        training=True,
        rng=rng,
        step=step,
        itinf=True,
        frozen_offset=offset,
        method=model_cls.frame_loss_given_latent_rvs,
    )
    return loss, metrics

  def scan_fn(params, batch, latents, opt_state, start_step, n_steps, rng,
              log_every, offset=None):
    if offset is None:
      offset = frozen_offset_fn(params)

    def step_metrics(latents, opt_state, step, rng):
      step_rng = jax.random.fold_in(rng, step)
      (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
          latents, params, batch, step_rng, step, offset
      )
      updates, opt_state = tx.update(grads, opt_state, latents)
      latents = jax.tree_util.tree_map(
          lambda p, u: p + u, latents, updates
      )
      metrics["scheduled_lr"] = lr_fn(step)
      return latents, opt_state, metrics

    keys = sorted(jax.eval_shape(
        step_metrics, latents, opt_state, start_step, rng)[2])

    def fbody(step, carry):
      # Metric-free step: the aux metrics are dead here, so XLA removes
      # their computation entirely. Measured on the real checkpoint, a
      # fori_loop of these runs ~2-3x faster per step than ANY lax.scan
      # variant of the same body (scripts/itinf_scan_ab.py), so the hot
      # loop must never touch the log row.
      latents, opt_state = carry
      latents, opt_state, _ = step_metrics(latents, opt_state, step, rng)
      return (latents, opt_state)

    # Row r logs the metrics of step (r+1)*log_every - 1 (the final step
    # always lands in the last row, so row [-1] is the converged metrics
    # even when log_every does not divide n_steps). Each segment is a
    # fori_loop of metric-free steps plus ONE step that keeps its metrics:
    # the trajectory (step indices, per-step rngs, update order) is
    # identical to a single flat loop; metrics cost one segment step each.
    rows = []
    pos = 0
    while pos < n_steps:
      seg_end = min(pos + log_every, n_steps)
      latents, opt_state = jax.lax.fori_loop(
          start_step + pos, start_step + seg_end - 1, fbody,
          (latents, opt_state))
      latents, opt_state, metrics = step_metrics(
          latents, opt_state, start_step + seg_end - 1, rng)
      rows.append(jnp.stack([metrics[k].astype(jnp.float32) for k in keys]))
      pos = seg_end
    bufs = jnp.stack(rows)
    return latents, opt_state, {k: bufs[:, j] for j, k in enumerate(keys)}

  def eval_fn(params, batch, latents, step, offset=None):
    _, metrics, rec = model.apply(
        {"params": params},
        batch,
        latents,
        training=False,
        rng=None,
        step=step,
        itinf=True,
        frozen_offset=(frozen_offset_fn(params) if offset is None else offset),
        method=model_cls.frame_loss_given_latent_rvs,
    )
    return metrics, rec

  def run_fn(params, batch, rng, offset, n_steps, log_every):
    """The whole per-image optimization as ONE device program: analysis
    init -> n_steps SGA updates (log rows on device) -> final val metrics.
    One dispatch and one small fetch per image; on the tunneled chip this
    is what the single-image wall-clock is made of."""
    latents, opt_state = init_fn(params, batch)
    latents, _, bufs = scan_fn(
        params, batch, latents, opt_state, 0, n_steps, rng, log_every,
        offset=offset)
    val_metrics, _ = eval_fn(params, batch, latents, n_steps, offset=offset)
    return latents, bufs, val_metrics

  def step_fn(params, batch, latents, opt_state, step, rng, offset,
              with_metrics=False):
    """ONE composed SGA step, jitted standalone for the stream-dispatch
    mode. The same body as the scan's, but compiled outside any lax loop
    region: measured 2.96 -> 1.91 ms/step (f32, batch-1 Kodak-size) on
    TPU v5e -- the while-loop region itself costs ~1 ms/step (carry layout
    pinning / scheduling constraints; scripts/itinf_scan_ab.py pystep vs
    nometrics, round 5) and unrolling does NOT recover it. with_metrics
    keeps the log row (dispatched only at log boundaries)."""
    step_rng = jax.random.fold_in(rng, step)
    (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        latents, params, batch, step_rng, step, offset
    )
    updates, opt_state = tx.update(grads, opt_state, latents)
    latents = jax.tree_util.tree_map(lambda p, u: p + u, latents, updates)
    if not with_metrics:
      return latents, opt_state
    metrics["scheduled_lr"] = lr_fn(step)
    return latents, opt_state, metrics

  return init_fn, scan_fn, eval_fn, frozen_offset_fn, run_fn, step_fn


class ItinfJit(NamedTuple):
  """The jitted itinf surface, built once per dataset pass."""
  init: Any
  scan: Any
  evalf: Any
  offset: Any  # offset(params): the 60-iter prior-CDF bisection -- a pure
               # function of the FROZEN params, so computed once per dataset
               # and threaded into every scan/eval/run call.
  run: Any     # run(params, batch, rng, offset, n_steps, log_every): the
               # fused init->SGA->val program (one dispatch per image).
  step: Any        # step(params, batch, latents, opt_state, step, rng,
                   # offset) -> (latents, opt_state): one standalone SGA
                   # step (stream-dispatch mode).
  step_logged: Any  # same, + the log-row metrics dict.

  def run_stream(self, params, batch, rng, offset, n_steps, log_every):
    """The same optimization as `run`, issued as a stream of per-step
    dispatches from the host (async; ONE fetch at the end, so the tunnel
    pipelines them). Trades one dispatch per image for a ~1.5x faster
    step: the standalone step program avoids the lax while-loop region's
    per-iteration cost (see step_fn's measurement). Identical trajectory
    -- same step indices, per-step rngs, log boundaries -- so results
    match `run` up to XLA fusion noise. Returns device handles shaped
    like `run`'s (latents, log_bufs, val_metrics)."""
    latents, opt_state = self.init(params, batch)
    boundaries = set()
    pos = 0
    while pos < n_steps:
      pos = min(pos + log_every, n_steps)
      boundaries.add(pos - 1)
    rows = []
    for i in range(n_steps):
      if i in boundaries:
        latents, opt_state, metrics = self.step_logged(
            params, batch, latents, opt_state, jnp.int32(i), rng, offset)
        rows.append(metrics)
      else:
        latents, opt_state = self.step(
            params, batch, latents, opt_state, jnp.int32(i), rng, offset)
    bufs = {k: jnp.stack([r[k] for r in rows]) for k in rows[0]} if rows else {}
    val_metrics, _ = self.evalf(params, batch, latents, n_steps, offset=offset)
    return latents, bufs, val_metrics


def make_jitted_itinf(model, optimizer_config, num_steps: int):
  """Jit the (init, scan, eval) triple ONCE for a whole dataset pass.

  Re-jitting per image costs a full retrace + compile-cache load per batch
  (several seconds over the tunnel) for byte-identical executables; the
  driver builds this triple once and threads it through every
  itinf_on_data_batch call.
  """
  init_fn, scan_fn, eval_fn, offset_fn, run_fn, step_fn = make_itinf_functions(
      model, optimizer_config, num_steps
  )
  init_jit = jax.jit(init_fn)
  # The carried latents/opt_state are dead after each segment call: donate
  # them so XLA updates in place instead of copying per segment.
  scan_jit = jax.jit(scan_fn, static_argnames=("n_steps", "log_every"),
                     donate_argnames=("latents", "opt_state"))
  eval_jit = jax.jit(eval_fn)
  offset_jit = jax.jit(offset_fn)
  run_jit = jax.jit(run_fn, static_argnames=("n_steps", "log_every"))
  # Stream-mode steps: donate the carry so the 3000-dispatch chain reuses
  # buffers instead of allocating per step.
  step_jit = jax.jit(step_fn, donate_argnames=("latents", "opt_state"))
  step_logged_jit = jax.jit(
      functools.partial(step_fn, with_metrics=True),
      donate_argnames=("latents", "opt_state"))
  return ItinfJit(init_jit, scan_jit, eval_jit, offset_jit, run_jit,
                  step_jit, step_logged_jit)


def _emit_log_rows(writer, start, seg, log_every, picked):
  """Write fetched on-device log rows; returns the final row as floats.

  Row r holds the metrics of step (r+1)*log_every - 1 relative to `start`
  (clamped to the segment end), mirroring scan_fn's row contract.
  """
  row_steps = [min((r + 1) * log_every, seg)
               for r in range(-(-seg // log_every))]
  if writer is not None:
    for row, s in enumerate(row_steps):
      writer.write_scalars(
          start + s, {k: float(v[row]) for k, v in picked.items()}
      )
  return {k: float(v[-1]) for k, v in picked.items()}


def _use_stream(cfg: Mapping[str, Any], batch) -> bool:
  """Pick the dispatch shape for the no-mid-eval fast path.

  step_dispatch (train_eval_config): "stream" | "fused" | "auto" (default).
  auto -> stream for single-image batches, where the measured standalone
  step is ~1.5x faster than the same body inside a lax loop region
  (scripts/itinf_scan_ab.py, round 5) and latency is the target; fused for
  batched throughput runs, whose scan+bf16 path is the measured optimum
  and which amortize the loop cost over the batch anyway.
  """
  mode = cfg.get("step_dispatch", "auto")
  if mode == "auto":
    return int(np.shape(batch)[0]) == 1
  return mode == "stream"


def itinf_on_data_batch(
    model,
    params,
    data_batch,
    train_eval_config: Mapping[str, Any],
    optimizer_config: Mapping[str, Any],
    workdir: Optional[str] = None,
    seed: int = 0,
    jitted_fns: Optional[ItinfJit] = None,
    offset=None,
):
  """Optimize latents for one batch (reference itinf_lib.py:26-93).

  Returns (train_metrics, val_metrics, itinf_vars) where itinf_vars is a dict
  of final latent arrays (numpy), matching the reference's npz payload.
  """
  cfg = dict(train_eval_config)
  num_steps = cfg.get("num_steps", 3000)
  log_every = cfg.get("log_metrics_every_steps", 100)
  # eval_every_steps doubles as the scan-segment length: a val pass (and its
  # fetch) runs at every segment boundary. The default config sets it equal
  # to num_steps -- ONE jitted scan for the whole optimization, one metrics
  # fetch, one final val pass -- because on the tunneled chip each boundary
  # costs two ~25 ms RPC floors plus an MS-SSIM eval. Set it lower to get
  # the reference's mid-run validation cadence (ref itinf_lib.py:69-86).
  eval_every = cfg.get("eval_every_steps", 200)

  writer = None
  val_writer = None
  if workdir:
    writer = writers_lib.create_default_writer(workdir, collection="train")
    val_writer = writers_lib.create_default_writer(workdir, collection="val")

  fns = (jitted_fns if jitted_fns is not None
         else make_jitted_itinf(model, optimizer_config, num_steps))
  # Pin the (frozen) params to the device ONCE: checkpoint restore returns
  # host numpy arrays, and every dispatch that receives host args re-stages
  # them over the tunnel -- amortized for the one-dispatch fused path but
  # catastrophic for stream mode (3000 dispatches/image x ~273 MB params).
  params = jax.device_put(params)
  if offset is None:
    offset = fns.offset(params)

  rng = jax.random.PRNGKey(seed)
  batch = jnp.asarray(data_batch)

  def emit_rows(start, seg, bufs):
    return _emit_log_rows(writer, start, seg, log_every, jax.device_get(bufs))

  if eval_every >= num_steps:
    # Fast path (the default config): no mid-run val passes, so the whole
    # optimization runs without host round-trips and ends in one fetch.
    # Two dispatch shapes (see _use_stream): the fused ONE-program scan,
    # or a stream of standalone step dispatches (~1.5x faster step).
    if _use_stream(cfg, batch):
      latents, bufs, val_metrics = fns.run_stream(
          params, batch, rng, offset, n_steps=num_steps, log_every=log_every)
    else:
      latents, bufs, val_metrics = fns.run(
          params, batch, rng, offset, n_steps=num_steps, log_every=log_every)
    last_train_metrics = emit_rows(0, num_steps, bufs)
    last_val_metrics = {
        k: float(v) for k, v in jax.device_get(val_metrics).items()}
    if val_writer is not None:
      val_writer.write_scalars(num_steps, last_val_metrics)
  else:
    # Segmented path: mid-run validation at the reference's cadence
    # (ref itinf_lib.py:69-86) costs one dispatch + fetch per boundary.
    latents, opt_state = fns.init(params, batch)
    step = 0
    last_train_metrics = None
    last_val_metrics = None
    while step < num_steps:
      seg = min(eval_every, num_steps - step)
      latents, opt_state, bufs = fns.scan(
          params, batch, latents, opt_state, step, n_steps=seg, rng=rng,
          log_every=log_every, offset=offset,
      )
      last_train_metrics = emit_rows(step, seg, bufs)
      step += seg
      val_metrics, _ = fns.evalf(params, batch, latents, step, offset=offset)
      last_val_metrics = {
          k: float(v) for k, v in jax.device_get(val_metrics).items()}
      if val_writer is not None:
        val_writer.write_scalars(step, last_val_metrics)

  if writer is not None:
    writer.flush()
    val_writer.flush()

  itinf_vars = {
      f"uq_{i}_loc": np.asarray(jax.device_get(rv.loc))
      for i, rv in enumerate(latents.uq)
  }
  return last_train_metrics, last_val_metrics, itinf_vars


def itinf_eval(
    config,
    model_family: str,
    experiments_dir: str,
    runname: str,
    config_script: Optional[str] = None,
):
  """Driver: load warm-start checkpoint, run SGA per batch, dump results.

  Mirrors reference itinf_lib.py:99-209 (bookkeeping, per-batch workdirs,
  metrics.json + itinf_vars.npz).
  """
  from shallow_ntc_tpu import data as data_lib
  from shallow_ntc_tpu import eval_lib

  cfg = models_base.to_plain_dict(config)
  te_cfg = dict(cfg["train_eval_config"])

  workdir = train_lib.setup_workdir(config, experiments_dir, runname, config_script)
  logging.get_absl_handler().use_absl_log_file("itinf", workdir)

  warm_dir = te_cfg.get("warm_start_exp_dir")
  warm_wid = te_cfg.get("warm_start_wid", 0)
  # SGA-scan computation dtype for the (frozen) transforms; the entropy-model
  # math and the optimized latents stay f32. bfloat16 measurably speeds the
  # latency-bound step on TPU (PERF_NOTES.md "SGA itinf") -- the latent
  # gradients it produces feed a stochastic relaxation, not the weights.
  tdtype = te_cfg.get("transforms_dtype")
  if isinstance(tdtype, str):
    tdtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
              "none": None}[tdtype]
  model, params, train_config = eval_lib.load_latest_ckpt_from_experiment(
      warm_dir, warm_wid, model_family=model_family,
      update_model_config=cfg.get("model_config"),
      transforms_dtype=tdtype,
  )
  optimizer_config = dict(cfg.get("model_config", {}).get("optimizer_config", {}))

  data_cfg = dict(cfg["data_config"])
  dataset = data_lib.get_dataset(
      data_cfg["dataset"], "test", data_cfg["batchsize"], data_cfg.get("patchsize")
  )

  jitted_fns = make_jitted_itinf(
      model, optimizer_config, te_cfg.get("num_steps", 3000)
  )
  # Pin the frozen params to the device ONCE (restore returns host numpy;
  # host args re-stage over the tunnel on every dispatch -- see
  # itinf_on_data_batch). The quantization-offset bisection depends only on
  # the frozen params: once per dataset pass, not once per image.
  params = jax.device_put(params)
  offset = jitted_fns.offset(params)

  num_steps = te_cfg.get("num_steps", 3000)
  log_every = te_cfg.get("log_metrics_every_steps", 100)
  eval_every = te_cfg.get("eval_every_steps", 200)
  all_metrics = []

  def consume(batch_id, latents, bufs, val_metrics):
    """Fetch one batch's device results and write its artifacts.

    Called AFTER the next batch's program is already dispatched, so every
    host-side cost here (the log-buffer fetch wait, the ~2 MB latent fetch,
    TB writers, metrics.json, itinf_vars.npz) overlaps the device computing
    the next image -- the ~3.4 s/image fixed cost the round-4 wall-clock
    attribution found outside the scan (PERF_NOTES "SGA itinf wall-clock").
    """
    batch_dir = os.path.join(workdir, f"batch_id={batch_id}")
    os.makedirs(batch_dir, exist_ok=True)
    writer = writers_lib.create_default_writer(batch_dir, collection="train")
    val_writer = writers_lib.create_default_writer(batch_dir, collection="val")
    train_m = _emit_log_rows(
        writer, 0, num_steps, log_every, jax.device_get(bufs))
    val_m = {k: float(v) for k, v in jax.device_get(val_metrics).items()}
    val_writer.write_scalars(num_steps, val_m)
    writer.flush()
    val_writer.flush()
    itinf_vars = {
        f"uq_{i}_loc": np.asarray(jax.device_get(rv.loc))
        for i, rv in enumerate(latents.uq)
    }
    runname_utils.dump_json(
        {"train": train_m, "val": val_m}, os.path.join(batch_dir, "metrics.json")
    )
    np.savez(os.path.join(batch_dir, "itinf_vars.npz"), **itinf_vars)
    all_metrics.append({"batch_id": batch_id, **(val_m or {})})
    logging.info("itinf batch %d: %s", batch_id, val_m)

  if eval_every >= num_steps:
    # Pipelined fused path (the default config): batch i+1's one-dispatch
    # program is enqueued BEFORE batch i's results are fetched and written,
    # so PNG decode, the tunnel fetch waits and all file writes run while
    # the device optimizes the next image. Identical math and artifacts to
    # the sequential path (the per-batch rng does not depend on batch_id);
    # only the host/device interleaving changes.
    pending = None
    for batch_id, batch in enumerate(dataset):
      run = (jitted_fns.run_stream if _use_stream(te_cfg, batch)
             else jitted_fns.run)
      handles = run(
          params, jnp.asarray(batch), jax.random.PRNGKey(0), offset,
          n_steps=num_steps, log_every=log_every)
      if pending is not None:
        consume(*pending)
      pending = (batch_id,) + tuple(handles)
    if pending is not None:
      consume(*pending)
  else:
    # Segmented path (mid-run validation cadence): per-batch host/device
    # ping-pong is inherent, so run batches sequentially.
    for batch_id, batch in enumerate(dataset):
      batch_dir = os.path.join(workdir, f"batch_id={batch_id}")
      os.makedirs(batch_dir, exist_ok=True)
      train_m, val_m, itinf_vars = itinf_on_data_batch(
          model, params, batch, te_cfg, optimizer_config, workdir=batch_dir,
          jitted_fns=jitted_fns, offset=offset,
      )
      runname_utils.dump_json(
          {"train": train_m, "val": val_m},
          os.path.join(batch_dir, "metrics.json")
      )
      np.savez(os.path.join(batch_dir, "itinf_vars.npz"), **itinf_vars)
      all_metrics.append({"batch_id": batch_id, **(val_m or {})})
      logging.info("itinf batch %d: %s", batch_id, val_m)

  runname_utils.dump_json(all_metrics, os.path.join(workdir, "metrics.json"))
  return workdir, all_metrics
