"""Experiment orchestration: train/eval loop, checkpointing, bookkeeping.

TPU-native re-design of /root/reference/common/train_lib.py:

  * TrainState (params, opt_state, step, rng) is an explicit pytree; the
    train step is a pure jitted function (state, batch) -> (state, metrics) -
    one XLA program per step, replacing tf.function graphs
    (reference train_lib.py:203-211).
  * Checkpointing via orbax (reference: tf.train.CheckpointManager,
    train_lib.py:123-126), same cadence knobs and the same three-way
    warm-start path resolution (train_lib.py:131-174).
  * Data parallelism: batches are sharded over a jax.sharding.Mesh 'data'
    axis with replicated params; XLA inserts the gradient all-reduce over
    ICI (see shallow_ntc_tpu/parallel). The reference is single-device.
  * Bookkeeping parity: workdir = experiments_dir/<xid>/wid=<wid>-<runname>,
    config.json + run_info.json + model-source snapshot
    (train_lib.py:305-337), train/val writers, image grids each eval.
"""

import glob
import os
import shutil
import time
from typing import Any, Callable, Dict, Iterable, Mapping, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax
from absl import logging

from shallow_ntc_tpu import schedule as schedule_lib
from shallow_ntc_tpu.models import base as models_base
from shallow_ntc_tpu.ops import metrics_ops
from shallow_ntc_tpu.utils import runname as runname_utils
from shallow_ntc_tpu.utils import writers as writers_lib


# ---------------------------------------------------------------------------
# Metrics container (reference train_lib.py:22-76)
# ---------------------------------------------------------------------------
class Metrics:
  """Host-side accumulator of scalar dicts + image dicts."""

  def __init__(self):
    self.scalars: Dict[str, Any] = {}
    self.images: Dict[str, Any] = {}

  @classmethod
  def make(cls):
    return cls()

  def record_scalar(self, key, value):
    self.scalars[key] = value

  def record_scalars(self, d: Mapping[str, Any]):
    self.scalars.update(d)

  def record_image(self, key, value):
    self.images[key] = value

  def scalars_numpy(self):
    return {k: np.asarray(v) for k, v in self.scalars.items()}

  def scalars_float(self):
    return {k: float(v) for k, v in self.scalars.items()}

  def images_grid(self, crop_to_max_dim=256):
    return {
        k: metrics_ops.visualize_image_batch(v, crop_to_max_dim=crop_to_max_dim)
        for k, v in self.images.items()
    }

  @staticmethod
  def merge_metrics(metrics_list: Iterable["Metrics"]) -> "Metrics":
    """Mean over scalars, concat over images (train_lib.py:58-76)."""
    metrics_list = list(metrics_list)
    merged = Metrics.make()
    if not metrics_list:
      return merged
    keys = metrics_list[0].scalars.keys()
    for k in keys:
      merged.scalars[k] = float(
          np.mean([float(m.scalars[k]) for m in metrics_list if k in m.scalars])
      )
    img_keys = metrics_list[0].images.keys()
    for k in img_keys:
      merged.images[k] = np.concatenate(
          [np.asarray(m.images[k]) for m in metrics_list if k in m.images], axis=0
      )
    return merged


# ---------------------------------------------------------------------------
# TrainState + optimizer
# ---------------------------------------------------------------------------
class TrainState(flax.struct.PyTreeNode):
  step: jax.Array
  params: Any
  opt_state: Any
  rng: jax.Array


def make_optimizer(
    optimizer_config: Mapping[str, Any], scheduled_num_steps: int
) -> Tuple[optax.GradientTransformation, Callable]:
  """Adam with the compression LR schedule (reference mshyper/models.py:92-109).

  Config keys: learning_rate (1e-4), reduce_lr_after (0.8), reduce_lr_factor
  (0.1), warmup_steps | warmup_until (0.02), global_clipnorm (optional).
  Adam epsilon follows Keras' 1e-7 default for training-dynamics parity.
  """
  cfg = dict(optimizer_config or {})
  learning_rate = cfg.pop("learning_rate", 1e-4)
  reduce_lr_after = cfg.pop("reduce_lr_after", 0.8)
  reduce_lr_factor = cfg.pop("reduce_lr_factor", 0.1)
  warmup_steps = cfg.pop("warmup_steps", None)
  warmup_until = cfg.pop("warmup_until", 0.02)
  global_clipnorm = cfg.pop("global_clipnorm", None)
  beta_1 = cfg.pop("beta_1", 0.9)
  beta_2 = cfg.pop("beta_2", 0.999)
  epsilon = cfg.pop("epsilon", 1e-7)
  if cfg:
    raise ValueError(f"Unknown optimizer_config keys: {sorted(cfg)}")

  lr_fn = schedule_lib.compression_schedule(
      base_learning_rate=learning_rate,
      total_num_steps=scheduled_num_steps,
      warmup_until=warmup_until,
      warmup_steps=warmup_steps,
      drop_after=reduce_lr_after,
      drop_factor=reduce_lr_factor,
  )
  chain = []
  if global_clipnorm is not None:
    chain.append(optax.clip_by_global_norm(global_clipnorm))
  chain.append(optax.adam(lr_fn, b1=beta_1, b2=beta_2, eps=epsilon))
  return optax.chain(*chain), lr_fn


def create_train_state(
    model, optimizer_config: Mapping, rng: jax.Array, input_shape
) -> Tuple[TrainState, optax.GradientTransformation, Callable]:
  """Initialize params + optimizer state for `model`."""
  tx, lr_fn = make_optimizer(
      optimizer_config, model.scheduled_num_steps
  )
  init_rng, state_rng = jax.random.split(rng)
  dummy = jnp.zeros((1,) + tuple(input_shape), jnp.float32)
  variables = model.init(init_rng, dummy, training=False, rng=None, step=0)
  params = variables["params"]
  opt_state = tx.init(params)
  state = TrainState(
      step=jnp.zeros((), jnp.int32),
      params=params,
      opt_state=opt_state,
      rng=state_rng,
  )
  return state, tx, lr_fn


def create_abstract_state(model, optimizer_config: Mapping, input_shape):
  """Abstract (shape/dtype-only) TrainState for checkpoint restoration.

  Uses jax.eval_shape, so no device computation or XLA compile happens --
  restoring a checkpoint for eval/codec use is pure I/O.
  """
  tx, _ = make_optimizer(optimizer_config, model.scheduled_num_steps)

  def init_fn(rng):
    dummy = jnp.zeros((1,) + tuple(input_shape), jnp.float32)
    variables = model.init(rng, dummy, training=False, rng=None, step=0)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        rng=jax.random.PRNGKey(0),
    )

  return jax.eval_shape(init_fn, jax.random.PRNGKey(0))


def make_train_step(model, tx, lr_fn):
  """Build the pure (state, batch) -> (state, metrics) step function."""

  def train_step(state: TrainState, batch: jax.Array):
    rng = jax.random.fold_in(state.rng, state.step)

    def loss_fn(params):
      loss, metrics, _ = model.apply(
          {"params": params},
          batch,
          training=True,
          rng=rng,
          step=state.step,
          method=type(model).end_to_end_frame_loss,
      )
      return loss, metrics

    (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    metrics["scheduled_lr"] = lr_fn(state.step)
    new_state = state.replace(
        step=state.step + 1, params=params, opt_state=opt_state
    )
    return new_state, metrics

  return train_step


def make_eval_step(model):
  def eval_step(state: TrainState, batch: jax.Array):
    loss, metrics, rec255 = model.apply(
        {"params": state.params},
        batch,
        training=False,
        rng=None,
        step=state.step,
        method=type(model).end_to_end_frame_loss,
    )
    return metrics, rec255

  return eval_step


# ---------------------------------------------------------------------------
# Checkpointing (orbax) + warm start
# ---------------------------------------------------------------------------
def _ckpt_dir(workdir: str) -> str:
  return os.path.join(workdir, "train", "checkpoints")


def make_checkpoint_manager(workdir: str, max_to_keep: int = 1):
  import orbax.checkpoint as ocp

  return ocp.CheckpointManager(
      os.path.abspath(_ckpt_dir(workdir)),
      options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
  )


def save_checkpoint(manager, state: TrainState):
  import orbax.checkpoint as ocp

  manager.save(
      int(state.step), args=ocp.args.StandardSave(jax.device_get(state))
  )


def restore_checkpoint(manager, state: TrainState) -> TrainState:
  import orbax.checkpoint as ocp

  step = manager.latest_step()
  if step is None:
    return state
  # Abstract restore target: shapes/dtypes only. A device_get of the
  # freshly-initialized state would round-trip ~150 MB through the remote-TPU
  # tunnel for values that are immediately overwritten (and tunnel fetch
  # bandwidth can degrade to KB/s, turning that into a multi-minute stall).
  abstract = jax.tree_util.tree_map(
      lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), state
  )
  restored = manager.restore(step, args=ocp.args.StandardRestore(abstract))
  logging.info("Restored checkpoint at step %d", step)
  return restored


def resolve_warm_start_dir(warm_start: str, wid=None) -> Optional[str]:
  """Reference warm-start resolution (train_lib.py:131-174): accepts a
  checkpoints dir, a workdir, or an experiment dir (matched by wid)."""
  if not warm_start:
    return None
  if os.path.basename(os.path.normpath(warm_start)) == "checkpoints":
    return warm_start
  cand = _ckpt_dir(warm_start)
  if os.path.isdir(cand):
    return cand
  # experiment dir: find the work-unit dir whose name starts with wid=<wid>-
  if wid is not None:
    matches = sorted(glob.glob(os.path.join(warm_start, f"wid={wid}-*")))
    if matches:
      return _ckpt_dir(matches[0])
  raise FileNotFoundError(
      f"Could not resolve warm start checkpoints from {warm_start!r} (wid={wid})"
  )


def restore_params_from_dir(ckpt_dir: str, state: TrainState) -> TrainState:
  """Load params (and step) from a foreign checkpoints dir into `state`.

  `state` may be a real TrainState or an abstract one from
  create_abstract_state (shape/dtype target only).
  """
  import orbax.checkpoint as ocp

  mgr = ocp.CheckpointManager(os.path.abspath(ckpt_dir))
  step = mgr.latest_step()
  if step is None:
    raise FileNotFoundError(f"No checkpoints under {ckpt_dir}")
  is_abstract = isinstance(
      jax.tree_util.tree_leaves(state.params)[0], jax.ShapeDtypeStruct
  )
  target = state if is_abstract else jax.device_get(state)
  restored = mgr.restore(step, args=ocp.args.StandardRestore(target))
  logging.info("Warm-started params from %s at step %d", ckpt_dir, step)
  if is_abstract:
    return restored
  return state.replace(params=restored.params, step=restored.step)


# ---------------------------------------------------------------------------
# The train/eval loop (reference train_lib.py:87-258)
# ---------------------------------------------------------------------------
def evaluate_model(eval_step_fn, state, val_iter, max_batches=None,
                   mesh=None) -> Metrics:
  from shallow_ntc_tpu.parallel import distributed
  from shallow_ntc_tpu.parallel import mesh as mesh_lib

  if distributed.is_multiprocess():
    val_iter = distributed.shard_batches(iter(val_iter))
  all_metrics = []
  images = None
  for i, batch in enumerate(val_iter):
    if max_batches is not None and i >= max_batches:
      break
    if distributed.is_multiprocess():
      batch = mesh_lib.put_batch(np.asarray(batch), mesh)
    else:
      batch = jnp.asarray(batch)
    metrics, rec = eval_step_fn(state, batch)
    m = Metrics.make()
    m.record_scalars(jax.device_get(metrics))
    all_metrics.append(m)
    if images is None:
      if isinstance(rec, jax.Array) and not rec.is_fully_addressable:
        # Multi-host: the reconstruction is batch-sharded across processes;
        # keep this host's rows for the sample grid.
        images = np.concatenate(
            [np.asarray(s.data) for s in rec.addressable_shards])
      else:
        images = np.asarray(jax.device_get(rec))
  merged = Metrics.merge_metrics(all_metrics)
  if images is not None:
    merged.record_image("reconstruction", images)
  return merged


def simple_train_eval_loop(
    train_eval_config: Mapping[str, Any],
    workdir: str,
    model,
    optimizer_config: Mapping[str, Any],
    train_iter,
    val_iter_factory: Callable[[], Iterable],
    input_shape=(256, 256, 3),
    seed: int = 0,
    mesh=None,
):
  """Train with periodic eval/checkpointing; returns the final TrainState."""
  cfg = dict(train_eval_config)
  num_steps = cfg.get("num_steps", 100)
  log_every = cfg.get("log_metrics_every_steps", 100)
  ckpt_every = cfg.get("checkpoint_every_steps", 10000)
  eval_every = cfg.get("eval_every_steps", 10000)
  max_val_batches = cfg.get("max_validation_steps", 16)
  warm_start = cfg.get("warm_start", None)
  warm_start_wid = cfg.get("warm_start_wid", None)

  # In multi-host runs only process 0 writes workdir files (TB/JSONL);
  # the others keep logging-only writers (parallel/distributed.py).
  from shallow_ntc_tpu.parallel import distributed

  just_logging = not distributed.is_primary()
  train_writer = writers_lib.create_default_writer(
      workdir, collection="train", just_logging=just_logging)
  val_writer = writers_lib.create_default_writer(
      workdir, collection="val", just_logging=just_logging)

  state, tx, lr_fn = create_train_state(
      model, optimizer_config, jax.random.PRNGKey(seed), input_shape
  )
  n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
  logging.info("Model has %.3fM params", n_params / 1e6)

  manager = make_checkpoint_manager(workdir, max_to_keep=cfg.get("max_to_keep", 1))
  if manager.latest_step() is not None:
    state = restore_checkpoint(manager, state)
  elif warm_start:
    ws_dir = resolve_warm_start_dir(warm_start, warm_start_wid)
    state = restore_params_from_dir(ws_dir, state)

  # Windowed dispatch: K train steps run as one jitted lax.scan call. Over
  # the remote-TPU tunnel a per-step dispatch pays ~25 ms of RPC latency and
  # the host->device batch transfer serializes with it (measured 6-9 steps/s
  # for the flagship); scanning K steps per dispatch amortizes both and the
  # uint8 window transfer (normalize happens on device below) costs 1/4 of
  # the float one. Window boundaries always align with the log/eval/ckpt
  # cadences, so observable behavior matches the per-step loop exactly.
  window_size = int(cfg.get("steps_per_dispatch", 16))
  raw_uint8 = bool(getattr(train_iter, "raw_uint8", False))

  base_train_step = make_train_step(model, tx, lr_fn)

  def window_step(state, window):
    def body(s, b):
      if raw_uint8:
        b = models_base.normalize_image(b.astype(jnp.float32))
      return base_train_step(s, b)

    state, metrics_seq = jax.lax.scan(body, state, window)
    last = jax.tree_util.tree_map(lambda x: x[-1], metrics_seq)
    return state, last

  eval_step = make_eval_step(model)

  if mesh is not None:
    from shallow_ntc_tpu.parallel import mesh as mesh_lib

    train_window, eval_step, state = mesh_lib.shard_window_functions(
        mesh, window_step, eval_step, state
    )
    put_window = lambda w: mesh_lib.put_window(w, mesh)  # noqa: E731
  else:
    # Donating the state buffers lets XLA update params/opt_state in place
    # instead of copying them every step.
    train_window = jax.jit(window_step, donate_argnums=(0,))
    eval_step = jax.jit(eval_step)
    put_window = jax.device_put

  def next_boundary(s):
    nb = num_steps
    for cadence in (log_every, eval_every, ckpt_every):
      nb = min(nb, (s // cadence + 1) * cadence)
    return nb

  start_step = int(state.step)
  t_last = time.time()
  steps_since_log = 0
  # Multi-host: every process iterates the identical globally-seeded stream
  # and keeps its rows; put_window assembles the global array from them.
  train_it = iter(distributed.shard_batches(iter(train_iter)))
  step = start_step

  while step < num_steps:
    w = min(window_size, next_boundary(step) - step)
    window = np.stack([np.asarray(next(train_it)) for _ in range(w)])
    state, metrics = train_window(state, put_window(window))
    step += w
    steps_since_log += w

    if step % log_every == 0 or step == num_steps:
      scalars = {k: float(v) for k, v in jax.device_get(metrics).items()}
      dt = time.time() - t_last
      scalars["steps_per_sec"] = steps_since_log / max(dt, 1e-9)
      t_last = time.time()
      steps_since_log = 0
      train_writer.write_scalars(step, scalars)

    # Checkpoint BEFORE the validation pass: the val eval compiles its own
    # (full-image-shaped) program and a flaky remote compile there must not
    # lose the trained weights at the final step.
    if step % ckpt_every == 0 or step == num_steps:
      save_checkpoint(manager, state)

    if step % eval_every == 0 or step == num_steps:
      val_metrics = evaluate_model(
          eval_step, state, val_iter_factory(), max_batches=max_val_batches,
          mesh=mesh,
      )
      val_writer.write_scalars(step, val_metrics.scalars_float())
      try:
        val_writer.write_images(step, val_metrics.images_grid())
      except Exception as e:  # grid tiling can fail on ragged batches
        logging.warning("Skipping image grid: %s", e)

  manager.wait_until_finished()
  train_writer.flush()
  val_writer.flush()
  return state


# ---------------------------------------------------------------------------
# Run bookkeeping + setup (reference train_lib.py:261-343)
# ---------------------------------------------------------------------------
def build_model_from_config(model_config: Mapping, family: str, dtype=None):
  """Instantiate a model family from a model_config dict; returns
  (model, optimizer_config)."""
  from shallow_ntc_tpu.models import factorized as factorized_models
  from shallow_ntc_tpu.models import mshyper as mshyper_models

  cfg = models_base.to_plain_dict(model_config)
  optimizer_config = cfg.pop("optimizer_config", {})
  cfg["offset_heuristic"] = models_base.effective_offset_heuristic(cfg)
  cls = {"mshyper": mshyper_models.Model, "factorized": factorized_models.Model}[
      family
  ]
  return cls(**cfg, dtype=dtype), optimizer_config


def setup_workdir(
    config, experiments_dir: str, runname: str, config_script: Optional[str] = None
) -> str:
  """Create the workdir and dump bookkeeping files (train_lib.py:305-337)."""
  xid = runname_utils.get_xid()
  wid = runname_utils.get_wid()
  wu_name = f"wid={wid}-{runname}" if wid is not None else runname
  workdir = os.path.join(experiments_dir, str(xid), wu_name)
  os.makedirs(workdir, exist_ok=True)

  cfg_dict = models_base.to_plain_dict(config)
  runname_utils.dump_json(cfg_dict, os.path.join(workdir, "config.json"))
  if config_script and os.path.isfile(config_script):
    shutil.copy(config_script, os.path.join(workdir, os.path.basename(config_script)))
  runname_utils.log_run_info(workdir)
  # Source snapshot (reference train_lib.py:334-336): models are pure
  # functions of config.json here, but keep the family sources for provenance.
  import shallow_ntc_tpu.models.factorized as fmod
  import shallow_ntc_tpu.models.mshyper as mmod

  for mod in (fmod, mmod):
    src = mod.__file__
    shutil.copy(src, os.path.join(workdir, os.path.basename(src)))
  return workdir


def train_and_eval(
    config,
    model_family: str,
    experiments_dir: str,
    runname: str,
    config_script: Optional[str] = None,
    mesh=None,
):
  """End-to-end entry used by the train CLIs (reference train_lib.py:261-343)."""
  from shallow_ntc_tpu import data as data_lib

  cfg = models_base.to_plain_dict(config)
  model, optimizer_config = build_model_from_config(
      cfg["model_config"], model_family
  )

  train_cfg = dict(cfg["train_data_config"])
  # uint8 crops: 4x less host->device traffic; the window step normalizes
  # on device (see simple_train_eval_loop).
  train_iter = data_lib.get_dataset(
      train_cfg["dataset"], "train", train_cfg["batchsize"],
      train_cfg["patchsize"], raw_uint8=True,
  )
  val_cfg = dict(cfg.get("val_data_config") or train_cfg)
  val_batches = cfg.get("train_eval_config", {}).get("max_validation_steps", 16)

  def val_iter_factory():
    if cfg.get("val_data_config"):
      return data_lib.get_dataset(
          val_cfg["dataset"], "test", val_cfg["batchsize"], val_cfg.get("patchsize")
      )
    # fallback: N batches of training data (reference train_lib.py:297-303)
    import itertools

    float_train = data_lib.get_dataset(
        train_cfg["dataset"], "train", train_cfg["batchsize"],
        train_cfg["patchsize"],
    )
    return itertools.islice(iter(float_train), val_batches)

  workdir = setup_workdir(config, experiments_dir, runname, config_script)
  logging.get_absl_handler().use_absl_log_file("train", workdir)

  patch = train_cfg["patchsize"] or 256
  state = simple_train_eval_loop(
      cfg["train_eval_config"],
      workdir,
      model,
      optimizer_config,
      train_iter,
      val_iter_factory,
      input_shape=(patch, patch, 3),
      mesh=mesh,
  )
  return state, workdir
