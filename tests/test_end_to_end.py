"""End-to-end slice: config -> train loop -> orbax ckpt -> eval -> itinf.

Mirrors SURVEY.md section 7 step 4 (the milestone slice) and section 4's
integration-test recommendation (smoke train on synthetic data).
"""

import glob
import json
import os

import jax
import numpy as np
import pytest

from shallow_ntc_tpu import data as data_lib
from shallow_ntc_tpu import eval_lib
from shallow_ntc_tpu import itinf_lib
from shallow_ntc_tpu import train_lib

TINY_MODEL_CONFIG = dict(
    scheduled_num_steps=30,
    rd_lambda=0.01,
    optimizer_config=dict(learning_rate=1e-3, warmup_until=0.0, global_clipnorm=1.0),
    transform_config=dict(
        analysis=dict(cls="CNNAnalysis", channels_base=8, output_channels=12),
        synthesis=dict(cls="TwoLayerSynthesis", channels=(6, 3), strides=(8, 2),
                       kernel_sizes=(13, 5)),
        hyper_analysis=dict(cls="HyperAnalysisSmall", bottleneck_size=12),
        hyper_synthesis=dict(cls="HyperSynthesisSmall", bottleneck_size=12),
    ),
)


@pytest.fixture(scope="module")
def trained_workdir(tmp_path_factory):
  """Run the full train_and_eval entry on synthetic data."""
  exp_dir = str(tmp_path_factory.mktemp("train_xms"))
  config = dict(
      model_family="mshyper",
      train_data_config=dict(dataset="synthetic", batchsize=2, patchsize=64),
      val_data_config=dict(dataset="synthetic", batchsize=2, patchsize=64),
      train_eval_config=dict(
          num_steps=12,
          log_metrics_every_steps=4,
          checkpoint_every_steps=6,
          eval_every_steps=6,
          max_validation_steps=2,
      ),
      model_config=TINY_MODEL_CONFIG,
  )
  os.environ["SLURM_ARRAY_JOB_ID"] = "777"
  os.environ["SLURM_ARRAY_TASK_ID"] = "0"
  try:
    state, workdir = train_lib.train_and_eval(
        config, "mshyper", exp_dir, runname="mshyper-lmbda=0.01-test"
    )
  finally:
    del os.environ["SLURM_ARRAY_JOB_ID"]
    del os.environ["SLURM_ARRAY_TASK_ID"]
  return workdir, state


def test_train_produces_bookkeeping(trained_workdir):
  workdir, state = trained_workdir
  assert int(state.step) == 12
  assert os.path.exists(os.path.join(workdir, "config.json"))
  assert os.path.exists(os.path.join(workdir, "run_info.json"))
  assert glob.glob(os.path.join(workdir, "train", "checkpoints", "*"))
  # JSONL metrics written
  rec = os.path.join(workdir, "train", "record.jsonl")
  assert os.path.exists(rec)
  lines = [json.loads(l) for l in open(rec)]
  assert any("rd_loss" in l for l in lines)
  assert workdir.endswith("wid=0-mshyper-lmbda=0.01-test")
  assert os.sep + "777" + os.sep in workdir


def test_eval_workdir(trained_workdir, tmp_path):
  workdir, _ = trained_workdir
  eval_data = data_lib.SyntheticDataset(1, 64, num_batches=2)
  results_dir = str(tmp_path / "json_results")
  path = eval_lib.eval_workdir(
      workdir, eval_data, "synthetic", results_dir, model_family="mshyper"
  )
  results = json.load(open(path))
  assert len(results) == 2
  for r in results:
    assert {"bpp", "psnr", "msssim", "instance_id"} <= set(r)
    assert np.isfinite(r["bpp"]) and r["bpp"] > 0
  # skip_existing short-circuits
  path2 = eval_lib.eval_workdir(
      workdir, eval_data, "synthetic", results_dir, skip_existing=True,
      model_family="mshyper",
  )
  assert path2 == path


def test_checkpoint_resume(trained_workdir):
  workdir, state = trained_workdir
  model, params, config = eval_lib.load_latest_ckpt(workdir, "mshyper")
  orig = jax.device_get(state.params)
  restored = jax.device_get(params)
  leaves_o = jax.tree_util.tree_leaves(orig)
  leaves_r = jax.tree_util.tree_leaves(restored)
  assert len(leaves_o) == len(leaves_r)
  for a, b in zip(leaves_o, leaves_r):
    np.testing.assert_allclose(a, b)


def test_warm_start_resolution(trained_workdir):
  workdir, _ = trained_workdir
  ckpt = os.path.join(workdir, "train", "checkpoints")
  # direct ckpt dir / workdir / experiment dir by wid
  assert train_lib.resolve_warm_start_dir(ckpt) == ckpt
  assert train_lib.resolve_warm_start_dir(workdir) == ckpt
  exp_dir = os.path.dirname(workdir)
  assert train_lib.resolve_warm_start_dir(exp_dir, wid=0) == ckpt
  with pytest.raises(FileNotFoundError):
    train_lib.resolve_warm_start_dir(exp_dir, wid=99)


def test_itinf_improves_rd_loss(trained_workdir, tmp_path):
  """SGA optimization of latents should reduce rd_loss vs the amortized
  encoder output (the paper's core itinf claim, at tiny scale)."""
  workdir, _ = trained_workdir
  model, params, config = eval_lib.load_latest_ckpt(
      workdir, "mshyper",
      update_model_config=dict(
          latent_config=dict(uq=dict(method="sga", tau_r=2e-2, tau_ub=0.5, tau_t0=20)),
          offset_heuristic=False,
      ),
  )
  batch = np.asarray(next(iter(data_lib.SyntheticDataset(1, 64, num_batches=1))))
  # amortized eval rd_loss
  amortized = list(eval_lib.evaluate_images(model, params, batch))[0]["rd_loss"]
  train_m, val_m, itinf_vars = itinf_lib.itinf_on_data_batch(
      model, params, batch,
      train_eval_config=dict(num_steps=60, log_metrics_every_steps=20,
                             eval_every_steps=30),
      optimizer_config=dict(learning_rate=5e-3, warmup_until=0.0),
      workdir=str(tmp_path / "itinf"),
  )
  assert "uq_0_loc" in itinf_vars and "uq_1_loc" in itinf_vars
  assert val_m["rd_loss"] <= amortized * 1.02  # should improve (or at least not regress)
  assert np.isfinite(train_m["rd_loss"])


def test_itinf_bf16_transforms(trained_workdir, tmp_path):
  """SGA with bfloat16 transform computation (configs/itinf.py
  transforms_dtype) must still optimize: the latent gradients flow through
  bf16 convs while the entropy math and Adam state stay f32."""
  import jax.numpy as jnp

  workdir, _ = trained_workdir
  model, params, config = eval_lib.load_latest_ckpt(
      workdir, "mshyper",
      update_model_config=dict(
          latent_config=dict(uq=dict(method="sga", tau_r=2e-2, tau_ub=0.5, tau_t0=20)),
          offset_heuristic=False,
      ),
      transforms_dtype=jnp.bfloat16,
  )
  batch = np.asarray(next(iter(data_lib.SyntheticDataset(1, 64, num_batches=1))))
  amortized = list(eval_lib.evaluate_images(model, params, batch))[0]["rd_loss"]
  train_m, val_m, itinf_vars = itinf_lib.itinf_on_data_batch(
      model, params, batch,
      train_eval_config=dict(num_steps=60, log_metrics_every_steps=20,
                             eval_every_steps=30),
      optimizer_config=dict(learning_rate=5e-3, warmup_until=0.0),
      workdir=str(tmp_path / "itinf_bf16"),
  )
  # Latents must stay f32 (Adam runs on the optimized variables).
  assert itinf_vars["uq_1_loc"].dtype == np.float32
  assert val_m["rd_loss"] <= amortized * 1.05
  assert np.isfinite(train_m["rd_loss"])


def test_itinf_fused_matches_segmented(trained_workdir, tmp_path):
  """The fused one-dispatch-per-image path (eval_every >= num_steps; the
  wall-clock default, itinf_lib.ItinfJit.run) must produce the same
  optimization as the segmented path: identical trajectory (same per-step
  rngs and update order), so identical final latents and log rows."""
  workdir, _ = trained_workdir
  model, params, config = eval_lib.load_latest_ckpt(
      workdir, "mshyper",
      update_model_config=dict(
          latent_config=dict(uq=dict(method="sga", tau_r=2e-2, tau_ub=0.5, tau_t0=20)),
          offset_heuristic=False,
      ),
  )
  batch = np.asarray(next(iter(data_lib.SyntheticDataset(1, 64, num_batches=1))))
  opt_cfg = dict(learning_rate=5e-3, warmup_until=0.0)

  def run(eval_every):
    return itinf_lib.itinf_on_data_batch(
        model, params, batch,
        train_eval_config=dict(num_steps=60, log_metrics_every_steps=20,
                               eval_every_steps=eval_every),
        optimizer_config=opt_cfg,
        workdir=None,
    )

  tm_seg, vm_seg, vars_seg = run(eval_every=20)   # 3 segments
  tm_fus, vm_fus, vars_fus = run(eval_every=60)   # fused single call
  # Same trajectory (per-step rngs, update order, tau/lr schedules); only
  # XLA fusion differences between the two compiled programs remain, so
  # near-equality rather than bitwise.
  for k in vars_seg:
    np.testing.assert_allclose(vars_seg[k], vars_fus[k], rtol=1e-4, atol=1e-4)
  for k in tm_seg:
    np.testing.assert_allclose(tm_seg[k], tm_fus[k], rtol=1e-3, atol=1e-4)
  for k in vm_seg:
    np.testing.assert_allclose(vm_seg[k], vm_fus[k], rtol=1e-3, atol=1e-4)


def test_itinf_stream_matches_fused(trained_workdir):
  """Stream-dispatch mode (per-step jitted dispatches; the batch-1 default)
  must produce the same optimization as the fused one-program path: same
  step indices, per-step rngs and log boundaries, so identical final
  latents, log rows and val metrics up to XLA fusion noise."""
  workdir, _ = trained_workdir
  model, params, config = eval_lib.load_latest_ckpt(
      workdir, "mshyper",
      update_model_config=dict(
          latent_config=dict(uq=dict(method="sga", tau_r=2e-2, tau_ub=0.5, tau_t0=20)),
          offset_heuristic=False,
      ),
  )
  batch = np.asarray(next(iter(data_lib.SyntheticDataset(1, 64, num_batches=1))))
  opt_cfg = dict(learning_rate=5e-3, warmup_until=0.0)

  def run(mode):
    return itinf_lib.itinf_on_data_batch(
        model, params, batch,
        train_eval_config=dict(num_steps=50, log_metrics_every_steps=20,
                               eval_every_steps=50, step_dispatch=mode),
        optimizer_config=opt_cfg,
        workdir=None,
    )

  tm_f, vm_f, vars_f = run("fused")
  tm_s, vm_s, vars_s = run("stream")
  for k in vars_f:
    np.testing.assert_allclose(vars_s[k], vars_f[k], rtol=1e-4, atol=1e-4)
  for k in tm_f:
    np.testing.assert_allclose(tm_s[k], tm_f[k], rtol=1e-3, atol=1e-4)
  for k in vm_f:
    np.testing.assert_allclose(vm_s[k], vm_f[k], rtol=1e-3, atol=1e-4)


def test_itinf_eval_pipelined_driver(trained_workdir, tmp_path):
  """The pipelined fused-path driver (itinf_lib.itinf_eval dispatches batch
  i+1 before consuming batch i) must write the same per-batch artifacts as
  direct itinf_on_data_batch calls on the same data: identical metrics
  (same program, same rng) and the full metrics.json/itinf_vars.npz layout."""
  from shallow_ntc_tpu.data import write_png

  workdir, _ = trained_workdir
  img_dir = tmp_path / "imgs"
  img_dir.mkdir()
  rng = np.random.default_rng(7)
  for i in range(3):
    write_png(str(img_dir / f"img{i}.png"),
              rng.integers(0, 256, (64, 64, 3)).astype(np.uint8))

  te_cfg = dict(num_steps=40, log_metrics_every_steps=20,
                eval_every_steps=40,  # fused -> pipelined driver path
                warm_start_exp_dir=os.path.dirname(workdir),
                warm_start_wid=0)
  opt_cfg = dict(learning_rate=5e-3, warmup_until=0.0)
  config = dict(
      model_family="mshyper",
      data_config=dict(dataset=str(img_dir / "*.png"), batchsize=1,
                       patchsize=None),
      train_eval_config=te_cfg,
      model_config=dict(
          scheduled_num_steps=40,
          optimizer_config=opt_cfg,
          latent_config=dict(
              uq=dict(method="sga", tau_r=2e-2, tau_ub=0.5, tau_t0=20)),
          offset_heuristic=False,
      ),
  )
  out_dir, all_metrics = itinf_lib.itinf_eval(
      config, "mshyper", str(tmp_path / "itinf_exp"), runname="pipelined")
  assert len(all_metrics) == 3
  assert [m["batch_id"] for m in all_metrics] == [0, 1, 2]

  # Reference arm: the unpipelined per-batch call on the same data.
  from shallow_ntc_tpu import data as data_lib_mod

  model, params, _ = eval_lib.load_latest_ckpt(
      workdir, "mshyper",
      update_model_config=config["model_config"])
  dataset = data_lib_mod.get_dataset(str(img_dir / "*.png"), "test", 1, None)
  for batch_id, batch in enumerate(dataset):
    _, val_m, itinf_vars = itinf_lib.itinf_on_data_batch(
        model, params, batch, train_eval_config=te_cfg,
        optimizer_config=opt_cfg, workdir=None)
    got = all_metrics[batch_id]
    for k, v in val_m.items():
      np.testing.assert_allclose(got[k], v, rtol=1e-4, atol=1e-5, err_msg=k)
    batch_dir = os.path.join(out_dir, f"batch_id={batch_id}")
    assert os.path.exists(os.path.join(batch_dir, "metrics.json"))
    saved = np.load(os.path.join(batch_dir, "itinf_vars.npz"))
    for k in itinf_vars:
      np.testing.assert_allclose(saved[k], itinf_vars[k], rtol=1e-4,
                                 atol=1e-5, err_msg=k)
