"""Data-parallel and spatially-sharded execution on the 8-device CPU mesh.

SURVEY.md section 4: "multi-chip without a cluster" -- validates collective
layouts via XLA's host-platform device simulation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from shallow_ntc_tpu import train_lib
from shallow_ntc_tpu.models import mshyper as mshyper_models
from shallow_ntc_tpu.parallel import mesh as mesh_lib

TINY = dict(
    scheduled_num_steps=50,
    rd_lambda=0.01,
    transform_config=dict(
        analysis=dict(cls="CNNAnalysis", channels_base=8, output_channels=12),
        synthesis=dict(cls="TwoLayerSynthesis", channels=(6, 3), strides=(8, 2),
                       kernel_sizes=(13, 5)),
        hyper_analysis=dict(cls="HyperAnalysisSmall", bottleneck_size=12),
        hyper_synthesis=dict(cls="HyperSynthesisSmall", bottleneck_size=12),
    ),
)


@pytest.fixture(scope="module")
def setup():
  model = mshyper_models.Model(**TINY)
  state, tx, lr_fn = train_lib.create_train_state(
      model, dict(learning_rate=1e-3, warmup_until=0.0), jax.random.PRNGKey(0),
      (64, 64, 3),
  )
  return model, state, tx, lr_fn


def test_eight_devices_available():
  assert jax.device_count() >= 8


def test_dp_train_step_matches_single_device(setup):
  """The sharded step must compute the same update as the unsharded one."""
  model, state, tx, lr_fn = setup
  train_step = train_lib.make_train_step(model, tx, lr_fn)
  batch = jax.random.uniform(
      jax.random.PRNGKey(7), (8, 64, 64, 3), minval=-0.5, maxval=0.5
  )

  single = jax.jit(train_step)
  s1, m1 = single(state, batch)

  mesh = mesh_lib.make_mesh(8)
  dp_step, dp_eval, dp_state = mesh_lib.shard_train_functions(
      mesh, train_step, train_lib.make_eval_step(model), state
  )
  s2, m2 = dp_step(dp_state, mesh_lib.put_batch(np.asarray(batch), mesh))

  np.testing.assert_allclose(
      float(m1["rd_loss"]), float(m2["rd_loss"]), rtol=1e-4
  )
  for a, b in zip(
      jax.tree_util.tree_leaves(jax.device_get(s1.params)),
      jax.tree_util.tree_leaves(jax.device_get(s2.params)),
  ):
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-6)


def test_dp_multiple_steps_and_eval(setup):
  model, state, tx, lr_fn = setup
  mesh = mesh_lib.make_mesh(8)
  dp_step, dp_eval, dp_state = mesh_lib.shard_train_functions(
      mesh, train_lib.make_train_step(model, tx, lr_fn),
      train_lib.make_eval_step(model), state,
  )
  losses = []
  for i in range(6):
    batch = np.random.default_rng(i).uniform(-0.5, 0.5, (8, 64, 64, 3)).astype(np.float32)
    dp_state, metrics = dp_step(dp_state, mesh_lib.put_batch(batch, mesh))
    losses.append(float(metrics["rd_loss"]))
  assert int(dp_state.step) == 6
  assert np.isfinite(losses).all()
  batch = np.random.default_rng(99).uniform(-0.5, 0.5, (8, 64, 64, 3)).astype(np.float32)
  metrics, rec = dp_eval(dp_state, mesh_lib.put_batch(batch, mesh))
  assert np.isfinite(float(metrics["psnr"]))
  assert rec.shape == (8, 64, 64, 3)


def test_spatial_sharded_inference(setup):
  """Image H sharded over a 'spatial' axis: XLA inserts halo exchanges for
  the conv windows; result must equal the unsharded forward."""
  model, state, *_ = setup
  mesh = mesh_lib.make_mesh(8, axis_names=("data", "spatial"), axis_sizes=(2, 4))
  x = jax.random.uniform(
      jax.random.PRNGKey(3), (2, 128, 64, 3), minval=-0.5, maxval=0.5
  )

  def infer(params, v):
    latents = model.apply(
        {"params": params}, v, method=mshyper_models.Model.infer_latent_rvs
    )
    return latents.uq[1].loc

  y_ref = jax.jit(infer)(state.params, x)

  x_sh = jax.device_put(np.asarray(x), mesh_lib.spatial_sharding(mesh))
  params_repl = jax.device_put(jax.device_get(state.params), mesh_lib.replicated(mesh))
  y_sh = jax.jit(infer)(params_repl, x_sh)
  np.testing.assert_allclose(
      np.asarray(jax.device_get(y_sh)), np.asarray(jax.device_get(y_ref)),
      rtol=1e-4, atol=1e-5,
  )


def test_put_batch_sharding(setup):
  mesh = mesh_lib.make_mesh(8)
  batch = np.zeros((16, 8, 8, 3), np.float32)
  arr = mesh_lib.put_batch(batch, mesh)
  assert arr.sharding == NamedSharding(mesh, P("data"))
  assert mesh_lib.put_batch(batch, None).shape == batch.shape


def test_evaluate_images_spatial_sharded(setup):
  """eval_lib.evaluate_images with spatial_devices matches unsharded metrics."""
  from shallow_ntc_tpu import eval_lib

  model, state, *_ = setup
  img = np.random.default_rng(5).uniform(-0.5, 0.5, (1, 128, 64, 3)).astype(np.float32)
  plain = list(eval_lib.evaluate_images(model, state.params, img))[0]
  sharded = list(
      eval_lib.evaluate_images(model, state.params, img, spatial_devices=4)
  )[0]
  for k in ("bpp", "psnr", "rd_loss"):
    np.testing.assert_allclose(plain[k], sharded[k], rtol=1e-4)
