"""Model-family tests: loss paths, quantization branches, train steps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shallow_ntc_tpu import train_lib
from shallow_ntc_tpu.models import factorized as factorized_models
from shallow_ntc_tpu.models import mshyper as mshyper_models

TINY_FACTORIZED = dict(
    scheduled_num_steps=100,
    rd_lambda=0.01,
    transform_config=dict(
        analysis=dict(cls="BLS2017Analysis", num_filters=8),
        synthesis=dict(cls="BLS2017Synthesis", num_filters=8),
    ),
)

TINY_MSHYPER = dict(
    scheduled_num_steps=100,
    rd_lambda=0.01,
    transform_config=dict(
        analysis=dict(cls="CNNAnalysis", channels_base=8, output_channels=12),
        synthesis=dict(cls="TwoLayerSynthesis", channels=(6, 3), strides=(8, 2),
                       kernel_sizes=(13, 5)),
        hyper_analysis=dict(cls="HyperAnalysisSmall", bottleneck_size=12),
        hyper_synthesis=dict(cls="HyperSynthesisSmall", bottleneck_size=12),
    ),
)


def _make(model_cls, cfg, latent_config=None, offset_heuristic=True):
  kwargs = dict(cfg)
  if latent_config is not None:
    kwargs["latent_config"] = latent_config
  return model_cls(offset_heuristic=offset_heuristic, **kwargs)


def _init(model, shape=(2, 64, 64, 3)):
  x = jax.random.uniform(jax.random.PRNGKey(0), shape, minval=-0.5, maxval=0.5)
  variables = model.init(jax.random.PRNGKey(1), x, training=False, rng=None, step=0)
  return variables, x


@pytest.mark.parametrize("family,cfg", [
    (factorized_models.Model, TINY_FACTORIZED),
    (mshyper_models.Model, TINY_MSHYPER),
])
@pytest.mark.parametrize("method", ["unoise", "mixedq", "sga"])
def test_loss_branches(family, cfg, method):
  latent_config = {"uq": {"method": method}}
  if method == "sga":
    latent_config["uq"].update(tau_r=1e-3, tau_ub=0.5, tau_t0=10)
  model = _make(family, cfg, latent_config, offset_heuristic=(method == "unoise"))
  variables, x = _init(model)
  for training in (True, False):
    loss, metrics, rec = model.apply(
        variables, x, training=training,
        rng=jax.random.PRNGKey(2), step=5,
        method=type(model).end_to_end_frame_loss,
    )
    assert np.isfinite(float(loss))
    assert rec.shape == x.shape
    assert float(metrics["bpp"]) > 0
    assert np.isfinite(float(metrics["psnr"]))
    if method == "sga" and training:
      assert "tau" in metrics


def test_padding_of_odd_sizes():
  model = _make(factorized_models.Model, TINY_FACTORIZED)
  variables, _ = _init(model, (1, 64, 64, 3))
  x = jax.random.uniform(jax.random.PRNGKey(0), (1, 47, 53, 3), minval=-0.5, maxval=0.5)
  loss, metrics, rec = model.apply(
      variables, x, training=False, rng=None, step=0,
      method=factorized_models.Model.end_to_end_frame_loss,
  )
  assert rec.shape == x.shape
  assert np.isfinite(float(loss))


def test_train_step_descends():
  model = _make(factorized_models.Model, TINY_FACTORIZED)
  state, tx, lr_fn = train_lib.create_train_state(
      model, dict(learning_rate=1e-3, warmup_until=0.0), jax.random.PRNGKey(0),
      (64, 64, 3),
  )
  train_step = jax.jit(train_lib.make_train_step(model, tx, lr_fn))
  x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3), minval=-0.5, maxval=0.5)
  losses = []
  for _ in range(8):
    state, metrics = train_step(state, x)
    losses.append(float(metrics["rd_loss"]))
  assert int(state.step) == 8
  # loss on a fixed batch should decrease overall
  assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_mshyper_latent_shapes():
  model = _make(mshyper_models.Model, TINY_MSHYPER)
  variables, x = _init(model, (1, 64, 64, 3))
  latents = model.apply(
      variables, x, method=mshyper_models.Model.infer_latent_rvs
  )
  assert len(latents.uq) == 2
  z, y = latents.uq
  assert y.loc.shape == (1, 4, 4, 12)   # 64/16 downsample
  assert z.loc.shape == (1, 2, 2, 12)   # hyper small: /2
  assert model.downsample_factor == 32


def test_lambda_warmup_in_metrics():
  model = _make(factorized_models.Model, TINY_FACTORIZED)
  variables, x = _init(model)
  _, m_early, _ = model.apply(
      variables, x, training=True, rng=jax.random.PRNGKey(0), step=0,
      method=factorized_models.Model.end_to_end_frame_loss,
  )
  _, m_late, _ = model.apply(
      variables, x, training=True, rng=jax.random.PRNGKey(0), step=90,
      method=factorized_models.Model.end_to_end_frame_loss,
  )
  assert float(m_early["sched_rd_lambda"]) == pytest.approx(0.1, rel=1e-5)
  assert float(m_late["sched_rd_lambda"]) == pytest.approx(0.01, rel=1e-5)
