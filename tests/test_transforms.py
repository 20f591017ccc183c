"""Transform shape / registry / GDN tests (SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shallow_ntc_tpu.models import transforms as T


def _init_apply(mod, x_shape, rng=0):
  x = jax.random.normal(jax.random.PRNGKey(rng), x_shape)
  params = mod.init(jax.random.PRNGKey(rng + 1), x)
  y = mod.apply(params, x)
  return params, y


class TestGDN:
  def test_gdn1_closed_form(self):
    mod = T.GDN1()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 8))
    params = mod.init(jax.random.PRNGKey(1), x)
    y = mod.apply(params, x)
    # At init: gamma = 0.1*I, beta = 1 -> y = x / (1 + 0.1|x|)
    expected = x / (1.0 + 0.1 * jnp.abs(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(expected), rtol=1e-4, atol=1e-5)

  def test_igdn_inverse_form(self):
    mod = T.GDN1(inverse=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 8))
    params = mod.init(jax.random.PRNGKey(1), x)
    y = mod.apply(params, x)
    expected = x * (1.0 + 0.1 * jnp.abs(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(expected), rtol=1e-4, atol=1e-5)

  def test_classic_gdn(self):
    mod = T.GDN(alpha=2.0, epsilon=0.5)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 8))
    params = mod.init(jax.random.PRNGKey(1), x)
    y = mod.apply(params, x)
    expected = x / jnp.sqrt(1.0 + 0.1 * jnp.square(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(expected), rtol=1e-4, atol=1e-5)


SHAPE_CASES = [
    # (builder config, input shape, expected output shape)
    (dict(cls="BLS2017Analysis", num_filters=32), (1, 64, 64, 3), (1, 4, 4, 32)),
    (dict(cls="BLS2017Synthesis", num_filters=32), (1, 4, 4, 32), (1, 64, 64, 3)),
    (dict(cls="MBT2018Analysis", channels_base=16, output_channels=24), (1, 64, 64, 3), (1, 4, 4, 24)),
    (dict(cls="MBT2018Synthesis", channels_base=16, output_channels=3), (1, 4, 4, 24), (1, 64, 64, 3)),
    (dict(cls="CNNAnalysis", channels_base=16, output_channels=24), (1, 64, 64, 3), (1, 4, 4, 24)),
    (dict(cls="CNNSynthesis", channels_base=16), (1, 4, 4, 24), (1, 64, 64, 3)),
    (dict(cls="HyperAnalysis", bottleneck_size=24), (1, 16, 16, 24), (1, 4, 4, 24)),
    (dict(cls="HyperSynthesis", bottleneck_size=24), (1, 4, 4, 24), (1, 16, 16, 48)),
    (dict(cls="HyperAnalysisSmall", bottleneck_size=24), (1, 8, 8, 24), (1, 4, 4, 24)),
    (dict(cls="HyperSynthesisSmall", bottleneck_size=24), (1, 4, 4, 24), (1, 8, 8, 48)),
    (dict(cls="JPEGLikeSynthesis", kernel_size=16, strides=16), (1, 4, 4, 32), (1, 64, 64, 3)),
    (dict(cls="JPEGLikeSynthesis", kernel_size=18, strides=16), (1, 4, 4, 32), (1, 64, 64, 3)),
    (dict(cls="JPEGLikeSynthesis", kernel_size=16, strides=16, use_offset=True), (1, 4, 4, 32), (1, 64, 64, 3)),
    (dict(cls="TwoLayerSynthesis", channels=(12, 3)), (1, 4, 4, 32), (1, 64, 64, 3)),
    (dict(cls="TwoLayerResSynthesis", channels=(12, 3)), (1, 4, 4, 32), (1, 64, 64, 3)),
    (dict(cls="TwoLayerResSynthesis", channels=(12, 3), res_type="d2s"), (1, 4, 4, 32), (1, 64, 64, 3)),
    (dict(cls="JPEGLikeHyperSynthesis", bottleneck_size=24), (1, 4, 4, 24), (1, 16, 16, 48)),
    (dict(cls="ElicAnalysis", channels=(8, 8, 8, 16), num_residual_blocks=1), (1, 64, 64, 3), (1, 4, 4, 16)),
    (dict(cls="ElicAnalysis", channels=(8, 8, 16), kernel_sizes=(5, 5, 5),
          strides=(2, 2, 2), num_residual_blocks=1), (1, 64, 64, 3), (1, 8, 8, 16)),
    (dict(cls="ElicSynthesis", channels=(8, 8, 8, 3), num_residual_blocks=1), (1, 4, 4, 16), (1, 64, 64, 3)),
]


@pytest.mark.parametrize("cfg,in_shape,out_shape", SHAPE_CASES)
def test_transform_shapes(cfg, in_shape, out_shape):
  mod = T.build_transform(cfg)
  _, y = _init_apply(mod, in_shape)
  assert y.shape == out_shape
  # static inference matches the traced shape
  assert T.transform_output_depth(mod) == out_shape[-1]
  factor = T.transform_scale_factor(mod)
  if hasattr(mod, "downsample_factor"):
    assert in_shape[1] // factor == out_shape[1]
  else:
    assert in_shape[1] * factor == out_shape[1]


def test_registry_contains_all_reference_classes():
  expected = {
      "BLS2017Analysis", "BLS2017Synthesis", "CNNAnalysis", "CNNSynthesis",
      "HyperAnalysis", "HyperSynthesis", "MBT2018Analysis", "MBT2018Synthesis",
      "HyperAnalysisSmall", "HyperSynthesisSmall", "ElicAnalysis",
      "ElicSynthesis", "JPEGLikeSynthesis", "TwoLayerSynthesis",
      "TwoLayerResSynthesis", "JPEGLikeHyperSynthesis",
  }
  assert expected <= set(T.class_builder.keys())


def test_depth_to_space_roundtrip():
  x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 6, 12))
  y = T.depth_to_space(x, 2)
  assert y.shape == (2, 8, 12, 3)
  back = T.space_to_depth(y, 2)
  np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_activations():
  for name in ["relu", "leaky_relu", "lrelu", "gelu"]:
    fn = T.make_activation(name)
    assert callable(fn)
  assert T.make_activation(None) is None
  assert isinstance(T.make_activation("igdn"), T.GDN1)
  assert isinstance(T.make_activation("prelu"), T.PReLU)
  with pytest.raises(ValueError):
    T.make_activation("not_an_activation")
