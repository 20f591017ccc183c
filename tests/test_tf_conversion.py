"""Validate TF/Keras -> flax weight-layout conversion against tf.keras itself.

These are the load-bearing facts for importing the reference's released TF
checkpoints (SURVEY.md section 7 "hard parts": SAME-deconv padding parity is
a classic off-by-one trap for k13s8 / k16s16).
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import flax.linen as nn  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from shallow_ntc_tpu.utils import tf_convert  # noqa: E402


@pytest.mark.parametrize("k,s", [(9, 4), (5, 2), (3, 1), (1, 1)])
def test_conv2d_same_parity(k, s):
  rng = np.random.default_rng(0)
  x = rng.normal(0, 1, (2, 32, 32, 5)).astype(np.float32)
  kernel = rng.normal(0, 0.2, (k, k, 5, 7)).astype(np.float32)
  bias = rng.normal(0, 0.1, (7,)).astype(np.float32)

  layer = tf.keras.layers.Conv2D(7, k, strides=s, padding="SAME", use_bias=True)
  layer.build(x.shape)
  layer.set_weights([kernel, bias])
  tf_out = layer(tf.constant(x)).numpy()

  mod = nn.Conv(features=7, kernel_size=(k, k), strides=(s, s), padding="SAME")
  out = mod.apply(
      {"params": {"kernel": jnp.asarray(tf_convert.conv_kernel_tf_to_flax(kernel)),
                  "bias": jnp.asarray(bias)}},
      jnp.asarray(x),
  )
  assert out.shape == tf_out.shape
  np.testing.assert_allclose(np.asarray(out), tf_out, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k,s", [(13, 8), (5, 2), (16, 16), (18, 16), (6, 4), (3, 1), (9, 4)])
def test_conv2d_transpose_same_parity(k, s):
  """Every (kernel, stride) used by the paper's decoders."""
  rng = np.random.default_rng(1)
  x = rng.normal(0, 1, (2, 6, 8, 5)).astype(np.float32)
  tf_kernel = rng.normal(0, 0.2, (k, k, 7, 5)).astype(np.float32)  # [k,k,out,in]
  bias = rng.normal(0, 0.1, (7,)).astype(np.float32)

  layer = tf.keras.layers.Conv2DTranspose(7, k, strides=s, padding="SAME", use_bias=True)
  layer.build(x.shape)
  layer.set_weights([tf_kernel, bias])
  tf_out = layer(tf.constant(x)).numpy()

  flax_kernel = tf_convert.conv_transpose_kernel_tf_to_flax(tf_kernel)
  mod = nn.ConvTranspose(features=7, kernel_size=(k, k), strides=(s, s), padding="SAME")
  out = mod.apply(
      {"params": {"kernel": jnp.asarray(flax_kernel), "bias": jnp.asarray(bias)}},
      jnp.asarray(x),
  )
  assert out.shape == tf_out.shape, (out.shape, tf_out.shape)
  np.testing.assert_allclose(np.asarray(out), tf_out, rtol=1e-4, atol=1e-4)

  # inverse mapping round-trips
  back = tf_convert.conv_transpose_kernel_flax_to_tf(flax_kernel)
  np.testing.assert_allclose(back, tf_kernel)
