"""Pallas kernel correctness (interpret mode on the CPU test platform)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shallow_ntc_tpu.models import transforms as T
from shallow_ntc_tpu.ops.pallas import jpegl_decode as jd


@pytest.mark.parametrize("k,c_in,shape", [
    (16, 32, (2, 4, 6)),
    (8, 16, (1, 3, 5)),
])
def test_jpegl_kernel_matches_conv_transpose(k, c_in, shape):
  rng = np.random.default_rng(0)
  b, hl, wl = shape
  z = jnp.asarray(rng.normal(0, 3, (b, hl, wl, c_in)).astype(np.float32))
  kernel = jnp.asarray(rng.normal(0, 0.1, (k, k, c_in, 3)).astype(np.float32))
  bias = jnp.asarray(rng.normal(0, 0.1, (3,)).astype(np.float32))

  out = jd.jpegl_synthesize(z, kernel, bias)
  ref = jd.jpegl_synthesize_xla(z, kernel, bias)
  assert out.shape == (b, hl * k, wl * k, 3)
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

  # flax ConvTranspose parity (the module the model family actually uses)
  import flax.linen as nn

  mod = nn.ConvTranspose(features=3, kernel_size=(k, k), strides=(k, k), padding="SAME")
  ref2 = mod.apply({"params": {"kernel": kernel, "bias": bias}}, z)
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref2), atol=1e-4)


def test_jpegl_module_pallas_flag_same_params():
  """use_pallas=True must produce the same output from the same checkpoint."""
  rng = jax.random.PRNGKey(0)
  z = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 24))
  mod_xla = T.JPEGLikeSynthesis(kernel_size=16, strides=16)
  params = mod_xla.init(rng, z)
  mod_pl = T.JPEGLikeSynthesis(kernel_size=16, strides=16, use_pallas=True)
  out_xla = mod_xla.apply(params, z)
  out_pl = mod_pl.apply(params, z)
  np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_xla), atol=1e-4)


def test_jpegl_module_pallas_flag_k18_falls_back():
  rng = jax.random.PRNGKey(0)
  z = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 24))
  mod = T.JPEGLikeSynthesis(kernel_size=18, strides=16, use_pallas=True)
  params = mod.init(rng, z)
  out = mod.apply(params, z)  # k != s -> XLA path, no crash
  assert out.shape == (1, 64, 64, 3)
