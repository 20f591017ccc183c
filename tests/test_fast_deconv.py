"""Subpixel/phase-space deconv lowering tests (ops/fast_deconv, pallas final).

Every fast path must be numerically equivalent to lax.conv_transpose SAME --
these lowerings carry the decode performance (PERF_NOTES.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shallow_ntc_tpu.ops import fast_deconv as fd

PAIRS = [(13, 8), (5, 2), (16, 16), (18, 16), (6, 4), (3, 1), (9, 4), (7, 3)]


def _ref(z, kern, bias, s):
  out = jax.lax.conv_transpose(
      z, kern, (s, s), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
  )
  return out + bias


@pytest.mark.parametrize("k,s", PAIRS)
def test_fast_conv_transpose_matches_lax(k, s):
  rng = np.random.default_rng(0)
  z = jnp.asarray(rng.normal(0, 1, (2, 5, 7, 6)).astype(np.float32))
  kern = jnp.asarray(rng.normal(0, 0.2, (k, k, 6, 4)).astype(np.float32))
  bias = jnp.asarray(rng.normal(0, 0.1, (4,)).astype(np.float32))
  np.testing.assert_allclose(
      np.asarray(fd.fast_conv_transpose(z, kern, bias, s)),
      np.asarray(_ref(z, kern, bias, s)), atol=1e-4,
  )


@pytest.mark.parametrize("k,s", [(13, 8), (5, 2), (9, 4)])
def test_phase_conv_and_grouped(k, s):
  rng = np.random.default_rng(1)
  z = jnp.asarray(rng.normal(0, 1, (2, 4, 5, 6)).astype(np.float32))
  kern = jnp.asarray(rng.normal(0, 0.2, (k, k, 6, 4)).astype(np.float32))
  bias = jnp.asarray(rng.normal(0, 0.1, (4,)).astype(np.float32))
  phase = fd.phase_conv(z, kern, bias, s)
  assert phase.shape == (2, 4, 5, s * s * 4)
  np.testing.assert_allclose(
      np.asarray(fd.depth_to_space(phase, s)),
      np.asarray(_ref(z, kern, bias, s)), atol=1e-4,
  )
  np.testing.assert_allclose(
      np.asarray(fd.grouped_phase_conv(z, kern, bias, s)),
      np.asarray(phase), atol=1e-5,
  )


@pytest.mark.parametrize("k,s,p", [(5, 2, 2), (5, 2, 4), (13, 8, 2), (3, 1, 2)])
def test_packed_conv_transpose(k, s, p):
  rng = np.random.default_rng(2)
  H = 8
  x = jnp.asarray(rng.normal(0, 1, (2, H, H, 6)).astype(np.float32))
  kern = jnp.asarray(rng.normal(0, 0.2, (k, k, 6, 4)).astype(np.float32))
  bias = jnp.asarray(rng.normal(0, 0.1, (4,)).astype(np.float32))
  xp = x.reshape(2, H // p, p, H // p, p, 6).transpose(0, 1, 3, 2, 4, 5)
  xp = xp.reshape(2, H // p, H // p, p * p * 6)
  np.testing.assert_allclose(
      np.asarray(fd.packed_conv_transpose(xp, kern, bias, s, p)),
      np.asarray(_ref(x, kern, bias, s)), atol=1e-4,
  )


def test_partial_depth_to_space():
  rng = np.random.default_rng(3)
  xp = jnp.asarray(rng.normal(0, 1, (2, 3, 4, 8 * 8 * 3)).astype(np.float32))
  full = fd.depth_to_space(xp, 8)
  part = fd.partial_depth_to_space(xp, 8, 2)
  s2d = full.reshape(2, 12, 2, 16, 2, 3).transpose(0, 1, 3, 2, 4, 5)
  s2d = s2d.reshape(2, 12, 16, 12)
  np.testing.assert_allclose(np.asarray(part), np.asarray(s2d))


def test_gdn_phase_matches_dense():
  from shallow_ntc_tpu.models.transforms import GDN1

  rng = np.random.default_rng(4)
  c, s = 6, 4
  x_p = jnp.asarray(rng.normal(0, 2, (2, 3, 4, s * s * c)).astype(np.float32))
  beta = jnp.asarray(np.abs(rng.normal(1, 0.1, (c,))).astype(np.float32))
  gamma = jnp.asarray(np.abs(rng.normal(0.1, 0.02, (c, c))).astype(np.float32))
  out_p = fd.gdn_phase(x_p, beta, gamma, s * s, inverse=True)
  # dense reference on the depth-to-spaced tensor
  x = fd.depth_to_space(x_p, s)
  norm = jnp.abs(x) @ gamma + beta
  ref = fd.depth_to_space(out_p, s)
  np.testing.assert_allclose(np.asarray(ref), np.asarray(x * norm), rtol=1e-5, atol=1e-5)


def test_pallas_final_deconv_phase():
  from shallow_ntc_tpu.ops.pallas import twolayer_final as tf2

  rng = np.random.default_rng(5)
  mid_p = jnp.asarray(rng.normal(0, 1, (2, 4, 6, 64 * 12)).astype(np.float32))
  k5 = jnp.asarray(rng.normal(0, 0.05, (5, 5, 12, 3)).astype(np.float32))
  b5 = jnp.asarray(rng.normal(0, 0.05, (3,)).astype(np.float32))
  ref = fd.packed_conv_transpose(mid_p, k5, b5, 2, 8)
  out = tf2.final_deconv_phase(mid_p, k5, b5, c_in=12)
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
  # both kernel variants must agree with the dense formulation
  out_rolled = tf2._final_deconv_phase_rolled_impl(mid_p, k5, b5, c_in=12)
  np.testing.assert_allclose(np.asarray(out_rolled), np.asarray(ref), atol=1e-4)


def test_pallas_final_deconv_odd_batch():
  from shallow_ntc_tpu.ops.pallas import twolayer_final as tf2

  rng = np.random.default_rng(6)
  mid_p = jnp.asarray(rng.normal(0, 1, (1, 4, 6, 64 * 12)).astype(np.float32))
  k5 = jnp.asarray(rng.normal(0, 0.05, (5, 5, 12, 3)).astype(np.float32))
  b5 = jnp.asarray(rng.normal(0, 0.05, (3,)).astype(np.float32))
  ref = fd.packed_conv_transpose(mid_p, k5, b5, 2, 8)
  out = tf2._final_deconv_phase_rolled_impl(mid_p, k5, b5, c_in=12)
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize("k,s,cin", [(5, 2, 3), (5, 2, 12), (3, 2, 3), (7, 4, 4), (9, 4, 3)])
def test_strided_conv_s2d_matches_lax(k, s, cin):
  rng = np.random.default_rng(7)
  z = jnp.asarray(rng.normal(0, 1, (2, 8, 12, cin)).astype(np.float32))
  kern = jnp.asarray(rng.normal(0, 0.2, (k, k, cin, 5)).astype(np.float32))
  bias = jnp.asarray(rng.normal(0, 0.1, (5,)).astype(np.float32))
  dn = jax.lax.conv_dimension_numbers(z.shape, kern.shape, ("NHWC", "HWIO", "NHWC"))
  ref = jax.lax.conv_general_dilated(z, kern, (s, s), "SAME", dimension_numbers=dn) + bias
  np.testing.assert_allclose(
      np.asarray(fd.strided_conv_s2d(z, kern, bias, s)),
      np.asarray(ref), atol=1e-4,
  )


@pytest.mark.parametrize("h,w,c", [(16, 12, 8), (8, 6, 4)])
def test_fused_resblock_matches_dense(h, w, c):
  from shallow_ntc_tpu.ops.pallas import resblock as rb

  rng = np.random.default_rng(8)
  x = jnp.asarray(rng.normal(0, 1, (2, h, w, c)).astype(np.float32))
  w1 = jnp.asarray(rng.normal(0, 0.2, (c, c // 2)).astype(np.float32))
  b1 = jnp.asarray(rng.normal(0, 0.1, (c // 2,)).astype(np.float32))
  w2 = jnp.asarray(rng.normal(0, 0.2, (3, 3, c // 2, c // 2)).astype(np.float32))
  b2 = jnp.asarray(rng.normal(0, 0.1, (c // 2,)).astype(np.float32))
  w3 = jnp.asarray(rng.normal(0, 0.2, (c // 2, c)).astype(np.float32))
  b3 = jnp.asarray(rng.normal(0, 0.1, (c,)).astype(np.float32))
  ref = rb._dense_resblock(x, w1, b1, w2, b2, w3, b3, act=jax.nn.relu)
  out = rb.fused_resblock(x, w1, b1, w2, b2, w3, b3)
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
  # gradients flow through the custom VJP (dense backward)
  g = jax.grad(lambda xx: jnp.sum(rb.fused_resblock(xx, w1, b1, w2, b2, w3, b3)))(x)
  gr = jax.grad(lambda xx: jnp.sum(rb._dense_resblock(
      xx, w1, b1, w2, b2, w3, b3, act=jax.nn.relu)))(x)
  np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=1e-4)
