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


def test_final_deconv_phase_custom_vjp_exact():
  """Gradients through the Pallas forward must equal the pure-XLA gradients
  (the custom VJP backpropagates through the exact dense formulation)."""
  from shallow_ntc_tpu.ops import fast_deconv as fd
  from shallow_ntc_tpu.ops.pallas import twolayer_final as tl

  rng = np.random.default_rng(3)
  c_in, c_out, k = 12, 3, 5
  mid_p = jnp.asarray(rng.normal(0, 1, (2, 3, 4, 64 * c_in)).astype(np.float32))
  kernel = jnp.asarray(rng.normal(0, 0.1, (k, k, c_in, c_out)).astype(np.float32))
  bias = jnp.asarray(rng.normal(0, 0.1, (c_out,)).astype(np.float32))
  cot = jnp.asarray(rng.normal(0, 1, (2, 48, 64, c_out)).astype(np.float32))

  def loss_pallas(m, kk, b):
    return jnp.vdot(tl.final_deconv_phase(m, kk, b, c_in), cot)

  def loss_ref(m, kk, b):
    y = fd.packed_conv_transpose(
        fd.partial_depth_to_space(m, 8, 8), kk, b, 2, 8)
    return jnp.vdot(y, cot)

  g_pl = jax.grad(loss_pallas, argnums=(0, 1, 2))(mid_p, kernel, bias)
  g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(mid_p, kernel, bias)
  for a, b_ in zip(g_pl, g_ref):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


@pytest.mark.parametrize("batch", [2, 4])
def test_two_layer_res_train_mode_grads_match_unfused(batch):
  """End-to-end: fused (Pallas-forward) module grads == unfused module grads.

  batch 2 exercises the dense one-pass branch, batch 4 the grouped-tap
  branch (the fused path picks by batch size; see transforms.py)."""
  cfg = dict(cls="TwoLayerResSynthesis", channels=(12, 3), strides=(8, 2),
             kernel_sizes=(13, 5), activation_type="igdn", res_type="conv")
  z = jax.random.normal(jax.random.PRNGKey(5), (batch, 4, 4, 16))
  fused = T.build_transform(dict(cfg))
  unfused = T.build_transform(dict(cfg), fused=False)
  params = fused.init(jax.random.PRNGKey(0), z)

  def loss(mod, p):
    out = mod.apply(p, z, training=True)
    return jnp.sum(out**2)

  lf, gf = jax.value_and_grad(lambda p: loss(fused, p))(params)
  lu, gu = jax.value_and_grad(lambda p: loss(unfused, p))(params)
  np.testing.assert_allclose(float(lf), float(lu), rtol=1e-5)
  flat_f = jax.tree_util.tree_leaves_with_path(gf)
  flat_u = {jax.tree_util.keystr(p): v
            for p, v in jax.tree_util.tree_leaves_with_path(gu)}
  for path, v in flat_f:
    np.testing.assert_allclose(
        np.asarray(v), np.asarray(flat_u[jax.tree_util.keystr(path)]),
        rtol=1e-4, atol=1e-5, err_msg=jax.tree_util.keystr(path))


class TestFusedRBChain:
  """ops/pallas/rb_chain.py: the fused encode ResidualBlock-chain kernel
  (interpret mode on CPU) against the dense XLA formulation."""

  def _params(self, n, c, seed=0):
    rng = np.random.default_rng(seed)
    ch = c // 2
    mk = lambda *shape: rng.normal(0, 0.3, shape).astype(np.float32)
    return tuple(
        (mk(c, ch), mk(ch), mk(3, 3, ch, ch), mk(ch), mk(ch, c), mk(c))
        for _ in range(n)
    )

  @pytest.mark.parametrize("n_blocks", [1, 2, 3])
  def test_chain_matches_dense(self, n_blocks):
    from shallow_ntc_tpu.ops.pallas import rb_chain

    c = 16
    params = self._params(n_blocks, c, seed=n_blocks)
    x = np.random.default_rng(7).normal(0, 1, (2, 32, 24, c)).astype(np.float32)
    dense = rb_chain.dense_rb_chain(jnp.asarray(x), params, jax.nn.relu)
    fused = rb_chain.fused_rb_chain(jnp.asarray(x), params)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(dense), rtol=2e-5, atol=2e-5)

  def test_keep_pad_and_grad(self):
    from shallow_ntc_tpu.ops.pallas import rb_chain

    c, n = 8, 2
    params = self._params(n, c, seed=9)
    x = np.random.default_rng(3).normal(0, 1, (1, 16, 12, c)).astype(np.float32)
    padded = rb_chain.fused_rb_chain_padded(jnp.asarray(x), params, "relu", True)
    assert padded.shape == (1, 16, 12 + 2 * n, c)
    dense = rb_chain.dense_rb_chain(jnp.asarray(x), params, jax.nn.relu)
    np.testing.assert_allclose(
        np.asarray(padded[:, :, n:-n]), np.asarray(dense), rtol=2e-5, atol=2e-5)

    # Gradient flows through the custom VJP (dense backward).
    g = jax.grad(
        lambda xx: jnp.sum(rb_chain.fused_rb_chain(xx, params) ** 2)
    )(jnp.asarray(x))
    g_dense = jax.grad(
        lambda xx: jnp.sum(rb_chain.dense_rb_chain(xx, params, jax.nn.relu) ** 2)
    )(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_dense),
                               rtol=1e-4, atol=1e-4)

  def test_elic_analysis_fused_matches_dense(self, monkeypatch):
    """The full ElicAnalysis transform (RB chains + attention) must be
    identical with the fused path on and off, on the same params."""
    from shallow_ntc_tpu.models import transforms

    cfg = dict(cls="ElicAnalysis", channels=(8, 10, 12, 14),
               num_residual_blocks=2)
    mod = transforms.build_transform(dict(cfg))
    x = jnp.asarray(
        np.random.default_rng(1).normal(0, 0.3, (1, 64, 96, 3)), jnp.float32)
    monkeypatch.setenv("SNTC_FUSED_RB_CHAIN", "0")
    v = mod.init(jax.random.PRNGKey(0), x)
    dense = mod.apply(v, x)
    monkeypatch.setenv("SNTC_FUSED_RB_CHAIN", "1")
    fused = mod.apply(v, x)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)
