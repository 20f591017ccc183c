"""LPIPS module (shape/jit/metric properties) and profiling-utility tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shallow_ntc_tpu.models import lpips
from shallow_ntc_tpu.utils import profiling


class TestLpips:
  @pytest.fixture(scope="class")
  def weights(self):
    return lpips.random_weights()

  def test_identity_is_zero(self, weights):
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3)) * 255
    d = lpips.lpips_distance(weights, x, x)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)

  def test_increases_with_distortion(self, weights):
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3)) * 255
    n1 = x + jax.random.normal(jax.random.PRNGKey(1), x.shape) * 5
    n2 = x + jax.random.normal(jax.random.PRNGKey(1), x.shape) * 40
    d1 = float(lpips.lpips_distance(weights, x, n1)[0])
    d2 = float(lpips.lpips_distance(weights, x, n2)[0])
    assert 0 < d1 < d2

  def test_jittable_multiple_sizes(self, weights):
    @jax.jit
    def f(a, b):
      return lpips.lpips_distance(weights, a, b)

    for hw in [(64, 64), (96, 128)]:
      x = jnp.zeros((1, *hw, 3))
      assert f(x, x).shape == (1,)

  def test_missing_weights_raise(self, tmp_path):
    with pytest.raises(FileNotFoundError):
      lpips.load_weights(str(tmp_path / "nope.npz"))


class TestProfiling:
  def test_get_flops_matmul(self):
    a = jnp.zeros((64, 128))
    b = jnp.zeros((128, 32))
    flops = profiling.get_flops(lambda x, y: x @ y, a, b)
    # ~2*M*N*K
    assert 0.5 * 2 * 64 * 128 * 32 <= flops <= 2.5 * 2 * 64 * 128 * 32

  def test_with_timing(self):
    fn = profiling.with_timing(jax.jit(lambda x: x * 2))
    out, dt = fn(jnp.ones((8, 8)))
    assert dt > 0 and out.shape == (8, 8)

  def test_transform_timings(self):
    from shallow_ntc_tpu.models import mshyper as mshyper_models

    model = mshyper_models.Model(
        scheduled_num_steps=10,
        transform_config=dict(
            analysis=dict(cls="CNNAnalysis", channels_base=8, output_channels=12),
            synthesis=dict(cls="TwoLayerSynthesis", channels=(6, 3),
                           strides=(8, 2), kernel_sizes=(13, 5)),
            hyper_analysis=dict(cls="HyperAnalysisSmall", bottleneck_size=12),
            hyper_synthesis=dict(cls="HyperSynthesisSmall", bottleneck_size=12),
        ),
    )
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x, training=False, rng=None, step=0)[
        "params"
    ]
    times = profiling.transform_timings(model, params, x, iters=2)
    assert {"analysis_time", "hyper_synthesis_time", "synthesis_time"} <= set(times)
    assert all(t > 0 for t in times.values())
