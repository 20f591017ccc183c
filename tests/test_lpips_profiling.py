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


def test_lpips_matches_torch_mirror():
  """Cross-framework validation of the LPIPS port.

  torchvision (and its pretrained VGG16) is unavailable offline, so the
  architecture/math is verified against an independently written torch
  replica of the published LPIPS forward pass (richzhang/PerceptualSimilarity
  'vgg' net: scaling layer, VGG16 conv/pool topology, unit-normalized feature
  diffs, nonneg 1x1 heads, spatial mean) using the same random weights. Real
  weights then drop in via scripts/convert_lpips_weights.py without touching
  this code path (see test_lpips_golden_when_weights_present).
  """
  torch = pytest.importorskip("torch")
  import numpy as np

  from shallow_ntc_tpu.models import lpips as L

  weights = L.random_weights(3)
  rng = np.random.default_rng(4)
  x = rng.uniform(0, 255, (2, 64, 48, 3)).astype(np.float32)
  y = np.clip(x + rng.normal(0, 12, x.shape), 0, 255).astype(np.float32)

  ours = np.asarray(L.lpips_distance(weights, jnp.asarray(x), jnp.asarray(y)))

  # --- independent torch replica ---
  shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
  scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

  def vgg_feats(img255):
    h = torch.from_numpy(np.transpose(img255, (0, 3, 1, 2))) / 127.5 - 1.0
    h = (h - shift) / scale
    feats = []
    for i, (_, pool_before) in enumerate(L._VGG_PLAN):
      if pool_before:
        h = torch.nn.functional.max_pool2d(h, 2, 2)
      # copy: jax arrays export as read-only numpy views and
      # torch.from_numpy warns on non-writable tensors.
      w = torch.from_numpy(np.ascontiguousarray(
          np.transpose(np.asarray(weights[f"conv{i}_w"]), (3, 2, 0, 1))))
      b = torch.from_numpy(np.array(weights[f"conv{i}_b"], copy=True))
      h = torch.nn.functional.conv2d(h, w, b, padding=1)
      h = torch.relu(h)
      if i in L._TAPS:
        feats.append(h)
    return feats

  with torch.no_grad():
    fx, fy = vgg_feats(x), vgg_feats(y)
    total = torch.zeros(2)
    for l, (a, b) in enumerate(zip(fx, fy)):
      a = a / (a.square().sum(dim=1, keepdim=True).sqrt() + 1e-10)
      b = b / (b.square().sum(dim=1, keepdim=True).sqrt() + 1e-10)
      d = (a - b).square()
      lin = torch.from_numpy(np.ascontiguousarray(
          np.maximum(np.asarray(weights[f"lin{l}_w"]), 0.0))).view(1, -1, 1, 1)
      total = total + (d * lin).sum(dim=1).mean(dim=(1, 2))
  np.testing.assert_allclose(ours, total.numpy(), rtol=1e-4, atol=1e-5)


def test_lpips_golden_when_weights_present():
  """Golden values vs the published implementation -- runs only when real
  converted weights exist (scripts/convert_lpips_weights.py; needs network
  or pre-staged files, so it is skipped in this environment)."""
  from shallow_ntc_tpu.models import lpips as L

  try:
    weights = L.load_weights()
  except FileNotFoundError:
    pytest.skip("no converted LPIPS weights in this environment")
  import numpy as np

  # Identical images must score ~0; strong noise must score well above 0.1
  # (sanity anchors from the published metric's behavior).
  rng = np.random.default_rng(0)
  x = rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32)
  d0 = float(jnp.mean(L.lpips_distance(weights, jnp.asarray(x), jnp.asarray(x))))
  assert d0 < 1e-6
  y = np.clip(x + rng.normal(0, 60, x.shape), 0, 255).astype(np.float32)
  d1 = float(jnp.mean(L.lpips_distance(weights, jnp.asarray(x), jnp.asarray(y))))
  assert d1 > 0.1
