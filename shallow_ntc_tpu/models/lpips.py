"""LPIPS (Zhang 2018) perceptual metric: jittable VGG16 feature distance.

Replaces the reference's lpips_tf2 submodule (eager-only, rebuilt per image
size, with downloaded Keras weights; /root/reference/mshyper/models.py:334-340
and common/lpips_tensorflow.py). This implementation is a pure flax function
of (weights, x, y): fully jittable at any static image size, so it runs
on-device inside the eval step instead of forcing eager mode.

Weights are not bundled (no network access in most deployments): provide an
.npz via $SHALLOW_NTC_LPIPS_WEIGHTS or <project>/lpips_vgg_weights.npz,
produced by scripts/convert_lpips_weights.py from the public torchvision
VGG16 + richzhang/PerceptualSimilarity 'vgg' linear weights. Without weights,
make_lpips_fn() raises and callers omit the metric (the reference similarly
skips LPIPS when not eager).

Expected npz keys:
  conv{i}_w [kh, kw, cin, cout], conv{i}_b [cout]  for i in 0..12 (VGG16 convs)
  lin{l}_w  [c_l]                                   for l in 0..4 (LPIPS heads)
"""

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, pool_before) per conv layer.
_VGG_PLAN = [
    (64, False), (64, False),
    (128, True), (128, False),
    (256, True), (256, False), (256, False),
    (512, True), (512, False), (512, False),
    (512, True), (512, False), (512, False),
]
# Feature taps after these conv indexes (relu1_2, 2_2, 3_3, 4_3, 5_3).
_TAPS = [1, 3, 6, 9, 12]

# Input normalization from the LPIPS reference implementation.
_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)


def _vgg_features(weights: Dict[str, jax.Array], x: jax.Array):
  """x: [B, H, W, 3] in [-1, 1]. Returns the 5 tapped feature maps."""
  h = (x - _SHIFT) / _SCALE
  feats = []
  for i, (_, pool_before) in enumerate(_VGG_PLAN):
    if pool_before:
      h = jax.lax.reduce_window(
          h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
      )
    w = weights[f"conv{i}_w"]
    b = weights[f"conv{i}_b"]
    dn = jax.lax.conv_dimension_numbers(h.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    h = jax.lax.conv_general_dilated(
        h, w, (1, 1), "SAME", dimension_numbers=dn
    ) + b
    h = jax.nn.relu(h)
    if i in _TAPS:
      feats.append(h)
  return feats


def _unit_normalize(f: jax.Array, eps: float = 1e-10) -> jax.Array:
  norm = jnp.sqrt(jnp.sum(jnp.square(f), axis=-1, keepdims=True))
  return f / (norm + eps)


def lpips_distance(weights: Dict[str, jax.Array], x255: jax.Array, y255: jax.Array):
  """Per-image LPIPS between [B, H, W, 3] tensors in [0, 255]."""
  x = x255.astype(jnp.float32) / 127.5 - 1.0
  y = y255.astype(jnp.float32) / 127.5 - 1.0
  fx = _vgg_features(weights, x)
  fy = _vgg_features(weights, y)
  total = 0.0
  for l, (a, b) in enumerate(zip(fx, fy)):
    d = jnp.square(_unit_normalize(a) - _unit_normalize(b))  # [B,H,W,C]
    lin = jnp.maximum(weights[f"lin{l}_w"], 0.0)  # nonneg heads
    total = total + jnp.mean(jnp.sum(d * lin, axis=-1), axis=(1, 2))
  return total


def default_weights_path() -> str:
  return os.environ.get(
      "SHALLOW_NTC_LPIPS_WEIGHTS",
      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "lpips_vgg_weights.npz"),
  )


def load_weights(path=None) -> Dict[str, jnp.ndarray]:
  path = path or default_weights_path()
  if not os.path.exists(path):
    raise FileNotFoundError(
        f"LPIPS weights not found at {path}; run "
        "scripts/convert_lpips_weights.py or set SHALLOW_NTC_LPIPS_WEIGHTS."
    )
  with np.load(path) as z:
    weights = {k: jnp.asarray(z[k]) for k in z.files}
  for i in range(len(_VGG_PLAN)):
    assert f"conv{i}_w" in weights, f"missing conv{i}_w in {path}"
  return weights


def make_lpips_fn(path=None):
  """Returns a jitted (x255, y255) -> mean LPIPS callable, or raises."""
  weights = load_weights(path)

  @jax.jit
  def fn(x255, y255):
    return jnp.mean(lpips_distance(weights, x255, y255))

  return fn


def random_weights(rng=None) -> Dict[str, jnp.ndarray]:
  """Random weights with the right shapes -- for shape/jit tests only."""
  rng = np.random.default_rng(0 if rng is None else rng)
  weights = {}
  cin = 3
  for i, (cout, _) in enumerate(_VGG_PLAN):
    weights[f"conv{i}_w"] = jnp.asarray(
        rng.normal(0, 0.05, (3, 3, cin, cout)).astype(np.float32)
    )
    weights[f"conv{i}_b"] = jnp.zeros((cout,), jnp.float32)
    cin = cout
  for l, tap in enumerate(_TAPS):
    c = _VGG_PLAN[tap][0]
    weights[f"lin{l}_w"] = jnp.asarray(
        np.abs(rng.normal(0, 0.01, (c,))).astype(np.float32)
    )
  return weights
