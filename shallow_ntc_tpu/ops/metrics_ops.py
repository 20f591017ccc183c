"""Image math: padding, PSNR/MSE, SSIM / MS-SSIM -- all jittable on TPU.

JAX equivalents of /root/reference/common/image_utils.py plus the quality
metrics the reference pulled from tf.image (mshyper/models.py:322-332). The
MS-SSIM implementation follows Wang et al. 2003 with the tf.image defaults
(11x11 Gaussian, sigma 1.5, k1=.01, k2=.03, the standard 5 power factors and
VALID-windowed statistics), so values are comparable to the reference's
published numbers. Everything here is static-shaped and fuses on the VPU.
"""

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def quantize_image(x: jax.Array) -> jax.Array:
  """Round and saturate-cast to uint8 (reference image_utils.py:22-23)."""
  return jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8)


def mse_psnr(x: jax.Array, y: jax.Array, max_val: float = 255.0):
  """Per-image MSE and PSNR over a [B, H, W, C] batch (image_utils.py:26-38)."""
  x = x.astype(jnp.float32)
  y = y.astype(jnp.float32)
  axes = tuple(range(1, x.ndim))
  mses = jnp.mean(jnp.square(x - y), axis=axes)
  psnrs = -10.0 * (jnp.log(mses) - 2.0 * jnp.log(max_val)) / math.log(10.0)
  return mses, psnrs


def pad_images(x: jax.Array, div: int, mode: str = "reflect") -> jax.Array:
  """Reflect-pad bottom/right so H and W are divisible by `div`.

  Static-shape version of image_utils.py:41-66: shapes are known at trace
  time under jit, so the padding amounts are Python ints and XLA sees a
  fixed pad op.
  """
  _, h, w, _ = x.shape
  ph = (-h) % div
  pw = (-w) % div
  if ph == 0 and pw == 0:
    return x
  return jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode=mode)


def unpad_images(x: jax.Array, unpadded_shape) -> jax.Array:
  """Crop back to the original (top-left) extent (image_utils.py:69-71)."""
  return x[:, : unpadded_shape[1], : unpadded_shape[2], :]


def center_crop_image(image: jax.Array, target_height: int, target_width: int):
  """Center crop; works on [..., H, W, C] (image_utils.py:6-19)."""
  h = image.shape[-3]
  w = image.shape[-2]
  h0 = (h - target_height) // 2
  w0 = (w - target_width) // 2
  return image[..., h0 : h0 + target_height, w0 : w0 + target_width, :]


def visualize_image_batch(images, crop_to_max_dim: Optional[int] = None, ncol=None):
  """Tile a [B, H, W, C] batch into one [H', W', C] grid image (utils.py:29-55)."""
  images = np.asarray(images)
  if (
      crop_to_max_dim
      and images.shape[1] > crop_to_max_dim
      and images.shape[2] > crop_to_max_dim
  ):
    images = np.asarray(
        center_crop_image(images, crop_to_max_dim, crop_to_max_dim)
    )
  batch_size = images.shape[0]
  if ncol is None:
    ncol = int(math.ceil(math.sqrt(batch_size)))
    while batch_size % ncol:
      ncol -= 1
    nrow = batch_size // ncol
    ncol, nrow = min(ncol, nrow), max(ncol, nrow)
    ncol, nrow = nrow, ncol  # wider than tall, like the reference's divisors
  else:
    nrow = batch_size // ncol
    assert nrow * ncol == batch_size
  h, w = images.shape[1], images.shape[2]
  grid = images.reshape(nrow, ncol, h, w, -1)
  grid = grid.swapaxes(1, 2).reshape(nrow * h, ncol * w, -1)
  return grid


# ---------------------------------------------------------------------------
# SSIM / MS-SSIM
# ---------------------------------------------------------------------------
_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
  coords = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
  g = jnp.exp(-(coords**2) / (2.0 * sigma**2))
  g = g / jnp.sum(g)
  return g


def _filter2d_valid(x: jax.Array, kernel1d: jax.Array) -> jax.Array:
  """Separable depthwise Gaussian filtering (VALID) on [B, H, W, C]."""
  c = x.shape[-1]
  k = kernel1d.shape[0]
  dn = jax.lax.conv_dimension_numbers(x.shape, (1, k, 1, c), ("NHWC", "HWIO", "NHWC"))
  k_row = jnp.tile(kernel1d.reshape(1, k, 1, 1), (1, 1, 1, c))  # filter along W
  k_col = jnp.tile(kernel1d.reshape(k, 1, 1, 1), (1, 1, 1, c))  # filter along H
  # Always filter in full f32: under jax_default_matmul_precision=default
  # (bf16 passes) the moment convs lose ~3 decimal digits, and the
  # E[x^2] - E[x]^2 cancellation then yields cs terms > 1 or < 0 --
  # observed as MS-SSIM trajectories above 1.0 (and relu-collapsed images)
  # in SGA itinf runs. Metric cost is negligible; correctness is not.
  x = jax.lax.conv_general_dilated(
      x, k_row, window_strides=(1, 1), padding="VALID",
      dimension_numbers=dn, feature_group_count=c,
      precision=jax.lax.Precision.HIGHEST,
  )
  x = jax.lax.conv_general_dilated(
      x, k_col, window_strides=(1, 1), padding="VALID",
      dimension_numbers=dn, feature_group_count=c,
      precision=jax.lax.Precision.HIGHEST,
  )
  return x


def _ssim_luminance_cs(
    x: jax.Array, y: jax.Array, max_val: float, filter_size: int = 11,
    filter_sigma: float = 1.5, k1: float = 0.01, k2: float = 0.02 * 1.5,
) -> Tuple[jax.Array, jax.Array]:
  """Mean luminance and contrast-structure terms over VALID windows.

  Returns per-image (luminance, cs), each of shape [B].
  """
  c1 = (k1 * max_val) ** 2
  c2 = (k2 * max_val) ** 2
  kernel = _gaussian_kernel(filter_size, filter_sigma)

  mu_x = _filter2d_valid(x, kernel)
  mu_y = _filter2d_valid(y, kernel)
  mu_xx = _filter2d_valid(x * x, kernel)
  mu_yy = _filter2d_valid(y * y, kernel)
  mu_xy = _filter2d_valid(x * y, kernel)

  var_x = mu_xx - mu_x * mu_x
  var_y = mu_yy - mu_y * mu_y
  cov_xy = mu_xy - mu_x * mu_y

  lum = (2.0 * mu_x * mu_y + c1) / (mu_x * mu_x + mu_y * mu_y + c1)
  cs = (2.0 * cov_xy + c2) / (var_x + var_y + c2)
  axes = tuple(range(1, x.ndim))
  return jnp.mean(lum, axis=axes), jnp.mean(cs, axis=axes)


def ssim(x: jax.Array, y: jax.Array, max_val: float = 255.0) -> jax.Array:
  """Per-image SSIM over [B, H, W, C] (tf.image.ssim defaults)."""
  x = x.astype(jnp.float32)
  y = y.astype(jnp.float32)
  lum, cs = _ssim_luminance_cs(x, y, max_val, k2=0.03)
  return lum * cs


def _downsample2x(x: jax.Array) -> jax.Array:
  """2x2 average pooling (stride 2), padding bottom/right to even dims."""
  _, h, w, _ = x.shape
  x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)), mode="symmetric")
  return jax.lax.reduce_window(
      x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
  ) / 4.0


def msssim(x: jax.Array, y: jax.Array, max_val: float = 255.0) -> jax.Array:
  """Per-image multi-scale SSIM over [B, H, W, C] (Wang 2003 / tf defaults).

  Requires min(H, W) >= 11 * 2^4 = 176 after 4 downsamplings; for smaller
  images call `ssim` instead (the reference applies the same fallback below
  160px, mshyper/models.py:325-329).
  """
  x = x.astype(jnp.float32)
  y = y.astype(jnp.float32)
  mcs = []
  lum = None
  for scale in range(len(_MSSSIM_WEIGHTS)):
    lum, cs = _ssim_luminance_cs(x, y, max_val, k2=0.03)
    mcs.append(jax.nn.relu(cs))
    if scale < len(_MSSSIM_WEIGHTS) - 1:
      x = _downsample2x(x)
      y = _downsample2x(y)
  mcs_stack = jnp.stack(mcs[:-1], axis=0)  # [4, B]
  weights = jnp.asarray(_MSSSIM_WEIGHTS, jnp.float32)
  cs_part = jnp.prod(mcs_stack ** weights[:-1, None], axis=0)
  ssim_last = jax.nn.relu(lum) * mcs[-1]
  return cs_part * ssim_last ** weights[-1]


def msssim_or_ssim(x: jax.Array, y: jax.Array, max_val: float = 255.0) -> jax.Array:
  """MS-SSIM, falling back to SSIM for images smaller than 160px on both sides.

  Static-shape dispatch mirroring mshyper/models.py:322-329.
  """
  h, w = x.shape[1], x.shape[2]
  if h < 160 and w < 160:
    return ssim(x, y, max_val)
  return msssim(x, y, max_val)
