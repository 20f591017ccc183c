"""ELIC / Cheng-2020 building blocks, TPU-native.

Re-implements the blocks from /root/reference/common/elic.py (itself derived
from the public VCT code) as flax linen modules:

  ResidualBlock    (elic.py:41-68)   1x1 C/2 -> 3x3 C/2 -> 1x1 C, relu, +skip
  SimpleAttention  (elic.py:71-100)  x + trunk(x) * sigmoid-gate(x); note this
                                     is a *local conv gate*, not sequence
                                     attention (SURVEY.md section 2.8)
  ElicAnalysis     (elic.py:103-177) 3-4 stride-2 convs + ResBlocks + 2 gates
  ElicSynthesis    (elic.py:180-250) mirrored deconv stack

All convs are NHWC SAME; the 1x1 convs in ResidualBlock/SimpleAttention lower
to plain channel matmuls on the MXU, and XLA fuses the relu/sigmoid gating
into them.
"""

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

_CONV_INIT = nn.initializers.glorot_uniform()


def _conv(features, kernel, stride=1, transpose=False, dtype=None):
  if transpose:
    from shallow_ntc_tpu.models.transforms import FastConvTranspose

    return FastConvTranspose(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        use_bias=True,
        kernel_init=_CONV_INIT,
        dtype=dtype,
    )
  return nn.Conv(
      features=features,
      kernel_size=(kernel, kernel),
      strides=(stride, stride),
      padding="SAME",
      use_bias=True,
      kernel_init=_CONV_INIT,
      dtype=dtype,
  )


class ResidualBlock(nn.Module):
  """Cheng-2020 residual block: [1x1 @C/2, 3x3 @C/2, 1x1 @C] + skip."""

  activation: str = "relu"
  dtype: Optional[Any] = None

  @nn.compact
  def __call__(self, x: jax.Array) -> jax.Array:
    c = x.shape[-1]
    act = getattr(jax.nn, self.activation)
    h = act(_conv(c // 2, 1, dtype=self.dtype)(x))
    h = act(_conv(c // 2, 3, dtype=self.dtype)(h))
    h = _conv(c, 1, dtype=self.dtype)(h)
    return x + h


class SimpleAttention(nn.Module):
  """Cheng-2020 simplified attention: x + trunk(x) * sigmoid(branch(x))."""

  dtype: Optional[Any] = None

  @nn.compact
  def __call__(self, x: jax.Array) -> jax.Array:
    trunk = x
    for _ in range(3):
      trunk = ResidualBlock(dtype=self.dtype)(trunk)
    branch = x
    for _ in range(3):
      branch = ResidualBlock(dtype=self.dtype)(branch)
    gate = jax.nn.sigmoid(_conv(x.shape[-1], 1, dtype=self.dtype)(branch))
    return x + trunk * gate


class ElicAnalysis(nn.Module):
  """ELIC (He 2022) analysis transform; paper channels (192, 192, 192, 320).

  Layer order matches reference elic.py:147-161: for 4 conv layers -
  conv0, RBs, conv1, RBs, attention, conv2, RBs, conv3, attention.
  """

  num_residual_blocks: int = 3
  channels: Tuple[int, ...] = (128, 160, 192, 192)
  kernel_sizes: Tuple[int, ...] = (5, 5, 5, 5)
  strides: Tuple[int, ...] = (2, 2, 2, 2)
  output_channels: Optional[int] = None
  dtype: Optional[Any] = None

  def __post_init__(self):
    super().__post_init__()
    if len(self.channels) not in (3, 4):
      raise ValueError(f"ELIC uses 3 or 4 conv layers (not {self.channels}).")
    assert len(self.channels) == len(self.strides) == len(self.kernel_sizes)
    if self.output_channels is not None and self.output_channels != self.channels[-1]:
      raise ValueError(
          "output_channels specified but does not match channels: "
          f"{self.output_channels} vs. {self.channels}"
      )

  @property
  def downsample_factor(self):
    return 2 ** len(self.channels)

  @property
  def output_depth(self):
    return self.channels[-1]

  @nn.compact
  def __call__(self, x: jax.Array, training: bool = False) -> jax.Array:
    del training
    convs = list(zip(self.channels, self.kernel_sizes, self.strides))

    def res_blocks(h):
      for _ in range(self.num_residual_blocks):
        h = ResidualBlock(dtype=self.dtype)(h)
      return h

    if len(convs) == 4:
      c, k, s = convs[0]
      x = _conv(c, k, s, dtype=self.dtype)(x)
      x = res_blocks(x)
    c, k, s = convs[-3]
    x = _conv(c, k, s, dtype=self.dtype)(x)
    x = res_blocks(x)
    x = SimpleAttention(dtype=self.dtype)(x)
    c, k, s = convs[-2]
    x = _conv(c, k, s, dtype=self.dtype)(x)
    x = res_blocks(x)
    c, k, s = convs[-1]
    x = _conv(c, k, s, dtype=self.dtype)(x)
    x = SimpleAttention(dtype=self.dtype)(x)
    return x


class ElicSynthesis(nn.Module):
  """ELIC synthesis transform (registered for parity; unused by the shallow
  decoder configs, reference elic.py:180-250)."""

  num_residual_blocks: int = 3
  channels: Tuple[int, ...] = (192, 160, 128, 3)
  kernel_sizes: Tuple[int, ...] = (5, 5, 5, 5)
  strides: Tuple[int, ...] = (2, 2, 2, 2)
  output_channels: Optional[int] = None
  dtype: Optional[Any] = None

  def __post_init__(self):
    super().__post_init__()
    if len(self.channels) not in (3, 4):
      raise ValueError(f"ELIC uses 3 or 4 conv layers (not {self.channels}).")
    assert len(self.channels) == len(self.strides) == len(self.kernel_sizes)
    if self.output_channels is not None and self.output_channels != self.channels[-1]:
      raise ValueError(
          "output_channels specified but does not match channels: "
          f"{self.output_channels} vs. {self.channels}"
      )

  @property
  def upsample_factor(self):
    return 2 ** len(self.channels)

  @property
  def output_depth(self):
    return self.channels[-1]

  @nn.compact
  def __call__(self, x: jax.Array, training: bool = False) -> jax.Array:
    del training
    convs = list(zip(self.channels, self.kernel_sizes, self.strides))

    def res_blocks(h):
      for _ in range(self.num_residual_blocks):
        h = ResidualBlock(dtype=self.dtype)(h)
      return h

    x = SimpleAttention(dtype=self.dtype)(x)
    c, k, s = convs[0]
    x = _conv(c, k, s, transpose=True, dtype=self.dtype)(x)
    x = res_blocks(x)
    c, k, s = convs[1]
    x = _conv(c, k, s, transpose=True, dtype=self.dtype)(x)
    x = SimpleAttention(dtype=self.dtype)(x)
    x = res_blocks(x)
    c, k, s = convs[2]
    x = _conv(c, k, s, transpose=True, dtype=self.dtype)(x)
    if len(convs) == 4:
      x = res_blocks(x)
      c, k, s = convs[3]
      x = _conv(c, k, s, transpose=True, dtype=self.dtype)(x)
    return x
