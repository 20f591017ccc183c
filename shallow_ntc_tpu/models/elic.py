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


def _conv(features, kernel, stride=1, transpose=False, dtype=None, name=None):
  if transpose:
    from shallow_ntc_tpu.models.transforms import FastConvTranspose

    return FastConvTranspose(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        use_bias=True,
        kernel_init=_CONV_INIT,
        dtype=dtype,
        name=name,
    )
  from shallow_ntc_tpu.models.transforms import Conv

  # transforms.Conv: nn.Conv-compatible params AND flax auto-name ("Conv_N");
  # carries the (default-off) s2d lowering experiment for tiny-channel
  # strided convs (ops/fast_deconv.strided_conv_s2d).
  return Conv(
      features=features,
      kernel_size=(kernel, kernel),
      strides=(stride, stride),
      use_bias=True,
      kernel_init=_CONV_INIT,
      dtype=dtype,
      name=name,
  )


class ResidualBlock(nn.Module):
  """Cheng-2020 residual block: [1x1 @C/2, 3x3 @C/2, 1x1 @C] + skip.

  `features` must equal the input channel count (the compact version
  inferred it; making it explicit lets the three convs live in setup so the
  fused Pallas path can read their params). Child names stay "Conv_N" for
  checkpoint/converter layout stability.
  """

  features: int
  activation: str = "relu"
  dtype: Optional[Any] = None

  def setup(self):
    c = self.features
    self.conv1 = _conv(c // 2, 1, dtype=self.dtype, name="Conv_0")
    self.conv2 = _conv(c // 2, 3, dtype=self.dtype, name="Conv_1")
    self.conv3 = _conv(c, 1, dtype=self.dtype, name="Conv_2")

  def __call__(self, x: jax.Array) -> jax.Array:
    import os

    assert x.shape[-1] == self.features, (x.shape, self.features)
    act = getattr(jax.nn, self.activation)
    if (
        not self.is_initializing()
        and os.environ.get("SNTC_FUSED_RESBLOCK") == "1"
        and jax.default_backend() in ("tpu", "cpu")
    ):
      # Experimental fused VMEM-resident block (ops/pallas/resblock.py).
      # OFF by default: the XLA chain is HBM-bound (~40% MXU) but the Pallas
      # formulation measured 12.1 ms vs XLA's 2.5 ms per stage-1 block (the
      # f32 roll/concat relayouts dominate; PERF_NOTES round 2), so it is
      # kept as exactness-tested groundwork, not the production path.
      from shallow_ntc_tpu.ops.pallas import resblock as rb

      dtype = self.dtype or x.dtype
      p1 = self.conv1.variables["params"]
      p2 = self.conv2.variables["params"]
      p3 = self.conv3.variables["params"]
      return rb.fused_resblock(
          x.astype(dtype),
          p1["kernel"][0, 0].astype(dtype), p1["bias"],
          p2["kernel"].astype(dtype), p2["bias"],
          p3["kernel"][0, 0].astype(dtype), p3["bias"],
          act_name=self.activation,
      )
    h = act(self.conv1(x))
    h = act(self.conv2(h))
    h = self.conv3(h)
    return x + h



def _use_fused_chain(mod) -> bool:
  """Gate for the fused ResidualBlock-chain kernel (ops/pallas/rb_chain.py).

  Default OFF: opt in with SNTC_FUSED_RB_CHAIN=1 (TPU measurement; on CPU
  the kernel runs in pallas interpret mode for tests). Kept opt-in until the
  kernel's val-shape compile behavior is qualified on the remote compiler —
  a long-running training sweep must not inherit a compile regression."""
  import os

  return (
      not mod.is_initializing()
      and os.environ.get("SNTC_FUSED_RB_CHAIN", "0") == "1"
      and jax.default_backend() in ("tpu", "cpu")
  )


def _chain_params(parent_params, names):
  """Per-block (w1, b1, w2, b2, w3, b3) from bound ResidualBlock subtrees."""
  out = []
  for nm in names:
    p = parent_params[nm]
    out.append(
        (
            p["Conv_0"]["kernel"][0, 0], p["Conv_0"]["bias"],
            p["Conv_1"]["kernel"], p["Conv_1"]["bias"],
            p["Conv_2"]["kernel"][0, 0], p["Conv_2"]["bias"],
        )
    )
  return tuple(out)


def _run_rb_chain(mod, h, names, dtype):
  """Run `names` consecutive ResidualBlocks: fused Pallas chain at apply
  time (one HBM round trip for the whole chain), per-block modules during
  init / when gated off. Submodule names are pinned so the parameter tree
  is identical on both paths (checkpoint/converter layout stability)."""
  if _use_fused_chain(mod):
    from shallow_ntc_tpu.ops.pallas import rb_chain

    params = _chain_params(mod.variables["params"], names)
    if dtype is not None:
      h = h.astype(dtype)
    return rb_chain.fused_rb_chain(h, params, act_name="relu")
  for nm in names:
    h = ResidualBlock(h.shape[-1], dtype=dtype, name=nm)(h)
  return h


class SimpleAttention(nn.Module):
  """Cheng-2020 simplified attention: x + trunk(x) * sigmoid(branch(x))."""

  dtype: Optional[Any] = None

  @nn.compact
  def __call__(self, x: jax.Array) -> jax.Array:
    trunk = _run_rb_chain(
        self, x, [f"ResidualBlock_{i}" for i in range(3)], self.dtype)
    branch = _run_rb_chain(
        self, x, [f"ResidualBlock_{i}" for i in range(3, 6)], self.dtype)
    gate = jax.nn.sigmoid(
        _conv(x.shape[-1], 1, dtype=self.dtype, name="Conv_0")(branch))
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
    rb_counter = [0]

    def res_blocks(h):
      names = [
          f"ResidualBlock_{rb_counter[0] + i}"
          for i in range(self.num_residual_blocks)
      ]
      rb_counter[0] += self.num_residual_blocks
      return _run_rb_chain(self, h, names, self.dtype)

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
    rb_counter = [0]

    def res_blocks(h):
      names = [
          f"ResidualBlock_{rb_counter[0] + i}"
          for i in range(self.num_residual_blocks)
      ]
      rb_counter[0] += self.num_residual_blocks
      return _run_rb_chain(self, h, names, self.dtype)

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
