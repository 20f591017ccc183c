"""NN transforms: the architectural menu of the framework.

TPU-native (flax linen, NHWC) re-implementations of every transform in
/root/reference/common/transforms.py, registered under the *same class names*
so existing `transform_config` dicts (the de-facto public API, SURVEY.md
section 5 "Config system") work unchanged:

  BLS2017Analysis/Synthesis      (transforms.py:93-134)
  MBT2018Analysis/Synthesis      (transforms.py:137-175)
  CNNAnalysis/CNNSynthesis       (transforms.py:179-206)
  HyperAnalysis/HyperSynthesis   (transforms.py:209-232)
  HyperAnalysisSmall/...Small    (transforms.py:235-262)
  JPEGLikeSynthesis              (transforms.py:265-295)
  TwoLayerSynthesis              (transforms.py:298-317)
  TwoLayerResSynthesis           (transforms.py:320-361)
  JPEGLikeHyperSynthesis         (transforms.py:364-377)
  ElicAnalysis/ElicSynthesis     (elic.py, re-exported here)

TPU-first design notes:
  * NHWC layout + SAME padding throughout; flax's SAME conv-transpose padding
    is geometry-identical to TF Keras Conv2DTranspose SAME for every (k, s)
    used here (k13s8, k5s2, k16s16, k18s16, k6s4, k3s1), so checkpoint
    conversion only needs a kernel flip/transpose.
  * GDN's normalization pool is a channels x channels matmul (MXU) fused with
    the elementwise |x|^alpha / ^epsilon (VPU) by XLA.
  * Shape/depth inference is *static* (class properties), replacing the
    reference's dummy-image tracing (mshyper/models.py:111-140) and fixing its
    missing `get_bottleneck_size` helper (factorized/models.py:24, a known
    ImportError at reference HEAD).
"""

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from shallow_ntc_tpu.ops.math import lower_bound
from shallow_ntc_tpu.utils.registry import ClassBuilder

Dtype = Any

_CONV_INIT = nn.initializers.glorot_uniform()


# ---------------------------------------------------------------------------
# GDN
# ---------------------------------------------------------------------------
_GDN_PEDESTAL = 2.0**-18


def _nonneg_init(value: float):
  def init(rng, shape, dtype=jnp.float32):
    return jnp.full(shape, math.sqrt(value + _GDN_PEDESTAL), dtype)

  return init


def _gamma_init(scale: float = 0.1):
  def init(rng, shape, dtype=jnp.float32):
    eye = jnp.eye(shape[0], dtype=dtype) * scale
    return jnp.sqrt(eye + _GDN_PEDESTAL)

  return init


def _nonneg(param: jax.Array, minimum: float = 0.0) -> jax.Array:
  """tfc GDNParameter sqrt-reparameterization: value = max(p, bound)^2 - pedestal."""
  bound = math.sqrt(minimum + _GDN_PEDESTAL)
  return jnp.square(lower_bound(param, bound)) - _GDN_PEDESTAL


class GDN(nn.Module):
  """Generalized divisive normalization (Balle 2016).

  y_i = x_i / (beta_i + sum_j gamma_ji |x_j|^alpha)^epsilon
  Classic GDN has (alpha, epsilon) = (2, 0.5); GDN1 (Johnston 2018 / the
  reference's GDN1, transforms.py:8-63) pins (1, 1). The channel mixing is a
  single (C, C) matmul over the flattened spatial dims - ideal MXU shape.
  """

  inverse: bool = False
  alpha: float = 1.0
  epsilon: float = 1.0
  rectify: bool = False
  dtype: Optional[Dtype] = None

  @nn.compact
  def __call__(self, x: jax.Array) -> jax.Array:
    c = x.shape[-1]
    beta = _nonneg(self.param("beta", _nonneg_init(1.0), (c,)), 1e-6)
    gamma = _nonneg(self.param("gamma", _gamma_init(0.1), (c, c)), 0.0)
    dtype = self.dtype or x.dtype
    beta = beta.astype(dtype)
    gamma = gamma.astype(dtype)
    if self.rectify:
      x = jax.nn.relu(x)
    if self.alpha == 1.0:
      pool = jnp.abs(x)
    elif self.alpha == 2.0:
      pool = jnp.square(x)
    else:
      pool = jnp.abs(x) ** self.alpha
    norm = jnp.einsum("...j,jc->...c", pool, gamma, preferred_element_type=dtype) + beta
    if self.epsilon == 0.5:
      norm = jnp.sqrt(norm)
    elif self.epsilon != 1.0:
      norm = norm**self.epsilon
    return x * norm if self.inverse else x / norm


class GDN1(GDN):
  """GDN pinned to alpha=1, epsilon=1 (reference transforms.py:8-63)."""

  alpha: float = 1.0
  epsilon: float = 1.0


class PReLU(nn.Module):
  """Parametric ReLU with a per-channel learned negative slope."""

  negative_slope_init: float = 0.25

  @nn.compact
  def __call__(self, x: jax.Array) -> jax.Array:
    slope = self.param(
        "negative_slope",
        lambda rng, shape: jnp.full(shape, self.negative_slope_init, jnp.float32),
        (x.shape[-1],),
    )
    return jnp.where(x >= 0, x, x * slope.astype(x.dtype))


def make_activation(name: Optional[str]):
  """Activation factory mirroring reference get_activation_op (transforms.py:66-78).

  Returns either a parameterless callable or a linen Module (GDN/PReLU);
  callers instantiate modules inside setup so params land in the pytree.
  """
  if name is None:
    return None
  if callable(name):
    return name
  lowered = name.lower()
  if lowered == "prelu":
    return PReLU()
  if lowered in ("gdn", "gdn1"):
    return GDN1()
  if lowered in ("igdn", "igdn1"):
    return GDN1(inverse=True)
  if lowered in ("lrelu", "leaky_relu"):
    # The reference resolves 'lrelu' to tf.nn.leaky_relu whose default slope
    # is 0.2 (transforms.py:77-78); jax.nn.leaky_relu defaults to 0.01.
    import functools

    return functools.partial(jax.nn.leaky_relu, negative_slope=0.2)
  fn = getattr(jax.nn, lowered, None)
  if fn is None:
    raise ValueError(f"Unknown activation: {name}")
  return fn


class Conv(nn.Module):
  """SAME strided conv, s2d-packed when the input channel count is tiny.

  NOTE on the name: flax auto-names inline submodules by class name, and the
  checkpoint layout (orbax trees, utils/tf_convert manifests) uses the
  "Conv_N" paths that inline nn.Conv modules produced — this class is named
  `Conv` so those paths stay stable.

  Parameter-compatible with nn.Conv (kernel [k, k, in, out], bias). An
  image-space stride-2 conv on 3 channels contracts K = k*k*3 per output --
  measured ~7% MXU utilization for ELIC's first conv. Packing the input
  space-to-depth first turns it into a dense stride-1 conv with K = s^2 * 3
  per tap on a s^2-smaller grid (ops/fast_deconv.strided_conv_s2d),
  numerically identical. Wide-channel or stride-1 convs use the plain lax
  SAME conv (XLA already tiles those well).
  """

  features: int
  kernel_size: Tuple[int, int] = (5, 5)
  strides: Tuple[int, int] = (2, 2)
  use_bias: bool = True
  kernel_init: Any = _CONV_INIT
  dtype: Optional[Dtype] = None

  @nn.compact
  def __call__(self, x: jax.Array) -> jax.Array:
    from shallow_ntc_tpu.ops import fast_deconv as fd

    k = self.kernel_size[0]
    s = self.strides[0]
    assert self.kernel_size[0] == self.kernel_size[1]
    assert self.strides[0] == self.strides[1]
    kernel = self.param(
        "kernel", self.kernel_init, (k, k, x.shape[-1], self.features)
    )
    bias = (
        self.param("bias", nn.initializers.zeros, (self.features,))
        if self.use_bias
        else None
    )
    import os

    dtype = self.dtype or x.dtype
    x = x.astype(dtype)
    kernel = kernel.astype(dtype)
    if (
        s > 1
        and os.environ.get("SNTC_S2D_CONV") == "1"
        and x.shape[-1] <= 16
        and x.shape[1] % s == 0
        and x.shape[2] % s == 0
    ):
      # Experimental, OFF by default: packing was expected to cure the
      # first conv's lane waste (K=75 at ~7% MXU), but the image-space
      # space_to_depth rearrangement costs more than the conv saves
      # (measured 3.0 ms vs 1.76 ms plain at 8x512x768; PERF_NOTES round 2).
      return fd.strided_conv_s2d(x, kernel, bias, s)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
    )
    if s == 1 and x.shape[-1] >= 32:
      from shallow_ntc_tpu.ops import int8ops

      if int8ops.encode_enabled():
        # Int8 analysis-side path (SNTC_INT8_ENCODE): the ELIC RB chains are
        # HBM-bound at bf16 (~73% HBM BW, PERF_NOTES), so int8 activations
        # halve the bytes and double the MXU rate. Measured 1.29x on the
        # stage-1 RB chain. Inference-only; wide stride-1 convs only (the
        # strided stem convs stay float).
        out = int8ops.conv_s1_int8(x, kernel, "SAME", dn, x.dtype)
        return out if bias is None else out + bias.astype(out.dtype)
    out = jax.lax.conv_general_dilated(
        x, kernel, (s, s), "SAME", dimension_numbers=dn
    )
    return out if bias is None else out + bias.astype(out.dtype)


FastStridedConv = Conv  # descriptive alias


def _conv(features, kernel, stride, dtype=None):
  return Conv(
      features=features,
      kernel_size=(kernel, kernel),
      strides=(stride, stride),
      use_bias=True,
      kernel_init=_CONV_INIT,
      dtype=dtype,
  )


class FastConvTranspose(nn.Module):
  """SAME transposed conv via the subpixel phase decomposition.

  Parameter-compatible with nn.ConvTranspose (kernel [k, k, in, out], bias),
  but computed as a dense stride-1 conv + depth_to_space
  (ops/fast_deconv.py): numerically identical and an order of magnitude
  faster on TPU than XLA's input-dilated conv_transpose lowering (measured
  <10% MXU utilization for the k13s8 / k5s2 decoders via lax.conv_transpose).
  """

  features: int
  kernel_size: Tuple[int, int] = (5, 5)
  strides: Tuple[int, int] = (2, 2)
  use_bias: bool = True
  kernel_init: Any = _CONV_INIT
  dtype: Optional[Dtype] = None

  @nn.compact
  def __call__(self, x: jax.Array) -> jax.Array:
    from shallow_ntc_tpu.ops.fast_deconv import fast_conv_transpose

    k = self.kernel_size[0]
    assert self.kernel_size[0] == self.kernel_size[1]
    assert self.strides[0] == self.strides[1]
    kernel = self.param(
        "kernel", self.kernel_init, (k, k, x.shape[-1], self.features)
    )
    bias = (
        self.param("bias", nn.initializers.zeros, (self.features,))
        if self.use_bias
        else None
    )
    dtype = self.dtype or x.dtype
    x = x.astype(dtype)
    kernel = kernel.astype(dtype)
    return fast_conv_transpose(x, kernel, bias, self.strides[0])


def _deconv(features, kernel, stride, use_bias=True, dtype=None):
  return FastConvTranspose(
      features=features,
      kernel_size=(kernel, kernel),
      strides=(stride, stride),
      use_bias=use_bias,
      kernel_init=_CONV_INIT,
      dtype=dtype,
  )


class _ConvStack(nn.Module):
  """Sequential (conv|deconv, activation) stack."""

  layer_specs: Tuple[Tuple[int, int, int, Optional[str], bool], ...]
  # each: (features, kernel, stride, activation_name, transpose)
  dtype: Optional[Dtype] = None

  def setup(self):
    convs, acts = [], []
    for features, kernel, stride, act, transpose in self.layer_specs:
      maker = _deconv if transpose else _conv
      convs.append(maker(features, kernel, stride, dtype=self.dtype))
      acts.append(make_activation(act))
    self.convs = convs
    self.acts = acts

  def __call__(self, x: jax.Array) -> jax.Array:
    for conv, act in zip(self.convs, self.acts):
      x = conv(x)
      if act is not None:
        x = act(x)
    return x


# ---------------------------------------------------------------------------
# Analysis / synthesis transforms (reference class-name parity)
# ---------------------------------------------------------------------------
class BLS2017Analysis(nn.Module):
  """Balle 2017 analysis: 9x9s4 + 5x5s2 + 5x5s2, GDN between (ref :93-113)."""

  num_filters: int
  dtype: Optional[Dtype] = None

  downsample_factor = 16

  @property
  def output_depth(self):
    return self.num_filters

  def setup(self):
    self.stack = _ConvStack(
        (
            (self.num_filters, 9, 4, "gdn", False),
            (self.num_filters, 5, 2, "gdn", False),
            (self.num_filters, 5, 2, None, False),
        ),
        dtype=self.dtype,
    )

  def __call__(self, x, training=False):
    return self.stack(x)


class BLS2017Synthesis(nn.Module):
  """Balle 2017 synthesis: mirrored IGDN deconvs (ref :115-134)."""

  num_filters: int
  dtype: Optional[Dtype] = None

  upsample_factor = 16
  output_depth = 3

  def setup(self):
    self.stack = _ConvStack(
        (
            (self.num_filters, 5, 2, "igdn", True),
            (self.num_filters, 5, 2, "igdn", True),
            (3, 9, 4, None, True),
        ),
        dtype=self.dtype,
    )

  def __call__(self, x, training=False):
    return self.stack(x)


class MBT2018Analysis(nn.Module):
  """Minnen 2018 analysis: n_layers x (5x5 s2 conv + GDN) (ref :137-155)."""

  channels_base: int
  n_layers: int = 4
  output_channels: Optional[int] = None
  dtype: Optional[Dtype] = None

  @property
  def downsample_factor(self):
    return 2**self.n_layers

  @property
  def output_depth(self):
    return self.output_channels if self.output_channels is not None else self.channels_base

  def setup(self):
    specs = []
    for i in range(self.n_layers):
      last = i + 1 == self.n_layers
      ch = self.output_depth if last else self.channels_base
      # classic GDN (alpha=2, eps=.5) like tfc.GDN defaults
      specs.append((ch, 5, 2, None if last else "classic_gdn", False))
    self.convs = [_conv(s[0], s[1], s[2], dtype=self.dtype) for s in specs]
    self.acts = [
        None if s[3] is None else GDN(alpha=2.0, epsilon=0.5) for s in specs
    ]

  def __call__(self, x, training=False):
    for conv, act in zip(self.convs, self.acts):
      x = conv(x)
      if act is not None:
        x = act(x)
    return x


class MBT2018Synthesis(nn.Module):
  """Minnen 2018 synthesis: n_layers x (5x5 s2 deconv + IGDN) (ref :158-175)."""

  channels_base: int
  n_layers: int = 4
  output_channels: int = 3
  dtype: Optional[Dtype] = None

  @property
  def upsample_factor(self):
    return 2**self.n_layers

  @property
  def output_depth(self):
    return self.output_channels if self.output_channels is not None else self.channels_base

  def setup(self):
    convs, acts = [], []
    for i in range(self.n_layers):
      last = i + 1 == self.n_layers
      ch = self.output_depth if last else self.channels_base
      convs.append(_deconv(ch, 5, 2, dtype=self.dtype))
      acts.append(None if last else GDN(alpha=2.0, epsilon=0.5, inverse=True))
    self.convs = convs
    self.acts = acts

  def __call__(self, x, training=False):
    for conv, act in zip(self.convs, self.acts):
      x = conv(x)
      if act is not None:
        x = act(x)
    return x


class CNNAnalysis(nn.Module):
  """Four-layer plain-conv analysis (ref :179-192)."""

  channels_base: int
  output_channels: Optional[int] = None
  activation_type: str = "leaky_relu"
  dtype: Optional[Dtype] = None

  downsample_factor = 16

  @property
  def output_depth(self):
    return self.output_channels if self.output_channels is not None else self.channels_base

  def setup(self):
    cb = self.channels_base
    a = self.activation_type
    self.stack = _ConvStack(
        (
            (cb, 5, 2, a, False),
            (cb, 5, 2, a, False),
            (cb, 5, 2, a, False),
            (self.output_depth, 5, 2, None, False),
        ),
        dtype=self.dtype,
    )

  def __call__(self, x, training=False):
    return self.stack(x)


class CNNSynthesis(nn.Module):
  """Four-layer plain-deconv synthesis (ref :195-206)."""

  channels_base: int
  output_channels: int = 3
  activation_type: str = "leaky_relu"
  dtype: Optional[Dtype] = None

  upsample_factor = 16

  @property
  def output_depth(self):
    return self.output_channels

  def setup(self):
    cb = self.channels_base
    a = self.activation_type
    self.stack = _ConvStack(
        (
            (cb, 5, 2, a, True),
            (cb, 5, 2, a, True),
            (cb, 5, 2, a, True),
            (self.output_channels, 5, 2, None, True),
        ),
        dtype=self.dtype,
    )

  def __call__(self, x, training=False):
    return self.stack(x)


class HyperAnalysis(nn.Module):
  """Hyper-encoder: k3s1 + 2 x k5s2 (ref :209-219)."""

  bottleneck_size: int
  activation_type: str = "relu"
  dtype: Optional[Dtype] = None

  downsample_factor = 4

  @property
  def output_depth(self):
    return self.bottleneck_size

  def setup(self):
    b = self.bottleneck_size
    a = self.activation_type
    self.stack = _ConvStack(
        ((b, 3, 1, a, False), (b, 5, 2, a, False), (b, 5, 2, None, False)),
        dtype=self.dtype,
    )

  def __call__(self, x, training=False):
    return self.stack(x)


class HyperSynthesis(nn.Module):
  """Hyper-decoder: 2 x k5s2 deconv + k3s1 to 2*bottleneck (mu, sigma) (ref :222-232)."""

  bottleneck_size: int
  activation_type: str = "relu"
  dtype: Optional[Dtype] = None

  upsample_factor = 4

  @property
  def output_depth(self):
    return self.bottleneck_size * 2

  def setup(self):
    b = self.bottleneck_size
    a = self.activation_type
    self.stack = _ConvStack(
        (
            (b, 5, 2, a, True),
            (int(b * 1.5), 5, 2, a, True),
            (b * 2, 3, 1, None, True),
        ),
        dtype=self.dtype,
    )

  def __call__(self, x, training=False):
    return self.stack(x)


class HyperAnalysisSmall(nn.Module):
  """2-layer hyper-encoder for small images (ref :235-247)."""

  bottleneck_size: int
  dtype: Optional[Dtype] = None

  downsample_factor = 2

  @property
  def output_depth(self):
    return self.bottleneck_size

  def setup(self):
    b = self.bottleneck_size
    self.stack = _ConvStack(
        ((b, 3, 1, "relu", False), (b, 5, 2, None, False)), dtype=self.dtype
    )

  def __call__(self, x, training=False):
    return self.stack(x)


class HyperSynthesisSmall(nn.Module):
  """2-layer hyper-decoder for small images (ref :250-262)."""

  bottleneck_size: int
  dtype: Optional[Dtype] = None

  upsample_factor = 2

  @property
  def output_depth(self):
    return self.bottleneck_size * 2

  def setup(self):
    b = self.bottleneck_size
    self.stack = _ConvStack(
        (
            (int(b * 1.5), 5, 2, "relu", True),
            (int(b * 2), 3, 1, None, True),
        ),
        dtype=self.dtype,
    )

  def __call__(self, x, training=False):
    return self.stack(x)


class JPEGLikeSynthesis(nn.Module):
  """Single-deconv synthesis: one affine map latent-vector -> kxk x 3 patch (ref :265-295).

  With kernel_size == strides this is exactly a (C_in -> k*k*3) matmul
  followed by depth_to_space - the MXU-optimal decode path; the Pallas/fast
  path in ops/pallas exploits that. kernel_size=18 (paper) adds a 2px
  overlap-add border.
  """

  output_channels: int = 3
  kernel_size: int = 16
  strides: int = 16
  padding: str = "SAME"
  use_bias: bool = True
  use_offset: bool = False
  use_pallas: bool = False
  dtype: Optional[Dtype] = None

  @property
  def upsample_factor(self):
    return self.strides

  @property
  def output_depth(self):
    return self.output_channels

  def setup(self):
    self.conv = _deconv(
        self.output_channels, self.kernel_size, self.strides,
        use_bias=self.use_bias, dtype=self.dtype,
    )

  def __call__(self, x, training=False):
    if self.use_offset:
      ones = jnp.ones(x.shape[:-1] + (1,), x.dtype)
      x = jnp.concatenate([x, ones], axis=-1)
    if (
        self.use_pallas
        and self.kernel_size == self.strides
        and not self.is_initializing()
    ):
      # Fused Pallas matmul + depth-to-space path (bit-exact vs the conv;
      # see ops/pallas/jpegl_decode.py). Params stay on the conv submodule
      # so checkpoints are interchangeable between paths.
      from shallow_ntc_tpu.ops.pallas.jpegl_decode import jpegl_synthesize

      variables = self.conv.variables["params"]
      kernel = variables["kernel"]
      bias = variables.get("bias") if self.use_bias else None
      return jpegl_synthesize(x, kernel, bias)
    return self.conv(x)


def _final_deconv_packed(mid_p, kernel, bias, s1, s2, mid_channels,
                         allow_pallas=True):
  """Final small deconv from phase space, picking the fastest valid lowering:

  1. Pallas sparse-phase kernel (ops/pallas/twolayer_final.py): contracts
     only the needed input phase blocks -- 2x faster than the dense packed
     conv on TPU. Applies to the flagship geometry (s1=8, s2=2, k<=7,
     even batch, 8*c_in <= 128 lanes). Differentiable via a custom VJP that
     backpropagates through the exact XLA formulation, so training and itinf
     use it too.
  2. Fully-packed dense conv (packed_conv_transpose): the final conv runs on
     the lane-dense phase tensor (~80% MXU on redundant FLOPs).
  3. Plain subpixel path for wide-channel mid tensors.
  """
  from shallow_ntc_tpu.ops import fast_deconv as fd

  if (
      allow_pallas
      and s1 * mid_channels <= 128  # one padded 128-lane block per phase
      and s1 == 8
      and s2 == 2
      and kernel.shape[0] <= 7
      # batch pairs, or two-row cells for odd batch (per-image eval)
      and (mid_p.shape[0] % 2 == 0 or mid_p.shape[1] % 2 == 0)
      and jax.default_backend() in ("tpu", "cpu")
  ):
    from shallow_ntc_tpu.ops.pallas.twolayer_final import final_deconv_phase

    return final_deconv_phase(mid_p, kernel, bias, c_in=mid_channels)
  pack = s1 if mid_channels < 64 else 1
  if pack > 1:
    mid_packed = fd.partial_depth_to_space(mid_p, s1, pack)
    return fd.packed_conv_transpose(mid_packed, kernel, bias, s2, pack)
  mid = fd.depth_to_space(mid_p, s1)
  return fd.fast_conv_transpose(mid, kernel, bias, s2)


def _apply_act_phase(act, x_p, num_phases, dtype):
  """Apply an activation to a phase-space tensor [.., num_phases*C]."""
  if act is None:
    return x_p
  if isinstance(act, GDN):
    from shallow_ntc_tpu.ops import fast_deconv as fd

    p = act.variables["params"]
    beta = _nonneg(p["beta"], 1e-6).astype(dtype)
    gamma = _nonneg(p["gamma"], 0.0).astype(dtype)
    return fd.gdn_phase(
        x_p, beta, gamma, num_phases, act.inverse, act.alpha, act.epsilon
    )
  return act(x_p)  # pointwise activations are phase-agnostic


class TwoLayerSynthesis(nn.Module):
  """Two deconvs with an optional activation between (ref :298-317)."""

  channels: Tuple[int, int] = (24, 3)
  strides: Tuple[int, int] = (8, 2)
  kernel_sizes: Tuple[int, int] = (13, 5)
  activation_type: str = "igdn"
  dtype: Optional[Dtype] = None

  fused: bool = True

  @property
  def upsample_factor(self):
    return self.strides[0] * self.strides[1]

  @property
  def output_depth(self):
    return self.channels[-1]

  def setup(self):
    self.conv1 = _deconv(
        self.channels[0], self.kernel_sizes[0], self.strides[0], dtype=self.dtype
    )
    self.act = make_activation(self.activation_type)
    self.conv2 = _deconv(
        self.channels[1], self.kernel_sizes[1], self.strides[1], dtype=self.dtype
    )

  def _can_fuse(self):
    return self.fused and (
        self.act is None or isinstance(self.act, GDN) or callable(self.act)
    ) and not isinstance(self.act, PReLU)

  def __call__(self, z, training=False):
    if self._can_fuse() and not self.is_initializing():
      # Phase-space fused decode: the intermediate stays [.., s^2 * C]
      # (lane-packed) instead of the depth-to-spaced [.., C] layout whose
      # narrow channel dim wastes ~90% of VPU/MXU lanes (see
      # ops/fast_deconv.py). Numerics identical up to fp reassociation;
      # params remain checkpoint-compatible with the unfused path.
      from shallow_ntc_tpu.ops import fast_deconv as fd

      dtype = self.dtype or z.dtype
      s1 = self.strides[0]
      p1 = self.conv1.variables["params"]
      k1 = p1["kernel"].astype(dtype)
      # Grouped taps win at batch >= ~4 (0.42 vs 0.55 ms at b=8); at batch 1
      # (per-image eval/itinf) the small-tap convs do not amortize and the
      # dense one-pass is ~2.3x faster (PERF_NOTES round 2).
      if z.shape[0] >= 4 and len(fd._phase_groups(self.kernel_sizes[0], s1)) > 1:
        # Tap-window grouped phase conv (k13s8: 4/9 of the dense FLOPs are
        # zero tap padding); the activation applies per group piece and the
        # canonical layout is restored with static contiguous slices.
        pieces, plists = fd.grouped_phase_pieces(
            z.astype(dtype), k1, p1["bias"], s1
        )
        pieces = [
            _apply_act_phase(self.act, piece, len(ph), dtype)
            for piece, ph in zip(pieces, plists)
        ]
        x = fd.canonicalize_pieces(pieces, plists, self.channels[0])
      else:
        x = fd.phase_conv(z.astype(dtype), k1, p1["bias"], s1)
        x = _apply_act_phase(self.act, x, s1 * s1, dtype)
      p2 = self.conv2.variables["params"]
      return _final_deconv_packed(
          x, p2["kernel"].astype(dtype), p2["bias"],
          s1, self.strides[1], self.channels[0],
      )
    x = self.conv1(z)
    if self.act is not None:
      x = self.act(x)
    return self.conv2(x)


class TwoLayerResSynthesis(nn.Module):
  """TwoLayerSynthesis plus a parallel residual upsampling branch (ref :320-361).

  res_type="conv": second k13s8 deconv; res_type="d2s": pixel-shuffle stack
  (depth_to_space x3 with 1x1 convs). Output conv applied to base(z)+res(z).
  """

  channels: Tuple[int, int] = (12, 3)
  strides: Tuple[int, int] = (8, 2)
  kernel_sizes: Tuple[int, int] = (13, 5)
  activation_type: str = "igdn"
  res_type: str = "conv"
  fused: bool = True
  dtype: Optional[Dtype] = None

  @property
  def upsample_factor(self):
    return self.strides[0] * self.strides[1]

  @property
  def output_depth(self):
    return self.channels[-1]

  def setup(self):
    self.base_conv = _deconv(
        self.channels[0], self.kernel_sizes[0], self.strides[0], dtype=self.dtype
    )
    self.base_act = make_activation(self.activation_type)
    if self.res_type == "conv":
      self.res_conv = _deconv(
          self.channels[0], self.kernel_sizes[0], self.strides[0], dtype=self.dtype
      )
    elif self.res_type == "d2s":
      self.res_conv1 = _conv(192, 1, 1, dtype=self.dtype)
      self.res_conv2 = _conv(self.channels[0] * 4, 1, 1, dtype=self.dtype)
    else:
      raise NotImplementedError(self.res_type)
    self.out_conv = _deconv(
        self.channels[1], self.kernel_sizes[1], self.strides[1], dtype=self.dtype
    )

  def _res(self, z):
    if self.res_type == "conv":
      return self.res_conv(z)
    x = depth_to_space(z, 2)
    x = jax.nn.leaky_relu(self.res_conv1(x), negative_slope=0.2)
    x = depth_to_space(x, 2)
    x = jax.nn.leaky_relu(self.res_conv2(x), negative_slope=0.2)
    return depth_to_space(x, 2)

  def _can_fuse(self):
    return (
        self.fused
        and self.res_type == "conv"
        and (
            self.base_act is None
            or isinstance(self.base_act, GDN)
            or callable(self.base_act)
        )
        and not isinstance(self.base_act, PReLU)
    )

  def __call__(self, z, training=False):
    if self._can_fuse() and not self.is_initializing():
      # Phase-space fused decode (see TwoLayerSynthesis.__call__): base and
      # residual deconvs, the (I)GDN and the sum all stay lane-packed; one
      # depth_to_space feeds the small output deconv.
      from shallow_ntc_tpu.ops import fast_deconv as fd

      dtype = self.dtype or z.dtype
      z = z.astype(dtype)
      pb = self.base_conv.variables["params"]
      pr = self.res_conv.variables["params"]
      po = self.out_conv.variables["params"]
      s1 = self.strides[0]
      c = self.channels[0]
      kb = pb["kernel"].astype(dtype)
      kr = pr["kernel"].astype(dtype)
      # batch >= 4: see TwoLayerSynthesis — grouped only pays off when the
      # small-tap convs amortize.
      if z.shape[0] >= 4 and len(fd._phase_groups(self.kernel_sizes[0], s1)) > 1:
        # Tap-window grouped phase convs (k13s8 drops 4/9 of the dense
        # FLOPs as zero tap padding). Base and res run as separate grouped
        # convs; GDN and the sum apply per group piece (GDN only mixes
        # within a true channel's block, so phase order is irrelevant), and
        # one static-slice concat restores the canonical layout for the
        # final stage.
        base_ps, plists = fd.grouped_phase_pieces(z, kb, pb["bias"], s1)
        res_ps, _ = fd.grouped_phase_pieces(z, kr, pr["bias"], s1)
        mids = [
            _apply_act_phase(self.base_act, bp, len(ph), dtype) + rp
            for bp, rp, ph in zip(base_ps, res_ps, plists)
        ]
        mid_p = fd.canonicalize_pieces(mids, plists, c)
      else:
        # base and res are two deconvs of the same input: run them as ONE
        # phase conv over concatenated output channels (one pass over z,
        # 2x wider matmul N) and split in phase space.
        kernel_br = jnp.concatenate([kb, kr], axis=-1)
        bias_br = jnp.concatenate([pb["bias"], pr["bias"]], axis=-1)
        both_p = fd.phase_conv(z, kernel_br, bias_br, s1)
        # phase layout is [.., s*s*(2c)] with the 2c split innermost.
        base_p = both_p.reshape(both_p.shape[:-1] + (s1 * s1, 2 * c))
        res_p = base_p[..., c:].reshape(both_p.shape[:-1] + (s1 * s1 * c,))
        base_p = base_p[..., :c].reshape(both_p.shape[:-1] + (s1 * s1 * c,))
        base_p = _apply_act_phase(self.base_act, base_p, s1 * s1, dtype)
        mid_p = base_p + res_p
      return _final_deconv_packed(
          mid_p, po["kernel"].astype(dtype), po["bias"],
          s1, self.strides[1], c,
      )
    base = self.base_conv(z)
    if self.base_act is not None:
      base = self.base_act(base)
    return self.out_conv(base + self._res(z))


class JPEGLikeHyperSynthesis(nn.Module):
  """JPEG-fied hyper-decoder: one k6s4 deconv to 2*bottleneck channels (ref :364-377)."""

  bottleneck_size: int
  kernel_size: int = 6
  dtype: Optional[Dtype] = None

  upsample_factor = 4

  @property
  def output_depth(self):
    return self.bottleneck_size * 2

  def setup(self):
    self.conv = _deconv(
        self.bottleneck_size * 2, self.kernel_size, 4, dtype=self.dtype
    )

  def __call__(self, x, training=False):
    return self.conv(x)


def depth_to_space(x: jax.Array, block: int) -> jax.Array:
  """NHWC depth_to_space (pixel shuffle), TF ordering."""
  b, h, w, c = x.shape
  assert c % (block * block) == 0
  x = x.reshape(b, h, w, block, block, c // (block * block))
  x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
  return x.reshape(b, h * block, w * block, c // (block * block))


def space_to_depth(x: jax.Array, block: int) -> jax.Array:
  """Inverse of depth_to_space."""
  b, h, w, c = x.shape
  x = x.reshape(b, h // block, block, w // block, block, c)
  x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
  return x.reshape(b, h // block, w // block, c * block * block)


# ---------------------------------------------------------------------------
# Registry (reference transforms.py:380-393) + static shape inference
# ---------------------------------------------------------------------------
from shallow_ntc_tpu.models.elic import ElicAnalysis, ElicSynthesis  # noqa: E402

_classes = [
    BLS2017Analysis, BLS2017Synthesis,
    CNNAnalysis, CNNSynthesis, HyperAnalysis, HyperSynthesis,
    MBT2018Analysis, MBT2018Synthesis,
    HyperAnalysisSmall, HyperSynthesisSmall,
    ElicAnalysis, ElicSynthesis,
    JPEGLikeSynthesis, TwoLayerSynthesis, TwoLayerResSynthesis,
    JPEGLikeHyperSynthesis,
]
class_builder = ClassBuilder({cls.__name__: cls for cls in _classes})


def build_transform(cfg: dict, **extra) -> nn.Module:
  """Instantiate a transform from a {'cls': name, **kwargs} config dict."""
  cfg = dict(cfg)
  cls_name = cfg.pop("cls")
  # Configs written as ml_collections may carry lists where tuples are expected.
  for k, v in list(cfg.items()):
    if isinstance(v, list):
      cfg[k] = tuple(v)
  return class_builder.build(cls_name, **cfg, **extra)


# Pure config -> shape rules (no module instantiation, so they are safe to
# call from inside another module's methods where flax would otherwise treat
# a fresh Module() as a stray submodule).
def config_output_depth(cfg) -> int:
  """Output channel count of a transform config dict."""
  cls = cfg["cls"]
  if cls in ("BLS2017Analysis", "BLS2017Synthesis"):
    return cfg["num_filters"] if cls.endswith("Analysis") else 3
  if cls in ("MBT2018Analysis", "CNNAnalysis"):
    return cfg.get("output_channels") or cfg["channels_base"]
  if cls in ("MBT2018Synthesis", "CNNSynthesis"):
    return cfg.get("output_channels", 3)
  if cls in ("HyperAnalysis", "HyperAnalysisSmall"):
    return cfg["bottleneck_size"]
  if cls in ("HyperSynthesis", "HyperSynthesisSmall", "JPEGLikeHyperSynthesis"):
    return cfg["bottleneck_size"] * 2
  if cls in ("ElicAnalysis", "ElicSynthesis"):
    return tuple(cfg.get("channels", (128, 160, 192, 192)))[-1]
  if cls == "JPEGLikeSynthesis":
    return cfg.get("output_channels", 3)
  if cls in ("TwoLayerSynthesis", "TwoLayerResSynthesis"):
    return tuple(cfg.get("channels", (24, 3)))[-1]
  raise KeyError(f"No output-depth rule for {cls}")


def config_scale_factor(cfg) -> int:
  """Total down/up-sampling factor of a transform config dict."""
  cls = cfg["cls"]
  if cls in ("BLS2017Analysis", "BLS2017Synthesis", "CNNAnalysis", "CNNSynthesis"):
    return 16
  if cls in ("MBT2018Analysis", "MBT2018Synthesis"):
    return 2 ** cfg.get("n_layers", 4)
  if cls in ("HyperAnalysis", "HyperSynthesis", "JPEGLikeHyperSynthesis"):
    return 4
  if cls in ("HyperAnalysisSmall", "HyperSynthesisSmall"):
    return 2
  if cls == "ElicAnalysis":
    return 2 ** len(cfg.get("channels", (128, 160, 192, 192)))
  if cls == "ElicSynthesis":
    return 2 ** len(cfg.get("channels", (192, 160, 128, 3)))
  if cls == "JPEGLikeSynthesis":
    return cfg.get("strides", 16)
  if cls in ("TwoLayerSynthesis", "TwoLayerResSynthesis"):
    s = tuple(cfg.get("strides", (8, 2)))
    return s[0] * s[1]
  raise KeyError(f"No scale-factor rule for {cls}")


def transform_output_depth(module: nn.Module) -> int:
  """Static bottleneck-size inference (replaces the reference's dummy trace).

  Also the fix for the reference's missing `get_bottleneck_size`
  (factorized/models.py:24).
  """
  return int(module.output_depth)


def transform_scale_factor(module: nn.Module) -> int:
  """Static down/upsample factor of a transform."""
  if hasattr(module, "downsample_factor"):
    return int(module.downsample_factor)
  return int(module.upsample_factor)
