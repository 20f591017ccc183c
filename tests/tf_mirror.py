"""Raw-TF mirror of the reference's compute + checkpoint layout (test helper).

tensorflow_compression is not installed here, so the tfc behaviors the
reference depends on (GDN with its sqrt-reparameterization, DeepFactorized
CDF logits) are re-derived from their published parameterizations using core
TF ops only; conv geometry uses tf.nn.conv2d / tf.nn.conv2d_transpose with
SAME padding, which is exactly what keras Conv2D / Conv2DTranspose lower to.

Mirrors are tf.Modules whose attribute names reproduce the tf.train.Checkpoint
object paths of the reference's keras-2.10 models (Sequential children as
`layer_with_weights-N`, conv weights as kernel/bias, GDN-as-activation under
`<conv>/activation/<beta|gamma>_parameter/variable`, DeepFactorized under
`_prior/_matrices/N`), so they serve double duty:

  1. elementwise output parity vs our flax transforms (weights copied from a
     flax init via shallow_ntc_tpu.utils.tf_convert), and
  2. producing genuine on-disk TF checkpoints in the reference layout to
     exercise scripts/convert_tf_checkpoint.py end to end.

Reference: /root/reference/common/transforms.py, common/elic.py,
mshyper/models.py:111-140 (attribute names `_analysis`, `_synthesis`,
`_hyper_analysis`, `_hyper_synthesis`, `_prior`).
"""

import math

import numpy as np
import tensorflow as tf

from shallow_ntc_tpu.utils import tf_convert

_PEDESTAL = 2.0**-18


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------
class TFGDNParam(tf.Module):
  """tfc.parameters.GDNParameter storage: one raw (sqrt-domain) variable."""

  def __init__(self, raw, minimum, name=None):
    super().__init__(name=name)
    self.variable = tf.Variable(np.asarray(raw, np.float32), name="variable")
    self._bound = math.sqrt(minimum + _PEDESTAL)

  def value(self):
    v = tf.maximum(self.variable, self._bound)
    return tf.square(v) - _PEDESTAL


class TFGDN(tf.Module):
  """tfc.GDN / reference GDN1 forward math (reference transforms.py:8-63)."""

  def __init__(self, beta_raw, gamma_raw, inverse, alpha=1.0, epsilon=1.0,
               name=None):
    super().__init__(name=name)
    self.beta_parameter = TFGDNParam(beta_raw, minimum=1e-6)
    self.gamma_parameter = TFGDNParam(gamma_raw, minimum=0.0)
    self.inverse = inverse
    self.alpha = alpha
    self.epsilon = epsilon

  def __call__(self, x):
    beta = self.beta_parameter.value()
    gamma = self.gamma_parameter.value()
    if self.alpha == 1.0:
      pool = tf.abs(x)
    elif self.alpha == 2.0:
      pool = tf.square(x)
    else:
      pool = tf.abs(x) ** self.alpha
    c = gamma.shape[0]
    norm = tf.nn.convolution(pool, tf.reshape(gamma, [1, 1, c, c]),
                             padding="VALID")
    norm = tf.nn.bias_add(norm, beta)
    if self.epsilon == 0.5:
      norm = tf.sqrt(norm)
    elif self.epsilon != 1.0:
      norm = norm**self.epsilon
    return x * norm if self.inverse else x / norm


class TFConv(tf.Module):
  """keras Conv2D(padding=SAME) mirror: kernel [k, k, in, out]."""

  def __init__(self, kernel, bias, strides, activation=None, name=None):
    super().__init__(name=name)
    self.kernel = tf.Variable(np.asarray(kernel, np.float32), name="kernel")
    if bias is not None:
      self.bias = tf.Variable(np.asarray(bias, np.float32), name="bias")
    else:
      self.bias = None
    self.strides = strides
    self.activation = activation  # tracked attr -> `<conv>/activation/...`

  def __call__(self, x):
    y = tf.nn.conv2d(x, self.kernel, strides=[1, self.strides, self.strides, 1],
                     padding="SAME")
    if self.bias is not None:
      y = tf.nn.bias_add(y, self.bias)
    if self.activation is not None:
      y = self.activation(y)
    return y


class TFDeconv(tf.Module):
  """keras Conv2DTranspose(padding=SAME) mirror: kernel [k, k, out, in]."""

  def __init__(self, kernel, bias, strides, activation=None, name=None):
    super().__init__(name=name)
    self.kernel = tf.Variable(np.asarray(kernel, np.float32), name="kernel")
    if bias is not None:
      self.bias = tf.Variable(np.asarray(bias, np.float32), name="bias")
    else:
      self.bias = None
    self.strides = strides
    self.activation = activation

  def __call__(self, x):
    b, h, w, _ = x.shape
    s = self.strides
    filters = self.kernel.shape[2]
    y = tf.nn.conv2d_transpose(
        x, self.kernel, output_shape=[b, h * s, w * s, filters],
        strides=[1, s, s, 1], padding="SAME")
    if self.bias is not None:
      y = tf.nn.bias_add(y, self.bias)
    if self.activation is not None:
      y = self.activation(y)
    return y


class TFSequential(tf.Module):
  """keras Sequential mirror: weighted children become layer_with_weights-N."""

  def __init__(self, children, name=None):
    super().__init__(name=name)
    self._children = list(children)
    n = 0
    for child in self._children:
      if isinstance(child, tf.Module):
        setattr(self, f"layer_with_weights-{n}", child)
        n += 1

  def __call__(self, x):
    for child in self._children:
      x = child(x)
    return x


class TFResBlock(tf.Module):
  """Reference elic.ResidualBlock: `_block` = [1x1 C/2, 3x3 C/2, 1x1 C] + skip."""

  def __init__(self, convs, name=None):
    super().__init__(name=name)
    self._block = TFSequential(convs)

  def __call__(self, x):
    return x + self._block(x)


class TFSimpleAttention(tf.Module):
  """Reference elic.SimpleAttention: x + trunk(x) * sigmoid_branch(x)."""

  def __init__(self, trunk_blocks, branch_blocks, gate_conv, name=None):
    super().__init__(name=name)
    self._trunk = TFSequential(trunk_blocks)
    self._attention_branch = TFSequential(list(branch_blocks) + [gate_conv])

  def __call__(self, x):
    return x + self._trunk(x) * self._attention_branch(x)


class TFJPEGLike(tf.Module):
  """Reference JPEGLikeSynthesis: optional ones-channel concat + one deconv."""

  def __init__(self, conv, use_offset, name=None):
    super().__init__(name=name)
    self.conv = conv
    self.use_offset = use_offset

  def __call__(self, x):
    if self.use_offset:
      ones = tf.ones(list(x.shape[:3]) + [1], x.dtype)
      x = tf.concat([x, ones], axis=-1)
    return self.conv(x)


class TFTwoLayer(tf.Module):
  def __init__(self, conv1, conv2, name=None):
    super().__init__(name=name)
    self.conv1 = conv1
    self.conv2 = conv2

  def __call__(self, z):
    return self.conv2(self.conv1(z))


class TFTwoLayerRes(tf.Module):
  def __init__(self, base_conv, res, out_conv, name=None):
    super().__init__(name=name)
    self.base_conv = base_conv
    self.res = res
    self.out_conv = out_conv

  def __call__(self, z):
    return self.out_conv(self.base_conv(z) + self.res(z))


class TFElicWrapper(tf.Module):
  """Reference elic.ElicAnalysis: `_transform` Sequential."""

  def __init__(self, transform, name=None):
    super().__init__(name=name)
    self._transform = transform

  def __call__(self, x):
    return self._transform(x)


class TFDeepFactorized(tf.Module):
  """tfc.DeepFactorized CDF-logits math, from Balle 2018 appendix 6.1.

  Variables stored raw: softplus-reparameterized matrices (C, f_out, f_in),
  biases (C, f_out, 1), factors (C, f_out, 1) -- the same storage our
  DeepFactorizedPrior uses, so weights copy over directly.
  """

  def __init__(self, matrices, biases, factors, name=None):
    super().__init__(name=name)
    self._matrices = [tf.Variable(np.asarray(m, np.float32)) for m in matrices]
    self._biases = [tf.Variable(np.asarray(b, np.float32)) for b in biases]
    self._factors = [tf.Variable(np.asarray(f, np.float32)) for f in factors]

  def logits_cdf(self, x):
    """x: (..., C) -> CDF logits, same shape."""
    shape = x.shape
    c = shape[-1]
    flat = tf.reshape(x, [-1, c])
    logits = tf.transpose(flat)[:, tf.newaxis, :]  # (C, 1, N)
    n = len(self._matrices)
    for i in range(n):
      m = tf.nn.softplus(self._matrices[i])
      logits = tf.linalg.matmul(m, logits) + self._biases[i]
      if i < n - 1:
        logits += tf.tanh(self._factors[i]) * tf.tanh(logits)
    out = tf.transpose(logits[:, 0, :])
    return tf.reshape(out, shape)


# ---------------------------------------------------------------------------
# Config + flax-params -> TF mirror
# ---------------------------------------------------------------------------
def _activation_fn(name):
  if name is None:
    return None
  lowered = name.lower()
  if lowered in ("lrelu", "leaky_relu"):
    return tf.nn.leaky_relu  # alpha=0.2, reference transforms.py:77-78
  if lowered in ("gdn", "gdn1", "igdn", "igdn1"):
    raise AssertionError("GDN activations are built explicitly from params")
  return getattr(tf.nn, lowered)


def _p(flax_params, path):
  node = flax_params
  for k in path:
    node = node[k]
  return np.asarray(node, np.float32)


def _tf_conv(flax_params, path, strides, activation=None):
  return TFConv(_p(flax_params, path + ("kernel",)),
                _p(flax_params, path + ("bias",)), strides, activation)


def _tf_deconv(flax_params, path, strides, activation=None, use_bias=True):
  kernel = tf_convert.conv_transpose_kernel_flax_to_tf(
      _p(flax_params, path + ("kernel",)))
  bias = _p(flax_params, path + ("bias",)) if use_bias else None
  return TFDeconv(kernel, bias, strides, activation)


def _tf_gdn(flax_params, path, inverse, alpha=1.0, epsilon=1.0):
  return TFGDN(_p(flax_params, path + ("beta",)),
               _p(flax_params, path + ("gamma",)), inverse, alpha, epsilon)


def _tf_resblock(flax_params, prefix):
  convs = []
  for j, act in enumerate([tf.nn.relu, tf.nn.relu, None]):
    convs.append(_tf_conv(flax_params, prefix + (f"Conv_{j}",), 1, act))
  return TFResBlock(convs)


def _tf_attention(flax_params, prefix):
  trunk = [_tf_resblock(flax_params, prefix + (f"ResidualBlock_{j}",))
           for j in range(3)]
  branch = [_tf_resblock(flax_params, prefix + (f"ResidualBlock_{3 + j}",))
            for j in range(3)]
  gate = _tf_conv(flax_params, prefix + ("Conv_0",), 1, tf.nn.sigmoid)
  return TFSimpleAttention(trunk, branch, gate)


def mirror_transform(cfg: dict, flax_params) -> tf.Module:
  """Build the TF mirror of a transform config, weights from a flax init."""
  cls = cfg["cls"]
  if cls == "ElicAnalysis":
    channels = tuple(cfg.get("channels", (128, 160, 192, 192)))
    kernels = tuple(cfg.get("kernel_sizes", (5,) * len(channels)))
    strides = tuple(cfg.get("strides", (2,) * len(channels)))
    nrb = cfg.get("num_residual_blocks", 3)
    manifest = tf_convert.elic_analysis_manifest(channels, nrb)
    conv_specs = iter(zip(kernels, strides))
    layers = []
    for kind, name in manifest:
      if kind == "conv":
        _, s = next(conv_specs)
        layers.append(_tf_conv(flax_params, (name,), s, None))
      elif kind == "resblock":
        layers.append(_tf_resblock(flax_params, (name,)))
      else:
        layers.append(_tf_attention(flax_params, (name,)))
    return TFElicWrapper(TFSequential(layers))
  if cls == "ElicSynthesis":
    channels = tuple(cfg.get("channels", (192, 160, 128, 3)))
    kernels = tuple(cfg.get("kernel_sizes", (5,) * len(channels)))
    strides = tuple(cfg.get("strides", (2,) * len(channels)))
    nrb = cfg.get("num_residual_blocks", 3)
    manifest = tf_convert.elic_synthesis_manifest(channels, nrb)
    deconv_specs = iter(zip(kernels, strides))
    layers = []
    for kind, name in manifest:
      if kind == "deconv":
        _, s = next(deconv_specs)
        layers.append(_tf_deconv(flax_params, (name,), s, None))
      elif kind == "resblock":
        layers.append(_tf_resblock(flax_params, (name,)))
      else:
        layers.append(_tf_attention(flax_params, (name,)))
    return TFElicWrapper(TFSequential(layers))
  if cls == "TwoLayerResSynthesis":
    act_name = cfg.get("activation_type", "igdn")
    strides = tuple(cfg.get("strides", (8, 2)))
    if act_name and act_name.lower() in ("gdn", "gdn1", "igdn", "igdn1"):
      act = _tf_gdn(flax_params, ("base_act",),
                    inverse=act_name.lower().startswith("i"))
    else:
      act = _activation_fn(act_name)
    base = _tf_deconv(flax_params, ("base_conv",), strides[0], act)
    if cfg.get("res_type", "conv") == "conv":
      res = _tf_deconv(flax_params, ("res_conv",), strides[0], None)
    else:  # d2s pixel-shuffle stack (reference transforms.py:339-348)
      d2s = lambda b: (lambda x: tf.nn.depth_to_space(x, b))  # noqa: E731
      res = TFSequential([
          d2s(2),
          _tf_conv(flax_params, ("res_conv1",), 1, tf.nn.leaky_relu),
          d2s(2),
          _tf_conv(flax_params, ("res_conv2",), 1, tf.nn.leaky_relu),
          d2s(2),
      ])
    out = _tf_deconv(flax_params, ("out_conv",), strides[1], None)
    return TFTwoLayerRes(base, res, out)
  if cls == "TwoLayerSynthesis":
    act_name = cfg.get("activation_type", "igdn")
    strides = tuple(cfg.get("strides", (8, 2)))
    if act_name and act_name.lower() in ("gdn", "gdn1", "igdn", "igdn1"):
      act = _tf_gdn(flax_params, ("act",),
                    inverse=act_name.lower().startswith("i"))
    else:
      act = _activation_fn(act_name)
    conv1 = _tf_deconv(flax_params, ("conv1",), strides[0], act)
    conv2 = _tf_deconv(flax_params, ("conv2",), strides[1], None)
    return TFTwoLayer(conv1, conv2)
  if cls == "JPEGLikeSynthesis":
    conv = _tf_deconv(flax_params, ("conv",), cfg.get("strides", 16), None,
                      use_bias=cfg.get("use_bias", True))
    return TFJPEGLike(conv, cfg.get("use_offset", False))
  if cls == "JPEGLikeHyperSynthesis":
    conv = _tf_deconv(flax_params, ("conv",), 4, None)
    return TFJPEGLike(conv, use_offset=False)
  if cls == "HyperAnalysis":
    act = _activation_fn(cfg.get("activation_type", "relu"))
    p = ("stack",)
    return TFSequential([
        _tf_conv(flax_params, p + ("convs_0",), 1, act),
        _tf_conv(flax_params, p + ("convs_1",), 2, act),
        _tf_conv(flax_params, p + ("convs_2",), 2, None),
    ])
  if cls == "HyperSynthesis":
    act = _activation_fn(cfg.get("activation_type", "relu"))
    p = ("stack",)
    return TFSequential([
        _tf_deconv(flax_params, p + ("convs_0",), 2, act),
        _tf_deconv(flax_params, p + ("convs_1",), 2, act),
        _tf_deconv(flax_params, p + ("convs_2",), 1, None),
    ])
  if cls == "CNNAnalysis":
    act = _activation_fn(cfg.get("activation_type", "leaky_relu"))
    p = ("stack",)
    convs = [_tf_conv(flax_params, p + (f"convs_{i}",), 2, act)
             for i in range(3)]
    convs.append(_tf_conv(flax_params, p + ("convs_3",), 2, None))
    return TFSequential(convs)
  if cls == "CNNSynthesis":
    act = _activation_fn(cfg.get("activation_type", "leaky_relu"))
    p = ("stack",)
    convs = [_tf_deconv(flax_params, p + (f"convs_{i}",), 2, act)
             for i in range(3)]
    convs.append(_tf_deconv(flax_params, p + ("convs_3",), 2, None))
    return TFSequential(convs)
  raise NotImplementedError(cls)


def mirror_prior(flax_params, num_filters=(3, 3, 3)) -> TFDeepFactorized:
  n = len(num_filters) + 1
  matrices = [_p(flax_params, (f"matrix_{i}",)) for i in range(n)]
  biases = [_p(flax_params, (f"bias_{i}",)) for i in range(n)]
  factors = [_p(flax_params, (f"factor_{i}",)) for i in range(n - 1)]
  return TFDeepFactorized(matrices, biases, factors)


class TFModelMirror(tf.Module):
  """Reference-Model-shaped trackable root (mshyper/models.py:111-140)."""

  def __init__(self, transform_config, model_params, family="mshyper"):
    super().__init__()
    self._analysis = mirror_transform(
        dict(transform_config["analysis"]), model_params["_analysis"])
    self._synthesis = mirror_transform(
        dict(transform_config["synthesis"]), model_params["_synthesis"])
    if family == "mshyper":
      self._hyper_analysis = mirror_transform(
          dict(transform_config["hyper_analysis"]),
          model_params["_hyper_analysis"])
      self._hyper_synthesis = mirror_transform(
          dict(transform_config["hyper_synthesis"]),
          model_params["_hyper_synthesis"])
    self._prior = mirror_prior(model_params["_prior"])


# ---------------------------------------------------------------------------
# Full-model loss mirror (reference mshyper/models.py:234-359).
#
# Composes the per-block mirrors above into the reference's COMPLETE
# end_to_end_frame_loss: reflect padding -> analysis/hyper-analysis (genuine
# tf.nn convs) -> the three quantization branches (unoise / mixedq / sga) of
# both entropy models -> bpp accounting -> [0,255] distortion -> lambda
# warm-up -> rd_loss. Entropy/metrics math runs in float64 numpy/scipy so the
# mirror doubles as a high-precision oracle. Stochastic branches take the
# noise/gumbel draws as explicit arguments so the JAX model's exact samples
# can be replayed.
# ---------------------------------------------------------------------------
_LIKELIHOOD_FLOOR = 1e-9  # tfc ContinuousEntropyModel likelihood_bound default

# Scale table constants (reference mshyper/models.py:28-32).
_NUM_SCALES = 64
_SCALE_MIN = 0.11
_SCALE_MAX = 256.0
_SCALE_FACTOR = (math.log(_SCALE_MAX) - math.log(_SCALE_MIN)) / (_NUM_SCALES - 1.0)


def np_pad_reflect(x, div):
  """pad_images (reference common/image_utils.py:41-66): bottom/right reflect."""
  _, h, w, _ = x.shape
  ph, pw = (-h) % div, (-w) % div
  if ph == 0 and pw == 0:
    return x
  return np.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")


def np_prior_offset(tf_prior, channels, iters=80):
  """Per-channel median of the DeepFactorized prior by vectorized bisection
  on the TF CDF logits, then tfc's quantization_offset = med - round(med).
  (The bisection/brentq agreement is separately unit-tested in
  test_tf_parity.test_quantization_offset_median_vs_brentq.)"""
  lo = np.full((channels,), -200.0)
  hi = np.full((channels,), 200.0)
  for _ in range(iters):
    mid = 0.5 * (lo + hi)
    val = tf_prior.logits_cdf(
        tf.constant(mid[None, :].astype(np.float32))).numpy()[0].astype(np.float64)
    gt = val > 0.0  # logit > 0 <=> cdf > 1/2 <=> median to the left
    hi = np.where(gt, mid, hi)
    lo = np.where(gt, lo, mid)
  med = 0.5 * (lo + hi)
  return med - np.round(med)


def np_prior_bits(tf_prior, z, coding_rank=3):
  """Noisy DeepFactorized bits: log2(c(z+.5) - c(z-.5)), tfc sign trick +
  likelihood floor, computed in float64 from the TF logits."""
  lo = tf_prior.logits_cdf(tf.constant(np.asarray(z - 0.5, np.float32))).numpy()
  up = tf_prior.logits_cdf(tf.constant(np.asarray(z + 0.5, np.float32))).numpy()
  lo = lo.astype(np.float64)
  up = up.astype(np.float64)
  sign = -np.sign(lo + up)
  sig = lambda v: 1.0 / (1.0 + np.exp(-v))
  p = np.abs(sig(sign * up) - sig(sign * lo))
  p = np.maximum(p, _LIKELIHOOD_FLOOR)
  axes = tuple(range(-coding_rank, 0))
  return np.sum(np.log(p), axis=axes) / -math.log(2.0)


def np_indexed_gaussian_bits(centered, indexes, coding_rank=3):
  """Noisy zero-mean Gaussian bits with the log-spaced 64-entry scale table:
  indexes (the exp'd hyper-synthesis output) clipped to [0, 63] and mapped
  through scale_fn (reference mshyper/models.py:28-32 + tfc
  LocationScaleIndexedEntropyModel)."""
  from scipy.special import log_ndtr

  idx = np.clip(np.asarray(indexes, np.float64), 0.0, _NUM_SCALES - 1.0)
  # scale_fn evaluates in f32 in the compute path; mirror that rounding.
  scales = np.exp(math.log(_SCALE_MIN) + _SCALE_FACTOR * idx.astype(np.float32)
                  ).astype(np.float64)
  y = -np.abs(np.asarray(centered, np.float64))
  big = log_ndtr((y + 0.5) / scales)
  small = log_ndtr((y - 0.5) / scales)
  logp = big + np.log(-np.expm1(np.minimum(small - big, -1e-20)))
  logp = np.maximum(logp, math.log(_LIKELIHOOD_FLOOR))
  axes = tuple(range(-coding_rank, 0))
  return np.sum(logp, axis=axes) / -math.log(2.0)


def np_sga_round(mu, tau, logistic, offset=None, epsilon=1e-5):
  """SGA rounding with an explicit Logistic draw (reference
  common/latent_rvs_utils.py:8-37; the 2-category relaxed one-hot collapses
  to a sigmoid of the logit difference plus Logistic noise = Gumbel_c -
  Gumbel_f, matching ops/rounding._sga_round_no_offset)."""
  v = mu if offset is None else mu - offset
  f, c = np.floor(v), np.ceil(v)
  d_f = np.clip(v - f, -1.0 + epsilon, 1.0 - epsilon)
  d_c = np.clip(c - v, -1.0 + epsilon, 1.0 - epsilon)
  logit_diff = (np.arctanh(d_f) - np.arctanh(d_c)) / tau
  a = (logit_diff + logistic) / tau
  w_ceil = 1.0 / (1.0 + np.exp(-a))
  s = f + (c - f) * w_ceil
  return s if offset is None else s + offset


def np_sga_tau(step, r, ub, lb=1e-8, t0=200.0):
  """SGA temperature schedule (reference common/latent_rvs_utils.py:55-85)."""
  return float(np.clip(ub * np.exp(-r * (step - t0)), lb, ub))


def mirror_scheduled_rd_lambda(rd_lambda, step, scheduled_num_steps, itinf=False):
  """Lambda warm-up: 10x for the first 20% of training when lambda <= 0.01
  (reference mshyper/models.py:40-41, 167-184)."""
  if rd_lambda <= 0.01 and not itinf:
    if step < int(scheduled_num_steps * 0.2):
      return rd_lambda * 10.0
  return rd_lambda


def mirror_full_frame_loss(
    tf_model,
    image_batch,
    *,
    uq_method,
    training,
    rd_lambda,
    scheduled_num_steps,
    downsample_factor,
    step=0,
    offset_heuristic=True,
    noise_z=None,
    noise_y=None,
    logistic_z=None,
    logistic_y=None,
    sga_tau=None,
    itinf=False,
):
  """TF/float64 mirror of the complete reference loss. Returns a dict with
  rd_loss / bpp / mse / psnr / sched_rd_lambda (+ z_hat, y_hat for debugging).

  Stochastic draws (uniform noise for unoise/mixedq training, Gumbels for
  sga training) must be passed in explicitly; eval mode needs none.
  """
  x = np_pad_reflect(np.asarray(image_batch, np.float32), downsample_factor)
  y = tf_model._analysis(tf.constant(x)).numpy().astype(np.float64)
  z = tf_model._hyper_analysis(tf.constant(y.astype(np.float32))).numpy()
  z = z.astype(np.float64)

  z_offset = (
      np_prior_offset(tf_model._prior, z.shape[-1])
      if offset_heuristic else None
  )

  def quant(v, off=None):
    return np.round(v) if off is None else np.round(v - off) + off

  # Side (hyper) entropy model: the three branches (reference :253-268).
  if uq_method == "unoise":
    if training:
      z_hat = z + noise_z
    else:
      z_hat = quant(z, z_offset)
    z_bits = np_prior_bits(tf_model._prior, z_hat)
  elif uq_method == "mixedq":
    z_noisy = z + noise_z if training else quant(z, z_offset)
    z_bits = np_prior_bits(tf_model._prior, z_noisy)
    z_hat = quant(z, z_offset)
  elif uq_method == "sga":
    if training:
      z_hat = np_sga_round(z, sga_tau, logistic_z, offset=z_offset)
    else:
      z_hat = quant(z, z_offset)
    z_bits = np_prior_bits(tf_model._prior, z_hat)
  else:
    raise NotImplementedError(uq_method)

  hyper_out = tf_model._hyper_synthesis(
      tf.constant(z_hat.astype(np.float32))).numpy().astype(np.float64)
  mu, raw = np.split(hyper_out, 2, axis=-1)
  # sigma made positive via exp; f32 in the compute path (reference :274-276).
  # f32 exp overflows to inf for raw > ~88.7 (random-init hyper-synthesis at
  # flagship geometry hits this); inf is the value the reference computes
  # too, so suppress only the warning, not the overflow.
  with np.errstate(over="ignore"):
    indexes = np.exp(raw.astype(np.float32)).astype(np.float64)

  # Main (scale-indexed Gaussian) entropy model (reference :277-291).
  if uq_method == "unoise":
    if training:
      y_hat = y + noise_y
    else:
      y_hat = quant(y - mu) + mu
    y_bits = np_indexed_gaussian_bits(y_hat - mu, indexes)
  elif uq_method == "mixedq":
    y_noisy = (y + noise_y) if training else (quant(y - mu) + mu)
    y_bits = np_indexed_gaussian_bits(y_noisy - mu, indexes)
    y_hat = quant(y - mu) + mu
  else:  # sga
    if training:
      y_hat = np_sga_round(y, sga_tau, logistic_y, offset=mu)
    else:
      y_hat = quant(y - mu) + mu
    y_bits = np_indexed_gaussian_bits(y_hat - mu, indexes)

  rec = tf_model._synthesis(tf.constant(y_hat.astype(np.float32))).numpy()
  rec = rec[:, : image_batch.shape[1], : image_batch.shape[2], :]

  num_pixels = float(image_batch.shape[1] * image_batch.shape[2])
  bpp = float(np.mean(z_bits) / num_pixels + np.mean(y_bits) / num_pixels)

  # [0, 255] distortion (reference :310-318; common/data_lib.py:48-52).
  img255 = (np.asarray(image_batch, np.float64) + 0.5) * 255.0
  rec255 = (rec.astype(np.float64) + 0.5) * 255.0
  if not training:
    img255 = np.clip(np.round(img255), 0, 255)
    rec255 = np.clip(np.round(rec255), 0, 255)
  per_image_mse = np.mean((img255 - rec255) ** 2, axis=(1, 2, 3))
  mse = float(np.mean(per_image_mse))
  psnr = float(np.mean(-10.0 * (np.log(per_image_mse) - 2 * np.log(255.0))
                       / math.log(10.0)))

  sched = mirror_scheduled_rd_lambda(rd_lambda, step, scheduled_num_steps, itinf)
  rd_loss = bpp + sched * mse
  return dict(rd_loss=rd_loss, bpp=bpp, mse=mse, psnr=psnr,
              sched_rd_lambda=sched, z_hat=z_hat, y_hat=y_hat, mu=mu)
