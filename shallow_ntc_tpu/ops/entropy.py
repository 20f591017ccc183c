"""Stateless entropy models for TPU-native transform coding.

TPU-first re-design of the tensorflow_compression entropy layer the reference
uses (L2 in SURVEY.md's layer map). Instead of stateful objects rebuilt every
call (/root/reference/mshyper/models.py:246-251), priors are flax modules whose
parameters live in the model pytree, and the train/eval "entropy model" calls
are pure functions of (params, inputs, rng) -- so the whole loss compiles to a
single XLA graph and the same code path runs under jit, scan (SGA itinf) and
shard_map (data parallelism).

Components and their reference counterparts:

  DeepFactorizedPrior     <- tfc.NoisyDeepFactorized (Balle 2018 appendix 6.1;
                             used at mshyper/models.py:135, factorized/models.py:60)
  noisy_normal_log_prob   <- tfc.NoisyNormal (mean-scale Gaussian conditional)
  scale table constants   <- mshyper/models.py:28-32 (64 log-spaced scales)
  batched_em_*            <- tfc.ContinuousBatchedEntropyModel(compression=False)
  indexed_em_*            <- tfc.LocationScaleIndexedEntropyModel(...)
  quantization_offset     <- tfc offset heuristic: stop_grad(median - round(median))

Unlike the reference (which never emits a bitstream), these priors also expose
quantized-CDF extraction for the host rANS coder in shallow_ntc_tpu/codec.
"""

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.scipy.special import log_ndtr

from shallow_ntc_tpu.ops.math import lower_bound, upper_bound
from shallow_ntc_tpu.ops.rounding import round_st, sample_unoise

# ---------------------------------------------------------------------------
# Fixed configuration for the scale-indexed entropy model
# (reference: mshyper/models.py:28-34).
# ---------------------------------------------------------------------------
NUM_SCALES = 64
SCALE_MIN = 0.11
SCALE_MAX = 256.0
SCALE_FACTOR = (math.log(SCALE_MAX) - math.log(SCALE_MIN)) / (NUM_SCALES - 1.0)
CODING_RANK = 3

LOG2_E = 1.0 / math.log(2.0)
# Likelihood floor = tfc's ContinuousEntropyModel `likelihood_bound` default
# (1e-9), for training-dynamics parity with the reference. Must be a *normal*
# f32: TPUs flush subnormals to zero, so a 1e-38 floor silently becomes 0 and
# a fully underflowed tail likelihood yields log(0) = -inf bits -> NaN grads
# (observed: flagship run diverging at ~500 steps on TPU while bit-identical
# CPU math stayed finite).
_LIKELIHOOD_FLOOR = 1e-9
_LOG_LIKELIHOOD_FLOOR = math.log(_LIKELIHOOD_FLOOR)


def scale_fn(i):
  """Map a (continuous) scale index in [0, NUM_SCALES) to a positive scale."""
  return jnp.exp(math.log(SCALE_MIN) + SCALE_FACTOR * jnp.asarray(i, jnp.float32))


def bits_from_log_prob(log_probs: jax.Array, coding_rank: int = CODING_RANK) -> jax.Array:
  """Total information content in bits, reduced over the last `coding_rank` axes."""
  reduce_axes = tuple(range(-coding_rank, 0))
  return jnp.sum(log_probs, axis=reduce_axes) * (-LOG2_E)


# ---------------------------------------------------------------------------
# Noisy (uniform-noise-convolved) Gaussian.
# ---------------------------------------------------------------------------
def _stable_log_diff(big: jax.Array, small: jax.Array) -> jax.Array:
  """log(exp(big) - exp(small)) for big >= small, safe when big ~= small."""
  return big + jnp.log(-jnp.expm1(jnp.minimum(small - big, -1e-20)))


def noisy_normal_log_prob(centered: jax.Array, scale: jax.Array) -> jax.Array:
  """log p(y) for y ~ N(0, scale^2) * U(-.5,.5), evaluated at `centered`.

  p(y) = Phi((y+.5)/s) - Phi((y-.5)/s). Computed in the log domain via
  log_ndtr on the *left* tail (exploiting symmetry p(y)=p(-y)) so that values
  deep in the tails keep finite, useful gradients -- the same stabilization
  tfc's UniformNoiseAdapter uses (logsum_expbig_minus_expsmall) -- and clipped
  at the tfc likelihood bound (identity-if-towards gradient).
  """
  y = -jnp.abs(centered)
  big = log_ndtr((y + 0.5) / scale)
  small = log_ndtr((y - 0.5) / scale)
  return lower_bound(_stable_log_diff(big, small), _LOG_LIKELIHOOD_FLOOR)


# ---------------------------------------------------------------------------
# Deep factorized prior (learned univariate density per channel).
# ---------------------------------------------------------------------------
class DeepFactorizedPrior(nn.Module):
  """Per-channel learned CDF, convolved with U(-.5,.5) for the noisy likelihood.

  Parameterization follows Balle et al. 2018 (appendix 6.1) / tfc
  DeepFactorized: the CDF is sigmoid(f_K(...f_1(x))) with
  f_k(x) = softplus(H_k) x + b_k (+ tanh(a_k) * tanh(.) for k < K), which is
  monotone in x by construction. All channels evaluate in parallel as one
  batched (C, f_out, f_in) x (C, f_in, N) matmul stack -- MXU-friendly and
  trivially fusable by XLA.
  """

  channels: int
  num_filters: Tuple[int, ...] = (3, 3, 3)
  init_scale: float = 10.0

  def setup(self):
    filters = (1,) + tuple(self.num_filters) + (1,)
    scale = self.init_scale ** (1.0 / (len(self.num_filters) + 1))
    matrices, biases, factors = [], [], []
    for i in range(len(self.num_filters) + 1):
      init_val = math.log(math.expm1(1.0 / scale / filters[i + 1]))
      matrices.append(
          self.param(
              f"matrix_{i}",
              lambda rng, shape, v=init_val: jnp.full(shape, v, jnp.float32),
              (self.channels, filters[i + 1], filters[i]),
          )
      )
      biases.append(
          self.param(
              f"bias_{i}",
              lambda rng, shape: jax.random.uniform(
                  rng, shape, jnp.float32, -0.5, 0.5
              ),
              (self.channels, filters[i + 1], 1),
          )
      )
      if i < len(self.num_filters):
        factors.append(
            self.param(
                f"factor_{i}", nn.initializers.zeros, (self.channels, filters[i + 1], 1)
            )
        )
    self._matrices = matrices
    self._biases = biases
    self._factors = factors

  def logits_cdf(self, x: jax.Array) -> jax.Array:
    """Logits of the CDF at x. x has shape (..., C); returns the same shape."""
    orig_shape = x.shape
    assert orig_shape[-1] == self.channels, (orig_shape, self.channels)
    # (..., C) -> (C, 1, N)
    flat = jnp.moveaxis(x.reshape(-1, self.channels), -1, 0)[:, None, :]
    logits = flat
    n_layers = len(self.num_filters) + 1
    for i in range(n_layers):
      m = jax.nn.softplus(self._matrices[i])
      logits = jnp.einsum(
          "cij,cjn->cin", m, logits, preferred_element_type=jnp.float32
      ) + self._biases[i]
      if i < n_layers - 1:
        logits = logits + jnp.tanh(self._factors[i]) * jnp.tanh(logits)
    out = jnp.moveaxis(logits[:, 0, :], 0, -1)
    return out.reshape(orig_shape)

  def log_prob_noisy(self, y: jax.Array) -> jax.Array:
    """log(c(y+.5) - c(y-.5)) with the tfc sign trick for tail stability."""
    lo = self.logits_cdf(y - 0.5)
    up = self.logits_cdf(y + 0.5)
    # Flip both logits into the numerically-friendly half-line.
    sign = jax.lax.stop_gradient(-jnp.sign(lo + up))
    p = jnp.abs(jax.nn.sigmoid(sign * up) - jax.nn.sigmoid(sign * lo))
    return jnp.log(lower_bound(p, _LIKELIHOOD_FLOOR))

  def quantile_from_logit(self, target_logit, num_iters: int = 60) -> jax.Array:
    """Per-channel x with logits_cdf(x) == target_logit, by bisection.

    The CDF logits are monotone in x, so bisection is exact. target_logit=0
    gives the median (tfc offset heuristic); large +-logits give the tail
    quantiles used to size the codec's integer alphabets.
    """
    target = jnp.full((self.channels,), target_logit, jnp.float32)

    def eval_logits(x_c):  # x_c: (C,)
      return self.logits_cdf(x_c[None, :])[0]

    lo = jnp.full((self.channels,), -256.0, jnp.float32)
    hi = jnp.full((self.channels,), 256.0, jnp.float32)

    def body(_, carry):
      lo, hi = carry
      mid = 0.5 * (lo + hi)
      val = eval_logits(mid)
      lo = jnp.where(val < target, mid, lo)
      hi = jnp.where(val >= target, mid, hi)
      return lo, hi

    lo, hi = jax.lax.fori_loop(0, num_iters, body, (lo, hi))
    return jax.lax.stop_gradient(0.5 * (lo + hi))

  def median(self, num_iters: int = 60) -> jax.Array:
    """Per-channel median of the *continuous* density (logit target 0)."""
    return self.quantile_from_logit(0.0, num_iters)

  def quantization_offset(self) -> jax.Array:
    """tfc offset heuristic: median - round(median), stop-gradient. Shape (C,)."""
    med = self.median()
    return jax.lax.stop_gradient(med - jnp.round(med))

  def __call__(self, y: jax.Array) -> jax.Array:  # pragma: no cover - alias
    return self.log_prob_noisy(y)


# ---------------------------------------------------------------------------
# Entropy-model call semantics (likelihood path; compression=False parity).
# ---------------------------------------------------------------------------
def batched_em_call(
    prior: DeepFactorizedPrior,
    y: jax.Array,
    training: bool,
    rng: Optional[jax.Array],
    offset: Optional[jax.Array],
    coding_rank: int = CODING_RANK,
) -> Tuple[jax.Array, jax.Array]:
  """tfc.ContinuousBatchedEntropyModel.__call__ semantics.

  Training: additive-uniform-noise sample, bits from the noisy likelihood.
  Eval: straight-through round about `offset` (the offset-heuristic grid),
  bits from the noisy likelihood of the rounded values.
  Returns (sample, bits[batch...]).
  """
  if training:
    sample = sample_unoise(rng, y)
  else:
    sample = round_st(y, offset)
  bits = bits_from_log_prob(prior.log_prob_noisy(sample), coding_rank)
  return sample, bits


def batched_em_quantize(y: jax.Array, offset: Optional[jax.Array]) -> jax.Array:
  """tfc CBEM.quantize: straight-through rounding about the offset grid."""
  return round_st(y, offset)


def normalize_indexes(indexes: jax.Array) -> jax.Array:
  """Clip continuous scale indexes into [0, NUM_SCALES-1].

  Uses identity-if-towards gradients like tfc's lower_bound/upper_bound, so
  saturated indexes still receive corrective gradients.
  """
  return upper_bound(lower_bound(indexes, 0.0), NUM_SCALES - 1.0)


def indexed_em_call(
    y: jax.Array,
    indexes: jax.Array,
    loc: jax.Array,
    training: bool,
    rng: Optional[jax.Array],
    coding_rank: int = CODING_RANK,
) -> Tuple[jax.Array, jax.Array]:
  """tfc.LocationScaleIndexedEntropyModel.__call__ semantics.

  `indexes` are *continuous scale indexes* (the hyper-synthesis sigma output,
  mshyper/models.py:274-276): they are clipped to [0, 63] and mapped through
  the fixed log-spaced scale table; the prior is a zero-mean noisy Gaussian
  with that scale, and `loc` shifts the coding grid.
  """
  scales = scale_fn(normalize_indexes(indexes))
  centered = y - loc
  if training:
    sample_c = sample_unoise(rng, centered)
  else:
    sample_c = round_st(centered)
  bits = bits_from_log_prob(
      noisy_normal_log_prob(sample_c, scales), coding_rank
  )
  return sample_c + loc, bits


def indexed_em_quantize(y: jax.Array, loc: jax.Array) -> jax.Array:
  """tfc LSIEM.quantize: straight-through rounding about `loc`."""
  return round_st(y, offset=loc)


def indexed_em_log_prob_centered(
    sample: jax.Array, indexes: jax.Array, loc: jax.Array
) -> jax.Array:
  """log prob of an explicit (e.g. SGA) sample under the loc=0 indexed prior.

  Mirrors the reference's SGA branch (mshyper/models.py:288-291): the sample
  must be centered by `loc` before evaluating under the zero-mean prior.
  """
  scales = scale_fn(normalize_indexes(indexes))
  return noisy_normal_log_prob(sample - loc, scales)
