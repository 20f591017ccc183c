"""Quantized-CDF table extraction from the learned priors.

The device evaluates continuous noisy likelihoods on an integer grid; the
host quantizes them to 16-bit frequency tables for the rANS coder. Tail mass
beyond each table's range goes to the escape slot (raw-coded), so the tables
can stay compact without correctness risk.

Replaces the table-building half of tensorflow-compression's
compression=True machinery (SURVEY.md section 2.9), which the reference
never exercised.
"""

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import norm as scipy_norm

from shallow_ntc_tpu.codec.bindings import CdfTables
from shallow_ntc_tpu.ops import entropy

PROB_SCALE = 1 << 16
# Tail quantile for sizing integer alphabets: mass outside the range is
# escape-coded (~34 bits each), so it must be rare, not impossible.
TAIL_LOGIT = 18.0  # sigmoid(18) ~ 1 - 1.5e-8


def quantize_pmf(pmf: np.ndarray, escape_mass: Optional[float] = None) -> np.ndarray:
  """Quantize a pmf (last slot = escape) to a 16-bit CDF with no zero freqs."""
  pmf = np.maximum(np.asarray(pmf, np.float64), 0.0)
  if escape_mass is not None:
    pmf = np.append(pmf, max(escape_mass, 1.0 - pmf.sum()))
  total = pmf.sum()
  if total <= 0:
    pmf = np.ones_like(pmf)
    total = pmf.sum()
  freqs = np.maximum(1, np.round(pmf / total * PROB_SCALE)).astype(np.int64)
  # Repair the sum by walking the largest frequencies.
  diff = PROB_SCALE - freqs.sum()
  order = np.argsort(-freqs)
  i = 0
  while diff != 0:
    j = order[i % len(order)]
    step = 1 if diff > 0 else -1
    if freqs[j] + step >= 1:
      freqs[j] += step
      diff -= step
    i += 1
  cdf = np.zeros(len(freqs) + 1, np.uint32)
  np.cumsum(freqs, out=cdf[1:])
  assert cdf[-1] == PROB_SCALE
  return cdf


class FactorizedTables:
  """Per-channel tables for the deep-factorized prior.

  Coding grid: sample = k + offset_c (tfc offset heuristic); the symbol for
  element of channel c is k - kmin[c].
  """

  def __init__(self, tables: CdfTables, kmin: np.ndarray, offset: np.ndarray):
    self.tables = tables
    self.kmin = kmin.astype(np.int32)  # [C]
    self.offset = offset.astype(np.float32)  # [C]

  @property
  def channels(self):
    return len(self.kmin)

  def symbols_from_latent(self, y: np.ndarray) -> np.ndarray:
    """y: [..., C] continuous latent -> table-local int32 symbols."""
    k = np.round(y - self.offset).astype(np.int32)
    return k - self.kmin

  def latent_from_symbols(self, symbols: np.ndarray) -> np.ndarray:
    return (symbols + self.kmin).astype(np.float32) + self.offset

  def channel_indexes(self, shape) -> np.ndarray:
    """Per-element table index = channel index, for a [..., C] layout."""
    idx = np.broadcast_to(np.arange(shape[-1], dtype=np.int32), shape)
    return np.ascontiguousarray(idx)


def build_factorized_tables(
    prior: entropy.DeepFactorizedPrior, prior_params, offset_heuristic: bool = True
) -> FactorizedTables:
  """Extract per-channel quantized CDFs from a DeepFactorizedPrior."""

  def device_side(params):
    mod = prior.bind(params)
    offset = (
        mod.quantization_offset()
        if offset_heuristic
        else jnp.zeros((prior.channels,), jnp.float32)
    )
    lo = mod.quantile_from_logit(-TAIL_LOGIT)
    hi = mod.quantile_from_logit(TAIL_LOGIT)
    return offset, lo, hi

  offset, lo, hi = jax.jit(device_side)(prior_params)
  offset = np.asarray(offset)
  kmin = np.floor(np.asarray(lo) - offset).astype(np.int64) - 1
  kmax = np.ceil(np.asarray(hi) - offset).astype(np.int64) + 1

  # One shared integer grid, per-channel trimmed tables.
  k_lo, k_hi = int(kmin.min()), int(kmax.max())
  grid = np.arange(k_lo, k_hi + 1, dtype=np.float32)  # [L]
  samples = grid[:, None] + offset[None, :]  # [L, C]

  def pmf_fn(params, samples):
    return jnp.exp(prior.bind(params).log_prob_noisy(samples))

  pmf = np.asarray(jax.jit(pmf_fn)(prior_params, jnp.asarray(samples)))  # [L, C]

  cdfs = []
  for c in range(prior.channels):
    sl = pmf[kmin[c] - k_lo : kmax[c] - k_lo + 1, c]
    cdfs.append(quantize_pmf(sl, escape_mass=1e-8))
  return FactorizedTables(CdfTables(cdfs), kmin, offset)


class GaussianTables:
  """64-scale-indexed tables for the conditional Gaussian (loc-shifted grid).

  Coding grid: sample = k + mu; symbol = k - kmin[scale_index]; the scale
  index per element is round(clip(continuous_index, 0, 63)) -- the integer
  snap tfc applies at compression time.
  """

  def __init__(self, tables: CdfTables, kmin: np.ndarray):
    self.tables = tables
    self.kmin = kmin.astype(np.int32)  # [NUM_SCALES]

  def snap_indexes(self, continuous_indexes: np.ndarray) -> np.ndarray:
    idx = np.clip(np.round(continuous_indexes), 0, entropy.NUM_SCALES - 1)
    return idx.astype(np.int32)

  def symbols_from_latent(self, y, mu, idx) -> np.ndarray:
    k = np.round(y - mu).astype(np.int32)
    return k - self.kmin[idx]

  def latent_from_symbols(self, symbols, mu, idx) -> np.ndarray:
    return (symbols + self.kmin[idx]).astype(np.float32) + mu


def build_gaussian_tables(max_half_range: int = 2048) -> GaussianTables:
  """Tables for the fixed 64-entry log-spaced scale grid (entropy.scale_fn).

  Pure host-side computation (the scale table is static, not learned).
  """
  cdfs, kmins = [], []
  tail = 1.5e-8
  z = scipy_norm.isf(tail)
  for i in range(entropy.NUM_SCALES):
    scale = float(np.exp(math.log(entropy.SCALE_MIN) + entropy.SCALE_FACTOR * i))
    half = min(max_half_range, int(math.ceil(scale * z + 0.5)) + 1)
    k = np.arange(-half, half + 1, dtype=np.float64)
    pmf = scipy_norm.cdf((k + 0.5) / scale) - scipy_norm.cdf((k - 0.5) / scale)
    cdfs.append(quantize_pmf(pmf, escape_mass=1e-8))
    kmins.append(-half)
  return GaussianTables(CdfTables(cdfs), np.asarray(kmins))
