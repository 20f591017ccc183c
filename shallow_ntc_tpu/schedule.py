"""Training schedules (LR / rd-lambda / SGA-tau).

JAX port of the reference's schedule library (/root/reference/common/schedule.py),
with optax-compatible callables instead of Keras LearningRateSchedule objects.
All schedules are pure functions of a (possibly traced) integer step, so they
evaluate inside jit / lax.scan without retracing.
"""

import enum
import math
from typing import Sequence

import jax.numpy as jnp


class InterpolationType(enum.Enum):
  CONSTANT = "constant"
  LINEAR = "linear"
  SINE = "sine"


def piecewise_constant_schedule(step, boundaries: Sequence[int], values: Sequence[float]):
  """Piecewise constant: values[i] on [boundaries[i-1], boundaries[i]).

  Mirrors reference schedule.py:35-48.
  """
  if len(values) != len(boundaries) + 1:
    raise ValueError(
        "The number of values must be one more than the number of boundaries: "
        f"{len(values)} != {len(boundaries) + 1}"
    )
  step = jnp.asarray(step)
  boundaries_arr = jnp.asarray(boundaries, dtype=step.dtype)
  values_arr = jnp.asarray(values, dtype=jnp.float32)
  index = jnp.sum((boundaries_arr <= step[..., None]).astype(jnp.int32), axis=-1)
  return values_arr[index]


def piecewise_sine_schedule(step, boundaries: Sequence[int], values: Sequence[float]):
  """Sine interpolation between (boundaries[i], values[i]) knots.

  Mirrors reference schedule.py:51-90: constant extension outside the knot
  range; in between, y = y_l + (y_r - y_l) * sin(0.5*pi*(x-x_l)/(x_r-x_l)).
  Branch-free (vector select) instead of tf.case, so it jits cleanly.
  """
  if len(values) != len(boundaries):
    raise ValueError(
        "The number of values must equal the number of boundaries: "
        f"{len(values)} != {len(boundaries)}"
    )
  step = jnp.asarray(step)
  boundaries_arr = jnp.asarray(boundaries, dtype=jnp.float32)
  values_arr = jnp.asarray(values, dtype=jnp.float32)
  x = step.astype(jnp.float32)

  comp = x >= boundaries_arr
  index = jnp.clip(jnp.sum(comp.astype(jnp.int32)), 1, len(values) - 1)
  xl, xr = boundaries_arr[index - 1], boundaries_arr[index]
  yl, yr = values_arr[index - 1], values_arr[index]
  interp = yl + (yr - yl) * jnp.sin((x - xl) / (xr - xl) * 0.5 * math.pi)

  out = jnp.where(jnp.all(comp), values_arr[-1], interp)
  out = jnp.where(jnp.all(~comp), values_arr[0], out)
  return out


def schedule_at_step(step, vals, boundaries, interpolation, warmup_steps: int = 0):
  """Schedule value at `step`, with optional linear warmup (schedule.py:93-125)."""
  step = jnp.asarray(step)
  if len(boundaries) == 0:
    return jnp.float32(jnp.squeeze(jnp.asarray(vals, jnp.float32)))
  if interpolation == InterpolationType.CONSTANT:
    value = piecewise_constant_schedule(step, boundaries, vals)
  elif interpolation == InterpolationType.SINE:
    value = piecewise_sine_schedule(step, boundaries, vals)
  else:
    raise NotImplementedError(interpolation)

  if warmup_steps > 0:
    value = value * jnp.minimum(1.0, (step.astype(jnp.float32) + 1) / warmup_steps)
  return value


def compression_schedule(
    base_learning_rate: float,
    total_num_steps: int,
    warmup_until: float = 0.0,
    warmup_steps=None,
    drop_after: float = 0.85,
    drop_factor: float = 0.1,
):
  """LR schedule for compression: linear warmup + late constant drop.

  Returns an optax-compatible `step -> lr` callable. Mirrors
  reference schedule.py:155-177 (CompressionSchedule).
  """
  if warmup_steps is None:
    assert warmup_until is not None
    warmup_steps = int(warmup_until * total_num_steps)

  boundaries = [int(drop_after * total_num_steps)]
  vals = [1.0, drop_factor]

  def lr_fn(step):
    return base_learning_rate * schedule_at_step(
        step, vals, boundaries, InterpolationType.CONSTANT, warmup_steps=warmup_steps
    )

  return lr_fn


# rd-lambda warm-up constants (reference: mshyper/models.py:39-41).
HIGHER_LAMBDA_UNTIL = 0.2
HIGHER_LAMBDA_FACTOR = 10.0


def scheduled_rd_lambda(rd_lambda: float, step, scheduled_num_steps: int, itinf: bool = False):
  """10x rd_lambda during the first 20% of training when lambda <= 0.01.

  Mirrors mshyper/models.py:168-184; disabled during iterative inference.
  """
  rd_lambda_arr = jnp.float32(rd_lambda)
  if rd_lambda <= 0.01 and not itinf:
    factor = schedule_at_step(
        step,
        vals=[HIGHER_LAMBDA_FACTOR, 1.0],
        boundaries=[int(scheduled_num_steps * HIGHER_LAMBDA_UNTIL)],
        interpolation=InterpolationType.CONSTANT,
    )
    return rd_lambda_arr * factor
  return rd_lambda_arr
