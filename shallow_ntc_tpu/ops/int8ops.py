"""Int8 inference path for the decode-side convolutions.

The v5e MXU runs int8 matmuls at 2x its bf16 FLOP rate (394 vs 197 TOPS),
and the decode pipeline is ~80% GEMM time (PERF_NOTES.md stage budget), so
quantizing the phase-space convs to int8 is the next rung of the decode
ladder after the 2 Gpx/s bf16 north star.

Scheme (classic dynamic post-training quantization):
  * weights: symmetric per-output-channel int8 (scale = absmax/127 over the
    reception field). Quantized once per jitted call; XLA constant-folds the
    quantization when params are donated/frozen.
  * activations: symmetric per-tensor dynamic int8 (one absmax reduction per
    conv input -- fuses into the preceding elementwise epilogue).
  * accumulation: int32 on the MXU (`preferred_element_type=int32`), then a
    single f32 rescale by (act_scale * per_channel_weight_scale).

GDN/IGDN, biases, and the final RGB stage stay in float: only the wide
mid-stage / hyper-decoder GEMMs (where the FLOPs are) run int8.

This is an INFERENCE path: the round() in the quantizers has a zero
gradient, so it must stay off during training and SGA iterative inference
(the itinf CLI never enables it). Enable via model/eval config
`decode_dtype="int8"` or env SNTC_INT8_DECODE=1; quality impact is measured
per-checkpoint in results/int8_quality.json (scripts/int8_quality.py).

The reference has no reduced-precision inference path at all (TF f32
everywhere); this module has no counterpart there.
"""

import contextlib
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_FORCED: Optional[bool] = None  # tri-state programmatic override (tests/config)


def mode() -> str:
  """'' (off) | 'all' (every decode conv) | 'syn' (synthesis only).

  'syn' keeps the hyper-decoder float so mu/sigma -- and therefore the RATE
  -- are bit-identical to the float path; int8 error then only touches the
  reconstruction (measured -0.0x dB PSNR, results/int8_quality.json). 'all'
  also quantizes the hyper-decoder: faster, but its mu/sigma error shows up
  as a rate overhead."""
  v = os.environ.get("SNTC_INT8_DECODE", "")
  return {"1": "all"}.get(v, v)


def hyper_exempt() -> bool:
  return mode() == "syn"


def enabled() -> bool:
  if _FORCED is not None:
    return _FORCED
  return mode() in ("all", "syn")


def assert_training_safe():
  """Fail loudly if an int8 gate leaked into a gradient-based process.

  round() in the quantizers has a zero gradient: with a gate set, the
  affected transforms silently stop learning. The train/itinf CLIs call
  this at startup so a leaked SNTC_INT8_* env var is an error, not a
  silently broken run (advisor round 3)."""
  leaked = []
  if mode() in ("all", "syn"):  # effective state, not raw truthiness:
    leaked.append("SNTC_INT8_DECODE")  # SNTC_INT8_DECODE=0/off is fine
  if encode_enabled():
    leaked.append("SNTC_INT8_ENCODE")
  if leaked:
    raise RuntimeError(
        f"{'/'.join(leaked)} set in a training/itinf process: the int8 "
        "quantizers have zero gradient and would silently stop the affected "
        "transforms from learning. Unset the variable(s); int8 is an "
        "inference-only path (eval.py --decode_dtype / compress.py)."
    )


def encode_enabled() -> bool:
  """Separate gate for the analysis (encode) side: SNTC_INT8_ENCODE=1.

  Quantizes the wide stride-1 convs of the analysis stack (ELIC residual
  blocks + attention 1x1s). Unlike the decode gate this perturbs the
  *latents*, so rate AND distortion both move -- the shift acts like extra
  sub-bin noise on latents that get integer-quantized anyway (measured
  deltas in results/int8_quality.json). Inference-only. Env-controlled only
  (the force() override is the *decode* gate's)."""
  return os.environ.get("SNTC_INT8_ENCODE") == "1"


@contextlib.contextmanager
def force(value: Optional[bool]):
  """Override the env gate inside a `with` block (None restores env control).

  NOTE: jit caches by Python callable, not by this flag -- callers flipping
  the flag must use distinct jitted entry points (bench/eval build fresh
  closures per mode)."""
  global _FORCED
  prev = _FORCED
  _FORCED = value
  try:
    yield
  finally:
    _FORCED = prev


def quantize_weight_per_cout(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
  """Symmetric per-output-channel int8; w is [..., c_out] (HWIO)."""
  reduce_axes = tuple(range(w.ndim - 1))
  absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=reduce_axes)
  scale = jnp.maximum(absmax, 1e-12) / 127.0
  wq = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
  return wq.astype(jnp.int8), scale


def quantize_act_per_tensor(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
  """Symmetric per-tensor dynamic int8."""
  absmax = jnp.max(jnp.abs(x.astype(jnp.float32)))
  scale = jnp.maximum(absmax, 1e-12) / 127.0
  xq = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
  return xq.astype(jnp.int8), scale


def quantize_act_per_channel(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
  """Symmetric per-input-channel dynamic int8 (channels-last).

  Per-channel scales on the contraction axis cannot be folded into the
  conv *output* rescale; conv_s1_int8 folds them into the weights instead
  (w'[k,j] = s[k] * w[k,j], requantized per call -- a negligible O(|w|)
  cost next to the conv itself). Post-GDN phase tensors have strongly
  channel-dependent ranges, so this cuts the quantization error several-fold
  vs the per-tensor scheme."""
  reduce_axes = tuple(range(x.ndim - 1))
  absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=reduce_axes)
  scale = jnp.maximum(absmax, 1e-12) / 127.0
  xq = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
  return xq.astype(jnp.int8), scale


def conv_s1_int8(
    x: jax.Array,
    w: jax.Array,
    pad,
    dn,
    out_dtype,
) -> jax.Array:
  """Stride-1 SAME/explicit-pad conv on the int8 MXU, f32 rescaled output.

  Drop-in for lax.conv_general_dilated(x, w, (1,1), pad, dn) on NHWC/HWIO;
  `pad` may be a string or explicit pairs, exactly as the float call sites
  in ops/fast_deconv.py pass it.
  """
  xq, sx = quantize_act_per_channel(x)
  # Fold the per-input-channel activation scales into the weights along the
  # contraction (I) axis of HWIO, then quantize per-output-channel.
  w_folded = w.astype(jnp.float32) * sx[:, None]
  wq, sw = quantize_weight_per_cout(w_folded)
  out = jax.lax.conv_general_dilated(
      xq, wq, (1, 1), pad, dimension_numbers=dn,
      preferred_element_type=jnp.int32,
  )
  return (out.astype(jnp.float32) * sw).astype(out_dtype)
