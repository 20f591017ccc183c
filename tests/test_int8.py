"""Int8 decode path: quantizer correctness and end-to-end decode accuracy.

The int8 path (ops/int8ops.py) is an inference-only rung of the decode
ladder; these tests bound its numerical distance from the float path. There
is no reference counterpart (the TF reference runs f32 everywhere).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shallow_ntc_tpu.ops import fast_deconv as fd
from shallow_ntc_tpu.ops import int8ops


def _rel_err(a, b):
  a = np.asarray(a, np.float64)
  b = np.asarray(b, np.float64)
  return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)


def test_weight_quantization_roundtrip_exact():
  # Weights already on the int8 grid (scaled) quantize losslessly.
  rng = np.random.default_rng(0)
  ints = rng.integers(-127, 128, size=(3, 3, 8, 16)).astype(np.float32)
  ints[..., 0] = 0.0
  ints[0, 0, 0, 0] = 127.0  # pin absmax so the scale is exactly 1/127 * max
  w = ints * 0.013
  wq, scale = int8ops.quantize_weight_per_cout(jnp.asarray(w))
  back = np.asarray(wq, np.float32) * np.asarray(scale)
  np.testing.assert_allclose(back[..., 0], w[..., 0], atol=1e-6)


def test_act_quantization_bounds():
  rng = np.random.default_rng(1)
  x = rng.normal(size=(2, 8, 8, 32)).astype(np.float32)
  xq, scale = int8ops.quantize_act_per_tensor(jnp.asarray(x))
  back = np.asarray(xq, np.float32) * float(scale)
  # Max elementwise error is half a quantization step.
  assert np.max(np.abs(back - x)) <= float(scale) * 0.5 + 1e-7
  assert np.asarray(xq).dtype == np.int8


def test_conv_s1_int8_close_to_f32():
  rng = np.random.default_rng(2)
  x = rng.normal(size=(2, 12, 12, 24)).astype(np.float32)
  w = (rng.normal(size=(3, 3, 24, 40)) * 0.1).astype(np.float32)
  dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
  ref = jax.lax.conv_general_dilated(
      jnp.asarray(x), jnp.asarray(w), (1, 1), "SAME", dimension_numbers=dn)
  got = int8ops.conv_s1_int8(jnp.asarray(x), jnp.asarray(w), "SAME", dn,
                             jnp.float32)
  # Per-tensor act + per-channel weight int8: ~1% relative error on gaussian
  # data (two 7-bit quantizations through an int32 accumulator).
  assert _rel_err(got, ref) < 0.02


def test_phase_conv_int8_gate_routes_and_tracks_float():
  rng = np.random.default_rng(3)
  z = rng.normal(size=(2, 6, 9, 16)).astype(np.float32)
  k = (rng.normal(size=(5, 5, 16, 12)) * 0.2).astype(np.float32)
  b = rng.normal(size=(12,)).astype(np.float32)
  ref = fd.fast_conv_transpose(jnp.asarray(z), jnp.asarray(k), jnp.asarray(b), 2)
  with int8ops.force(True):
    got = fd.fast_conv_transpose(jnp.asarray(z), jnp.asarray(k), jnp.asarray(b), 2)
  with int8ops.force(False):
    off = fd.fast_conv_transpose(jnp.asarray(z), jnp.asarray(k), jnp.asarray(b), 2)
  np.testing.assert_allclose(np.asarray(off), np.asarray(ref), atol=0)
  err = _rel_err(got, ref)
  assert 1e-7 < err < 0.02, err  # routed (not bit-identical) but close


def test_full_synthesis_int8_decode_accuracy():
  """Flagship TwoLayerResSynthesis decode: int8 output stays close to f32."""
  from shallow_ntc_tpu.models import transforms

  rng = jax.random.PRNGKey(0)
  syn = transforms.TwoLayerResSynthesis(
      channels=(12, 3), strides=(8, 2), kernel_sizes=(13, 5),
      activation_type="igdn", res_type="conv")
  z = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 6, 32), jnp.float32)
  params = syn.init(rng, z)
  ref = syn.apply(params, z, training=False)
  with int8ops.force(True):
    got = syn.apply(params, z, training=False)
  err = _rel_err(got, ref)
  assert err < 0.03, err
  # Signal-to-quantization-noise of the decoded image > 30 dB.
  snr = 10 * np.log10(
      float(jnp.mean(ref.astype(jnp.float32) ** 2))
      / max(float(jnp.mean((got - ref).astype(jnp.float32) ** 2)), 1e-20))
  assert snr > 30.0, snr


def test_syn_mode_keeps_hyper_decoder_and_rate_float(monkeypatch):
  """SNTC_INT8_DECODE=syn: mu/sigma (and therefore bpp) are bit-identical
  to the float path; only the synthesis output moves."""
  from shallow_ntc_tpu.models import mshyper as mshyper_models

  model = mshyper_models.Model(
      scheduled_num_steps=50,
      rd_lambda=0.01,
      transform_config=dict(
          analysis=dict(cls="CNNAnalysis", channels_base=8, output_channels=12),
          synthesis=dict(cls="TwoLayerResSynthesis", channels=(6, 3),
                         strides=(8, 2), kernel_sizes=(13, 5),
                         activation_type="igdn", res_type="conv"),
          hyper_analysis=dict(cls="HyperAnalysisSmall", bottleneck_size=12),
          hyper_synthesis=dict(cls="HyperSynthesisSmall", bottleneck_size=12),
      ),
  )
  x = jax.random.uniform(jax.random.PRNGKey(0), (4, 64, 96, 3), jnp.float32)
  params = model.init(jax.random.PRNGKey(1), x, training=False)["params"]

  def frame(training=False):
    return model.apply({"params": params}, x, training=training, rng=None,
                       step=0, method=type(model).end_to_end_frame_loss)

  monkeypatch.delenv("SNTC_INT8_DECODE", raising=False)
  _, m_f32, rec_f32 = jax.tree_util.tree_map(np.asarray, frame())
  monkeypatch.setenv("SNTC_INT8_DECODE", "syn")
  _, m_syn, rec_syn = jax.tree_util.tree_map(np.asarray, frame())

  np.testing.assert_array_equal(m_syn["bpp"], m_f32["bpp"])  # rate exact
  assert not np.array_equal(rec_syn, rec_f32)  # synthesis actually int8
  assert _rel_err(rec_syn.astype(np.float64),
                  rec_f32.astype(np.float64)) < 0.05


def test_int8_encode_routes_elic_analysis(monkeypatch):
  """SNTC_INT8_ENCODE quantizes the wide stride-1 analysis convs: latents
  move slightly but stay close; the gate off is bit-identical."""
  from shallow_ntc_tpu.models import elic

  ana = elic.ElicAnalysis(channels=(32, 32, 32, 48))
  x = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 96, 3), jnp.float32)
  params = ana.init(jax.random.PRNGKey(1), x)
  monkeypatch.delenv("SNTC_INT8_ENCODE", raising=False)
  ref = ana.apply(params, x)
  monkeypatch.setenv("SNTC_INT8_ENCODE", "1")
  got = ana.apply(params, x)
  monkeypatch.delenv("SNTC_INT8_ENCODE", raising=False)
  off = ana.apply(params, x)
  np.testing.assert_array_equal(np.asarray(off), np.asarray(ref))
  err = _rel_err(got, ref)
  assert 1e-7 < err < 0.05, err


def test_int8_env_gate_default_off(monkeypatch):
  monkeypatch.delenv("SNTC_INT8_DECODE", raising=False)
  assert not int8ops.enabled()
  monkeypatch.setenv("SNTC_INT8_DECODE", "1")
  assert int8ops.enabled()
  with int8ops.force(False):
    assert not int8ops.enabled()


def test_assert_training_safe_raises_on_leaked_gate(monkeypatch):
  """A leaked SNTC_INT8_* gate must fail loudly in train/itinf processes

  (zero-gradient quantizers would otherwise silently stop learning)."""
  monkeypatch.delenv("SNTC_INT8_DECODE", raising=False)
  monkeypatch.delenv("SNTC_INT8_ENCODE", raising=False)
  int8ops.assert_training_safe()  # clean env: no-op
  monkeypatch.setenv("SNTC_INT8_DECODE", "syn")
  with pytest.raises(RuntimeError, match="zero gradient"):
    int8ops.assert_training_safe()
  monkeypatch.delenv("SNTC_INT8_DECODE")
  monkeypatch.setenv("SNTC_INT8_ENCODE", "1")
  with pytest.raises(RuntimeError, match="SNTC_INT8_ENCODE"):
    int8ops.assert_training_safe()
