"""Elementwise TF-vs-JAX numerical parity for the flagship compute path.

Tier (a) of the golden-parity plan: TF 2.21 is available in the environment
(tensorflow_compression is not), so

  * conv geometry runs through genuine tf.nn.conv2d / conv2d_transpose SAME
    ops -- what keras Conv2D/Conv2DTranspose lower to -- against our *actual*
    compute path (FastConvTranspose subpixel phase decomposition + fused
    phase-space decoders + the Pallas final-stage kernel), not just flax
    layers; this nails the SURVEY section-7 "off-by-one trap" for k13s8,
    k16/18s16, k6s4, k5s2;
  * tfc behaviors (GDN sqrt-reparameterization, DeepFactorized CDF) are
    re-derived in tests/tf_mirror.py from their published parameterizations
    and cross-checked elementwise;
  * scripts/convert_tf_checkpoint.py is exercised end to end on a real
    on-disk tf.train.Checkpoint written in the reference's object layout
    (see test_checkpoint_converter_end_to_end).

Measured errors are summarized in PARITY_REPORT.md.
"""

import json
import os

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from shallow_ntc_tpu.models import transforms  # noqa: E402
from shallow_ntc_tpu.ops import entropy  # noqa: E402

from tests import tf_mirror  # noqa: E402


def _init_transform(cfg, input_shape, seed=0):
  mod = transforms.build_transform(dict(cfg))
  variables = mod.init(jax.random.PRNGKey(seed), jnp.zeros(input_shape))
  return mod, jax.device_get(variables["params"])


def _rand(shape, seed, scale=1.0):
  return (np.random.default_rng(seed).normal(0, scale, shape)).astype(np.float32)


def _max_err(a, b):
  return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


# ---------------------------------------------------------------------------
# GDN: our flax module vs the tfc math re-derivation, identical raw params.
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("inverse", [False, True])
def test_gdn1_parity(inverse):
  c = 12
  rng = np.random.default_rng(3)
  beta_raw = rng.uniform(0.5, 1.5, (c,)).astype(np.float32)
  gamma_raw = rng.uniform(0.0, 0.4, (c, c)).astype(np.float32)
  x = _rand((2, 9, 11, c), 4, 2.0)

  ours = transforms.GDN1(inverse=inverse).apply(
      {"params": {"beta": beta_raw, "gamma": gamma_raw}}, jnp.asarray(x))
  theirs = tf_mirror.TFGDN(beta_raw, gamma_raw, inverse)(tf.constant(x)).numpy()
  np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("inverse", [False, True])
def test_classic_gdn_parity(inverse):
  c = 8
  rng = np.random.default_rng(5)
  beta_raw = rng.uniform(0.5, 1.5, (c,)).astype(np.float32)
  gamma_raw = rng.uniform(0.0, 0.4, (c, c)).astype(np.float32)
  x = _rand((2, 7, 7, c), 6, 2.0)

  ours = transforms.GDN(inverse=inverse, alpha=2.0, epsilon=0.5).apply(
      {"params": {"beta": beta_raw, "gamma": gamma_raw}}, jnp.asarray(x))
  theirs = tf_mirror.TFGDN(beta_raw, gamma_raw, inverse, alpha=2.0,
                           epsilon=0.5)(tf.constant(x)).numpy()
  np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-5, atol=1e-6)


def test_gdn_parameter_lower_bound_parity():
  """Raw params below the bound must clamp identically (tfc GDNParameter)."""
  c = 4
  beta_raw = np.array([-0.5, 0.0, 1e-4, 2.0], np.float32)
  gamma_raw = np.full((c, c), -0.1, np.float32)
  x = _rand((1, 5, 5, c), 7)
  ours = transforms.GDN1().apply(
      {"params": {"beta": beta_raw, "gamma": gamma_raw}}, jnp.asarray(x))
  theirs = tf_mirror.TFGDN(beta_raw, gamma_raw, False)(tf.constant(x)).numpy()
  np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Whole-transform parity: our registry-built modules (fused/Pallas paths
# engaged) vs raw-TF mirrors with converted weights.
# ---------------------------------------------------------------------------
TRANSFORM_CASES = [
    ("elic_analysis",
     dict(cls="ElicAnalysis", channels=(8, 10, 12, 14), num_residual_blocks=2),
     (2, 32, 32, 3), 2e-5),
    ("elic_analysis_3conv",
     dict(cls="ElicAnalysis", channels=(8, 10, 12), kernel_sizes=(5, 5, 5),
          strides=(2, 2, 2), num_residual_blocks=1),
     (1, 16, 16, 3), 2e-5),
    ("elic_synthesis",
     dict(cls="ElicSynthesis", channels=(12, 10, 8, 3), num_residual_blocks=1),
     (1, 4, 4, 14), 5e-5),
    ("two_layer_res_conv",
     dict(cls="TwoLayerResSynthesis", channels=(12, 3), strides=(8, 2),
          kernel_sizes=(13, 5), activation_type="igdn", res_type="conv"),
     (2, 4, 6, 16), 1e-4),
    ("two_layer_res_d2s",
     dict(cls="TwoLayerResSynthesis", channels=(12, 3), strides=(8, 2),
          kernel_sizes=(13, 5), activation_type="igdn", res_type="d2s"),
     (2, 4, 4, 96), 1e-4),
    ("two_layer",
     dict(cls="TwoLayerSynthesis", channels=(24, 3), strides=(8, 2),
          kernel_sizes=(13, 5), activation_type="igdn"),
     (2, 4, 6, 16), 1e-4),
    ("jpegl_k16",
     dict(cls="JPEGLikeSynthesis", kernel_size=16, strides=16), (2, 4, 6, 20),
     5e-5),
    ("jpegl_k18_offset",
     dict(cls="JPEGLikeSynthesis", kernel_size=18, strides=16, use_offset=True),
     (2, 4, 6, 20), 5e-5),
    ("jpegl_hyper",
     dict(cls="JPEGLikeHyperSynthesis", bottleneck_size=10, kernel_size=6),
     (2, 4, 6, 10), 5e-5),
    ("hyper_analysis", dict(cls="HyperAnalysis", bottleneck_size=8),
     (2, 16, 16, 12), 2e-5),
    ("hyper_synthesis", dict(cls="HyperSynthesis", bottleneck_size=8),
     (2, 4, 4, 8), 2e-5),
    ("cnn_analysis", dict(cls="CNNAnalysis", channels_base=8),
     (2, 32, 32, 3), 2e-5),
    ("cnn_synthesis", dict(cls="CNNSynthesis", channels_base=8),
     (2, 4, 4, 8), 2e-5),
]

PARITY_ERRORS = {}


@pytest.mark.parametrize("name,cfg,in_shape,tol",
                         TRANSFORM_CASES, ids=[c[0] for c in TRANSFORM_CASES])
def test_transform_tf_parity(name, cfg, in_shape, tol):
  mod, params = _init_transform(cfg, in_shape, seed=hash(name) % 2**31)
  x = _rand(in_shape, seed=11, scale=1.0)

  ours = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))
  mirror = tf_mirror.mirror_transform(dict(cfg), params)
  theirs = mirror(tf.constant(x)).numpy()

  assert ours.shape == theirs.shape, (ours.shape, theirs.shape)
  PARITY_ERRORS[name] = _max_err(ours, theirs)
  np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=tol)


# ---------------------------------------------------------------------------
# Entropy-model math vs independent float64 oracles.
# ---------------------------------------------------------------------------
def test_noisy_normal_vs_scipy():
  scipy_stats = pytest.importorskip("scipy.stats")
  rng = np.random.default_rng(8)
  y = rng.uniform(-12, 12, (4096,)).astype(np.float32)
  scale = rng.uniform(0.11, 30.0, (4096,)).astype(np.float32)

  ours = np.asarray(
      entropy.noisy_normal_log_prob(jnp.asarray(y), jnp.asarray(scale)))
  y64, s64 = y.astype(np.float64), scale.astype(np.float64)
  p = scipy_stats.norm.cdf(y64 + 0.5, scale=s64) - scipy_stats.norm.cdf(
      y64 - 0.5, scale=s64)
  bulk = p > 1e-8
  np.testing.assert_allclose(ours[bulk], np.log(p[bulk]), rtol=1e-4,
                             atol=1e-5)
  # Below the tfc likelihood bound (1e-9) the log-prob clamps -- and the clamp
  # must hold on every backend (a subnormal floor would flush to 0 on TPU).
  tail = p < 1e-10
  if tail.any():
    np.testing.assert_allclose(ours[tail], np.log(1e-9), rtol=1e-5)


def _np_deep_factorized_logits(x, matrices, biases, factors):
  """Independent per-channel loop oracle for the DeepFactorized CDF logits."""

  def softplus(v):
    return np.logaddexp(0.0, v)

  n, c = x.shape
  out = np.zeros_like(x, dtype=np.float64)
  for ch in range(c):
    logits = x[:, ch].astype(np.float64)[None, :]  # (1, N)
    for i, m in enumerate(matrices):
      logits = softplus(m[ch].astype(np.float64)) @ logits + biases[i][ch]
      if i < len(matrices) - 1:
        logits = logits + np.tanh(factors[i][ch]) * np.tanh(logits)
    out[:, ch] = logits[0]
  return out


def test_deep_factorized_logits_vs_oracles():
  c = 6
  prior = entropy.DeepFactorizedPrior(channels=c)
  variables = prior.init(jax.random.PRNGKey(0), jnp.zeros((1, c)))
  params = jax.device_get(variables["params"])
  # Perturb from init so the test is not trivially symmetric.
  rng = np.random.default_rng(9)
  params = {k: v + rng.normal(0, 0.3, v.shape).astype(np.float32)
            for k, v in params.items()}

  x = rng.uniform(-20, 20, (512, c)).astype(np.float32)
  ours = np.asarray(
      prior.apply({"params": params}, jnp.asarray(x), method="logits_cdf"))

  matrices = [params[f"matrix_{i}"] for i in range(4)]
  biases = [params[f"bias_{i}"] for i in range(4)]
  factors = [params[f"factor_{i}"] for i in range(3)]

  oracle = _np_deep_factorized_logits(x, matrices, biases, factors)
  np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-4)

  tf_prior = tf_mirror.mirror_prior(params)
  theirs = tf_prior.logits_cdf(tf.constant(x)).numpy()
  np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_deep_factorized_noisy_log_prob_vs_float64():
  c = 4
  prior = entropy.DeepFactorizedPrior(channels=c)
  variables = prior.init(jax.random.PRNGKey(1), jnp.zeros((1, c)))
  params = jax.device_get(variables["params"])

  rng = np.random.default_rng(10)
  y = rng.uniform(-15, 15, (512, c)).astype(np.float32)
  ours = np.asarray(
      prior.apply({"params": params}, jnp.asarray(y), method="log_prob_noisy"))

  matrices = [params[f"matrix_{i}"] for i in range(4)]
  biases = [params[f"bias_{i}"] for i in range(4)]
  factors = [params[f"factor_{i}"] for i in range(3)]

  def sigmoid64(v):
    return 1.0 / (1.0 + np.exp(-v))

  up = _np_deep_factorized_logits(y + 0.5, matrices, biases, factors)
  lo = _np_deep_factorized_logits(y - 0.5, matrices, biases, factors)
  p = sigmoid64(up) - sigmoid64(lo)
  keep = p > 1e-8  # below the tfc likelihood bound the log-prob clamps
  np.testing.assert_allclose(ours[keep], np.log(p[keep]), rtol=1e-3,
                             atol=1e-4)


def test_quantization_offset_median_vs_brentq():
  scipy_opt = pytest.importorskip("scipy.optimize")
  c = 5
  prior = entropy.DeepFactorizedPrior(channels=c)
  variables = prior.init(jax.random.PRNGKey(2), jnp.zeros((1, c)))
  params = jax.device_get(variables["params"])
  rng = np.random.default_rng(11)
  params = {k: v + rng.normal(0, 0.2, v.shape).astype(np.float32)
            for k, v in params.items()}

  med = np.asarray(prior.apply({"params": params}, method="median"))

  matrices = [params[f"matrix_{i}"] for i in range(4)]
  biases = [params[f"bias_{i}"] for i in range(4)]
  factors = [params[f"factor_{i}"] for i in range(3)]

  for ch in range(c):
    def f(v, ch=ch):
      x = np.zeros((1, c), np.float32)
      x[0, ch] = v
      return _np_deep_factorized_logits(x, matrices, biases, factors)[0, ch]

    root = scipy_opt.brentq(f, -200.0, 200.0, xtol=1e-9)
    np.testing.assert_allclose(med[ch], root, atol=1e-5)


# ---------------------------------------------------------------------------
# Checkpoint converter, end to end on a real on-disk TF checkpoint.
# ---------------------------------------------------------------------------
def _flagship_style_config():
  """Tiny mshyper config in the flagship (two_layer_syn) architecture."""
  return dict(
      model_family="mshyper",
      model_config=dict(
          scheduled_num_steps=100,
          rd_lambda=0.02,
          optimizer_config=dict(learning_rate=1e-4, warmup_until=0.0),
          transform_config=dict(
              analysis=dict(cls="ElicAnalysis", channels=(8, 10, 12, 14),
                            num_residual_blocks=1),
              synthesis=dict(cls="TwoLayerResSynthesis", channels=(6, 3),
                             strides=(8, 2), kernel_sizes=(13, 5),
                             activation_type="igdn", res_type="conv"),
              hyper_analysis=dict(cls="HyperAnalysis", bottleneck_size=14),
              hyper_synthesis=dict(cls="HyperSynthesis", bottleneck_size=14),
          ),
          latent_config=dict(uq=dict(method="unoise")),
      ),
  )


def test_checkpoint_converter_end_to_end(tmp_path):
  """Write a reference-layout TF checkpoint, convert it, and require the
  restored flax params to be bit-identical + transform outputs to agree."""
  from scripts import convert_tf_checkpoint
  from shallow_ntc_tpu import eval_lib, train_lib
  from shallow_ntc_tpu.utils import runname as runname_utils

  config = _flagship_style_config()
  model, optimizer_config = train_lib.build_model_from_config(
      config["model_config"], "mshyper")
  state, _, _ = train_lib.create_train_state(
      model, optimizer_config, jax.random.PRNGKey(42), (64, 64, 3))
  golden = jax.device_get(state.params)

  # --- TF side: reference-shaped workdir with a real tf.train.Checkpoint.
  tf_model = tf_mirror.TFModelMirror(
      config["model_config"]["transform_config"], golden, family="mshyper")
  workdir_tf = tmp_path / "tf_workdir"
  ckpt_dir = workdir_tf / "train" / "checkpoints"
  os.makedirs(ckpt_dir)
  runname_utils.dump_json(config, str(workdir_tf / "config.json"))
  tf.train.Checkpoint(model=tf_model).save(str(ckpt_dir / "ckpt"))

  # --- Convert.
  out_workdir = tmp_path / "converted"
  convert_tf_checkpoint.convert(str(workdir_tf), str(out_workdir), "mshyper")

  # --- Restore through the normal eval path.
  model2, params2, _ = eval_lib.load_latest_ckpt(str(out_workdir))

  flat_golden = jax.tree_util.tree_leaves_with_path(golden)
  flat_conv = {jax.tree_util.keystr(p): v
               for p, v in jax.tree_util.tree_leaves_with_path(params2)}
  assert len(flat_golden) == len(flat_conv)
  for path, val in flat_golden:
    key = jax.tree_util.keystr(path)
    np.testing.assert_array_equal(
        np.asarray(val), np.asarray(flat_conv[key]), err_msg=key)

  # --- And the converted model computes what the TF checkpoint computed.
  x = _rand((1, 64, 64, 3), 21, 0.3)
  y_tf = tf_model._analysis(tf.constant(x)).numpy()
  y_jax = np.asarray(model2.apply(
      {"params": params2}, jnp.asarray(x),
      method=lambda m, v: m._analysis(v)))
  np.testing.assert_allclose(y_jax, y_tf, rtol=1e-4, atol=2e-5)

  z = _rand((1, 4, 4, 14), 22)  # synthesis input = y (bottleneck) channels
  r_tf = tf_model._synthesis(tf.constant(z)).numpy()
  r_jax = np.asarray(model2.apply(
      {"params": params2}, jnp.asarray(z),
      method=lambda m, v: m._synthesis(v)))
  np.testing.assert_allclose(r_jax, r_tf, rtol=1e-4, atol=1e-4)


def test_converter_rejects_unmatched(tmp_path):
  """Unknown TF variables must fail loudly, not silently skip."""
  from scripts import convert_tf_checkpoint
  from shallow_ntc_tpu.utils import runname as runname_utils

  config = _flagship_style_config()
  workdir_tf = tmp_path / "tf_workdir"
  ckpt_dir = workdir_tf / "train" / "checkpoints"
  os.makedirs(ckpt_dir)
  runname_utils.dump_json(config, str(workdir_tf / "config.json"))

  class Stray(tf.Module):
    def __init__(self):
      super().__init__()
      self._analysis = tf.Module()
      self._analysis.bogus = tf.Variable(np.zeros((3, 3), np.float32))

  tf.train.Checkpoint(model=Stray()).save(str(ckpt_dir / "ckpt"))
  with pytest.raises(Exception):
    convert_tf_checkpoint.convert(
        str(workdir_tf), str(tmp_path / "out"), "mshyper")


# ---------------------------------------------------------------------------
# FULL-MODEL parity: the complete loss on identical weights (VERDICT r2 #2).
#
# Composes the per-block mirrors into one assertion: reflect padding ->
# analysis/hyper pair -> all three quantization branches of both entropy
# models -> bpp accounting -> [0,255] distortion -> lambda warm-up ->
# rd_loss, against the reference's end_to_end_frame_loss semantics
# (/root/reference/mshyper/models.py:234-359). Stochastic branches replay
# the JAX model's exact noise/Gumbel draws into the float64 mirror.
# ---------------------------------------------------------------------------
from shallow_ntc_tpu import train_lib  # noqa: E402


def _perturb(params, seed, scale=0.03):
  rng = np.random.default_rng(seed)
  return jax.tree_util.tree_map(
      lambda v: np.asarray(v) + rng.normal(0, scale, v.shape).astype(v.dtype),
      jax.device_get(params))


def _build_full_model(uq_method, seed=7, tiny=True):
  tc = dict(
      analysis=dict(cls="ElicAnalysis",
                    channels=(8, 10, 12, 14) if tiny else (192, 192, 192, 320),
                    **(dict(num_residual_blocks=1) if tiny else {})),
      synthesis=dict(cls="TwoLayerResSynthesis",
                     channels=(6, 3) if tiny else (12, 3), strides=(8, 2),
                     kernel_sizes=(13, 5), activation_type="igdn",
                     res_type="conv"),
      hyper_analysis=dict(cls="HyperAnalysis",
                          bottleneck_size=14 if tiny else 320),
      hyper_synthesis=dict(cls="HyperSynthesis",
                           bottleneck_size=14 if tiny else 320),
  )
  uq = dict(method=uq_method)
  if uq_method == "sga":
    uq.update(tau_r=1e-3, tau_ub=0.5, tau_t0=20.0)
  mc = dict(scheduled_num_steps=100, rd_lambda=0.002,
            transform_config=tc, latent_config=dict(uq=uq))
  model, _ = train_lib.build_model_from_config(mc, "mshyper")
  img = np.random.default_rng(seed).uniform(
      -0.5, 0.5, (1, 96, 112, 3)).astype(np.float32)
  variables = model.init(jax.random.PRNGKey(seed), jnp.asarray(img),
                         training=False)
  params = _perturb(variables["params"], seed + 1)
  tf_model = tf_mirror.TFModelMirror(tc, params)
  return model, params, tf_model, mc


def _jax_full_loss(model, params, img, training, step, rng=None):
  rd_loss, metrics, _ = model.apply(
      {"params": params}, jnp.asarray(img), training, rng=rng, step=step,
      method=type(model).end_to_end_frame_loss)
  return {k: float(v) for k, v in {**metrics, "rd_loss": rd_loss}.items()
          if np.ndim(v) == 0}


def _replay_draws(model, params, img, rng):
  """Reproduce the exact stochastic draws frame_loss_given_latent_rvs makes
  (rng -> split -> rng_z for z, rng_y for y; see models/mshyper.py)."""
  lat = model.apply({"params": params}, jnp.asarray(img),
                    method=type(model).infer_latent_rvs)
  z_shape = tuple(lat.uq[0].loc.shape)
  y_shape = tuple(lat.uq[1].loc.shape)
  rng_z, rng_y = jax.random.split(rng)
  draws = dict(
      noise_z=np.asarray(
          jax.random.uniform(rng_z, z_shape, jnp.float32, -0.5, 0.5),
          np.float64),
      noise_y=np.asarray(
          jax.random.uniform(rng_y, y_shape, jnp.float32, -0.5, 0.5),
          np.float64),
      logistic_z=np.asarray(
          jax.random.logistic(rng_z, z_shape, jnp.float32), np.float64),
      logistic_y=np.asarray(
          jax.random.logistic(rng_y, y_shape, jnp.float32), np.float64),
  )
  return draws


FULL_MODEL_CASES = [
    # (uq_method, training, step) -- step 10 is inside the 20% lambda warm-up
    # window, step 90 is after it; rd_lambda=0.002 <= 0.01 so warm-up engages.
    ("unoise", False, 90),
    ("unoise", True, 10),
    ("unoise", True, 90),
    ("mixedq", False, 90),
    ("mixedq", True, 10),
    ("sga", False, 90),
    ("sga", True, 10),
    ("sga", True, 90),
]


@pytest.mark.parametrize(
    "uq_method,training,step", FULL_MODEL_CASES,
    ids=[f"{m}-{'train' if t else 'eval'}-step{s}" for m, t, s in FULL_MODEL_CASES])
def test_full_model_loss_parity(uq_method, training, step):
  model, params, tf_model, mc = _build_full_model(uq_method)
  img = np.random.default_rng(3).uniform(
      -0.5, 0.5, (2, 96, 112, 3)).astype(np.float32)  # pads 96x112 -> 128x128

  rng = jax.random.PRNGKey(123) if training else None
  ours = _jax_full_loss(model, params, img, training, step, rng=rng)

  kwargs = {}
  if training:
    kwargs = _replay_draws(model, params, img, jax.random.PRNGKey(123))
  if uq_method == "sga":
    uq = mc["latent_config"]["uq"]
    kwargs["sga_tau"] = tf_mirror.np_sga_tau(
        step, r=uq["tau_r"], ub=uq["tau_ub"], t0=uq["tau_t0"])
  theirs = tf_mirror.mirror_full_frame_loss(
      tf_model, img, uq_method=uq_method, training=training,
      rd_lambda=mc["rd_lambda"], scheduled_num_steps=mc["scheduled_num_steps"],
      downsample_factor=model.downsample_factor, step=step,
      offset_heuristic=model.offset_heuristic, **kwargs)

  assert ours["sched_rd_lambda"] == pytest.approx(theirs["sched_rd_lambda"])
  errs = {}
  for k in ("rd_loss", "bpp", "mse", "psnr"):
    errs[k] = abs(ours[k] - theirs[k]) / max(abs(theirs[k]), 1e-9)
  case = f"full_model/{uq_method}-{'train' if training else 'eval'}-step{step}"
  PARITY_ERRORS[case] = errs
  for k, e in errs.items():
    assert e < 1e-4, (k, ours[k], theirs[k], errs)


def test_full_model_loss_parity_flagship_geometry():
  """Eval-mode full-loss parity at the real flagship channel counts
  (ElicAnalysis (192,192,192,320) + TwoLayerRes (12,3) + 320-ch hyper pair),
  on a 160x192 image that exercises the padding interaction (pads to
  192x192)."""
  model, params, tf_model, mc = _build_full_model("unoise", tiny=False)
  img = np.random.default_rng(5).uniform(
      -0.5, 0.5, (1, 160, 192, 3)).astype(np.float32)

  ours = _jax_full_loss(model, params, img, training=False, step=90)
  theirs = tf_mirror.mirror_full_frame_loss(
      tf_model, img, uq_method="unoise", training=False,
      rd_lambda=mc["rd_lambda"], scheduled_num_steps=mc["scheduled_num_steps"],
      downsample_factor=model.downsample_factor, step=90,
      offset_heuristic=model.offset_heuristic)

  errs = {k: abs(ours[k] - theirs[k]) / max(abs(theirs[k]), 1e-9)
          for k in ("rd_loss", "bpp", "mse", "psnr")}
  PARITY_ERRORS["full_model/flagship-eval"] = errs
  for k, e in errs.items():
    assert e < 1e-4, (k, ours[k], theirs[k], errs)


def test_dump_parity_report():
  """Persist measured transform parity errors for PARITY_REPORT.md.

  Env-gated (SNTC_DUMP_PARITY=1): the committed results/tf_parity_errors.json
  is a deliberate artifact refresh, not a side effect of every pytest run
  (it left the tree dirty after each full-suite run; VERDICT r4 weak #4)."""
  if not os.environ.get("SNTC_DUMP_PARITY"):
    pytest.skip("set SNTC_DUMP_PARITY=1 to refresh results/tf_parity_errors.json")
  if not PARITY_ERRORS:
    pytest.skip("transform parity cases did not run")
  path = os.path.join(os.path.dirname(__file__), "..", "results",
                      "tf_parity_errors.json")
  with open(path, "w") as f:
    json.dump(PARITY_ERRORS, f, indent=2, sort_keys=True)
